"""Adversarial inputs for the sixth-continuation kernels, cross-
checked against DuckDB on synthetic tables (the same engine-vs-SQL
contract as test_oracle_parity, but on shapes the sf tables don't
exercise): interval sweeps with tied starts / zero durations /
mega-users, k-means with empty clusters, winsorize with single-value
strata, grid medians at even/odd counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, event_id, ts_us, user_id, event_type,
                  value):
    t = pa.table({
        "event_id": pa.array(np.asarray(event_id, np.int64)),
        "ts": pa.array(np.asarray(ts_us, np.int64).astype(
            "datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(np.asarray(user_id, np.int64)),
        "event_type": pa.array(list(event_type), pa.string()),
        "value": pa.array(np.asarray(value, np.float64)),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    return con.execute(sql).fetchdf()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df


def _check(result, sf_dir: str, sql: str, name: str):
    ray_df = result.to_pandas() if hasattr(result, "to_pandas") \
        else result
    duck_df = _duck(sf_dir, sql)
    a, b = _norm(ray_df), _norm(duck_df)
    assert len(a) == len(b), (name, len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=True, obj=name)


def test_overlap_adversarial(ray_session, tmp_path):
    """Tied starts, zero-length intervals, one mega-user holding half
    the rows, and intervals reaching past every later start."""
    from geo_ray.pipelines.queries import (q_events_overlap,
                                           sql_events_overlap)

    rng = np.random.RandomState(7)
    n = 400
    user = np.where(np.arange(n) % 2 == 0, 1,
                    rng.randint(2, 8, n))          # mega-user 1
    ts = rng.randint(0, 50, n).astype(np.int64) * 60_000_000
    # force tied starts inside the mega-user
    ts[np.flatnonzero(user == 1)[:10]] = 0
    cents_mod = 1440
    # value -> duration (cents % 1440) minutes; plant zero durations
    value = rng.randint(0, 3000, n) / 100.0
    value[::7] = (cents_mod * 3) / 100.0           # cents % mod == 0
    sf = _write_events(tmp_path, np.arange(n), ts, user,
                       ["click"] * n, value)
    _check(q_events_overlap(sf), sf, sql_events_overlap(), "overlap")


def test_overlap_interval_past_all_starts(ray_session, tmp_path):
    """An interval whose end exceeds every later same-user start must
    pair with ALL of them (the shifted-axis clip regression case)."""
    from geo_ray.pipelines.queries import (q_events_overlap,
                                           sql_events_overlap)

    # user 1: first interval runs 1400 minutes, others start later
    n = 50
    ts = np.arange(n, dtype=np.int64) * 60_000_000  # 1-min spacing
    value = np.full(n, 0.01)                        # 1-cent: 1 minute
    value[0] = 13.99                                # 1399 min
    sf = _write_events(tmp_path, np.arange(n), ts, np.ones(n),
                       ["click"] * n, value)
    res = q_events_overlap(sf).to_pandas()
    # row 0 overlaps every other row
    assert (res["id_a"] == 0).sum() == n - 1
    _check(res, sf, sql_events_overlap(), "overlap_long")


def test_kmeans_empty_clusters(ray_session, tmp_path):
    """All points in one lattice corner: most clusters stay empty and
    must keep their previous centroids, bit-equal to the SQL rounds."""
    from geo_ray.pipelines.queries import (q_events_kmeans,
                                           sql_events_kmeans)

    # multiples of lcm(17000, 36000): every point lands on the exact
    # lattice corner (-8500, -18000) -> one occupied cluster
    ids = np.arange(40, dtype=np.int64) * 612_000
    ts = np.zeros(40, np.int64)
    sf = _write_events(tmp_path, ids, ts, np.ones(40),
                       ["click"] * 40, np.ones(40))
    res = q_events_kmeans(sf)
    res = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert (res["n"] == 0).sum() == 7          # 7 of 8 clusters empty
    _check(res, sf, sql_events_kmeans(), "kmeans_empty")


def test_winsorize_single_value_stratum(ray_session, tmp_path):
    """A stratum with one distinct value: lo == hi == value and the
    clipped sum equals the plain sum; plus a two-value stratum where
    p5 == p95 boundaries land on the same element."""
    from geo_ray.pipelines.queries import (q_events_winsorize,
                                           sql_events_winsorize)

    n = 60
    types = (["a"] * 20) + (["b"] * 40)
    value = np.r_[np.full(20, 7.77),
                  np.r_[np.full(39, 1.0), [100.0]]]
    sf = _write_events(tmp_path, np.arange(n), np.zeros(n, np.int64),
                       np.ones(n), types, value)
    res = q_events_winsorize(sf).to_pandas()
    a_row = res[res["event_type"] == "a"].iloc[0]
    assert a_row["lo_cents"] == a_row["hi_cents"] == 777
    assert a_row["wsum_cents"] == 20 * 777
    _check(res, sf, sql_events_winsorize(), "winsorize")


@pytest.mark.parametrize("n", [1, 2, 3, 17])
def test_grid_median_small_counts(ray_session, tmp_path, n):
    """Lower-median order statistic at tiny and odd/even counts."""
    from geo_ray.pipelines.queries import (q_grid_median,
                                           sql_grid_median)

    # identical event_ids: every row lands in the same grid cell
    ids = np.zeros(n, np.int64)
    value = (np.arange(n, dtype=np.float64) + 1) / 100.0  # 1..n cents
    sf = _write_events(tmp_path, ids, np.zeros(n, np.int64),
                       np.ones(n), ["x"] * n, value)
    res = q_grid_median(sf).to_pandas()
    assert len(res) == 1
    # lower median of 1..n is ceil(n/2)
    assert int(res["median_cents"].iloc[0]) == (n + 1) // 2
    _check(res, sf, sql_grid_median(), "grid_median")


def test_events_corridor_prefilter_identical(ray_session):
    """The covering prefilter (superset of the corridor by the
    per-edge cap triangle-inequality argument) must not change the
    result set."""
    from geo_ray.pipelines.queries import q_events_corridor

    sf = "/root/testdata/sf0.01"
    off = q_events_corridor(sf, prefilter=False).to_pandas()
    on = q_events_corridor(sf, prefilter=True).to_pandas()
    assert off["event_id"].tolist() == on["event_id"].tolist()
    assert len(off) > 0
