"""Adversarial inputs for the seventh-continuation kernels, cross-
checked against DuckDB on synthetic tables (the engine-vs-SQL
contract of test_oracle_parity on shapes the sf tables don't
exercise): streaks with duplicate days and singletons, MAD at even /
all-equal counts, affinity with single-type users, attribution at the
exact window boundary and purchase-first users, RFM under total ties,
stay-point eps extremes, decay at age 0, Pettitt/Theil-Sen on 2-day
and constant series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


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


def _write_orders(tmp_path, custkey, orderdate_us, totalprice):
    n = len(custkey)
    t = pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(np.asarray(custkey, np.int64)),
        "o_orderstatus": pa.array(["O"] * n, pa.string()),
        "o_totalprice": pa.array(np.asarray(totalprice, np.float64)),
        "o_orderdate": pa.array(np.asarray(orderdate_us, np.int64)
                                .astype("datetime64[us]"),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/orders.parquet")
    return str(tmp_path)


def _duck(sf_dir: str, sql: str, table: str = "events") -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{table}.parquet')")
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


def _check(result, sf_dir: str, sql: str, name: str,
           table: str = "events"):
    ray_df = result.to_pandas() if hasattr(result, "to_pandas") \
        else result
    duck_df = _duck(sf_dir, sql, table)
    a, b = _norm(ray_df), _norm(duck_df)
    assert len(a) == len(b), (name, len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=True, obj=name)


_DAY = 86_400_000_000


def test_streak_adversarial(ray_session, tmp_path):
    """Single-day users, an unbroken month, duplicate events on the
    same day, and a user whose days alternate (all streaks == 1)."""
    from geo_ray.pipelines.queries import (q_events_streak,
                                           sql_events_streak)

    eid, ts, uid = [], [], []
    k = 0
    # user 1: 30 consecutive days, 3 events per day
    for d in range(30):
        for _ in range(3):
            eid.append(k); k += 1
            ts.append(d * _DAY + 17)
            uid.append(1)
    # user 2: single day
    eid.append(k); k += 1; ts.append(5 * _DAY); uid.append(2)
    # user 3: every other day
    for d in range(0, 20, 2):
        eid.append(k); k += 1
        ts.append(d * _DAY + 999)
        uid.append(3)
    # user 4: two islands 3 + 5
    for d in (1, 2, 3, 10, 11, 12, 13, 14):
        eid.append(k); k += 1
        ts.append(d * _DAY)
        uid.append(4)
    n = len(eid)
    sf = _write_events(tmp_path, eid, ts, uid, ["click"] * n,
                       np.ones(n))
    out = q_events_streak(sf).to_pandas().set_index("user_id")
    assert int(out.loc[1, "max_streak"]) == 30
    assert int(out.loc[2, "max_streak"]) == 1
    assert int(out.loc[3, "max_streak"]) == 1
    assert int(out.loc[4, "max_streak"]) == 5
    _check(q_events_streak(sf), sf, sql_events_streak(),
           "events_streak")


def test_mad_adversarial(ray_session, tmp_path):
    """Even counts (lower median), an all-equal type (MAD 0), and a
    two-point type."""
    from geo_ray.pipelines.queries import q_events_mad, sql_events_mad

    vals = ([5.00] * 8                     # constant -> med 500, mad 0
            + [1.00, 2.00, 3.00, 4.00]     # even n -> lower median 200
            + [10.00, 99.99])              # two-point
    types = ["flat"] * 8 + ["even"] * 4 + ["duo"] * 2
    n = len(vals)
    sf = _write_events(tmp_path, np.arange(n),
                       np.arange(n) * 1000, np.ones(n), types, vals)
    out = q_events_mad(sf).to_pandas().set_index("event_type")
    assert int(out.loc["flat", "mad_cents"]) == 0
    assert int(out.loc["even", "med_cents"]) == 200
    _check(q_events_mad(sf), sf, sql_events_mad(), "events_mad")


def test_affinity_adversarial(ray_session, tmp_path):
    """Single-type users contribute only norms; one all-type user
    creates every pair; counts > 1 exercise the product."""
    from geo_ray.pipelines.queries import (q_type_affinity,
                                           sql_type_affinity)

    types, uid = [], []
    for u, t in ((1, "a"), (1, "a"), (1, "a"),      # single-type
                 (2, "b"), (2, "b")):
        uid.append(u); types.append(t)
    for t in ("a", "b", "c"):                       # all-type user
        for _ in range(2):
            uid.append(3); types.append(t)
    n = len(uid)
    sf = _write_events(tmp_path, np.arange(n),
                       np.arange(n) * 1000, uid, types, np.ones(n))
    out = q_type_affinity(sf).to_pandas()
    ab = out[(out.type_a == "a") & (out.type_b == "b")].iloc[0]
    # only user 3 holds both: 2 * 2
    assert int(ab["dot"]) == 4
    assert int(ab["norm_a"]) == 9 + 4     # user1 3^2 + user3 2^2
    _check(q_type_affinity(sf), sf, sql_type_affinity(),
           "type_affinity")


def test_attribution_boundary(ray_session, tmp_path):
    """Purchase-first user (-1), back-to-back purchases sharing one
    touch, a touch at EXACTLY the 7-day boundary (included), and one
    microsecond past it (excluded)."""
    from geo_ray.pipelines.queries import (
        q_attribution_last_touch, sql_attribution_last_touch)

    win = 7 * _DAY
    rows = [
        # user 1: purchase with no prior event
        (10, 0, 1, "purchase"),
        # then a view, then two purchases in a row -> both hit id 11
        (11, 1000, 1, "view"),
        (12, 2000, 1, "purchase"),
        (13, 3000, 1, "purchase"),
        # user 2: touch exactly win before the purchase (included)
        (20, 0, 2, "view"),
        (21, win, 2, "purchase"),
        # user 3: touch win+1 us before the purchase (excluded)
        (30, 0, 3, "view"),
        (31, win + 1, 3, "purchase"),
    ]
    eid, ts, uid, et = zip(*rows)
    sf = _write_events(tmp_path, eid, ts, uid, et, np.ones(len(eid)))
    out = q_attribution_last_touch(sf).to_pandas() \
        .set_index("purchase_id")
    assert int(out.loc[10, "touch_event_id"]) == -1
    assert int(out.loc[12, "touch_event_id"]) == 11
    assert int(out.loc[13, "touch_event_id"]) == 11
    assert int(out.loc[21, "touch_event_id"]) == 20
    assert int(out.loc[31, "touch_event_id"]) == -1
    _check(q_attribution_last_touch(sf), sf,
           sql_attribution_last_touch(), "attribution_last_touch")


def test_rfm_total_ties(ray_session, tmp_path):
    """All customers share one monetary total -> every threshold is
    that value, m_score must be 1 for everyone (strict >); recency
    and frequency still split."""
    from geo_ray.pipelines.queries import q_orders_rfm, sql_orders_rfm

    cust2 = list(range(10))
    day2 = [c * _DAY for c in range(10)]
    price2 = [500.00] * 10
    sf = _write_orders(tmp_path, cust2, day2, price2)
    out = q_orders_rfm(sf).to_pandas()
    assert (out["m_score"] == 1).all()
    assert (out["f_score"] == 1).all()
    assert set(out["r_score"]) == {1, 2, 3, 4, 5}
    _check(q_orders_rfm(sf), sf, sql_orders_rfm(), "orders_rfm",
           table="orders")


def test_traj_stays_eps_extremes(ray_session, tmp_path):
    """eps large enough that every step is small (one stay per user
    spanning the whole track) and a mid eps on hash-scattered
    points; both must match SQL exactly."""
    from geo_ray.pipelines.queries import q_traj_stays, sql_traj_stays

    rng = np.random.RandomState(11)
    n = 300
    eid = rng.permutation(10_000)[:n]
    ts = np.sort(rng.randint(0, 30 * _DAY, n))
    uid = rng.randint(1, 6, n)
    sf = _write_events(tmp_path, eid, ts, uid, ["click"] * n,
                       np.ones(n))
    # chord2 <= 4 always -> every step small at 4e6 units
    big = q_traj_stays(sf, eps_units=4_000_000).to_pandas()
    assert (big["n_stays"] == 1).all()
    _check(q_traj_stays(sf, eps_units=4_000_000), sf,
           sql_traj_stays(eps_units=4_000_000), "traj_stays_all")
    _check(q_traj_stays(sf, eps_units=400_000), sf,
           sql_traj_stays(eps_units=400_000), "traj_stays_mid")


def test_decay_age_zero(ray_session, tmp_path):
    """All events on the corpus max day (age 0 -> full 2^H weight)
    plus one user a full horizon back."""
    from geo_ray.pipelines.queries import (q_events_decay,
                                           sql_events_decay)

    h = 35
    eid = [0, 1, 2]
    ts = [30 * _DAY, 30 * _DAY + 5, 0]
    uid = [1, 1, 2]
    vals = [1.00, 2.00, 4.00]
    sf = _write_events(tmp_path, eid, ts, uid, ["c"] * 3, vals)
    out = q_events_decay(sf).to_pandas().set_index("user_id")
    assert int(out.loc[1, "decay_num"]) == 300 * (1 << h)
    assert int(out.loc[2, "decay_num"]) == 400 * (1 << (h - 30))
    _check(q_events_decay(sf), sf, sql_events_decay(), "events_decay")


def test_pettitt_theilsen_degenerate(ray_session, tmp_path):
    """Two-day types (single split / single slope) and a constant
    series (U = 0 everywhere -> smallest day wins)."""
    from geo_ray.pipelines.queries import (
        q_events_pettitt, q_events_theilsen, sql_events_pettitt,
        sql_events_theilsen)

    rows = []
    k = 0
    # type "duo": exactly two days
    for d, v in ((3, 1.00), (7, 9.00)):
        rows.append((k, d * _DAY, 1, "duo", v)); k += 1
    # type "flat": constant over five days
    for d in range(5):
        rows.append((k, d * _DAY, 2, "flat", 2.50)); k += 1
    eid, ts, uid, et, vals = zip(*rows)
    sf = _write_events(tmp_path, eid, ts, uid, et, vals)
    p = q_events_pettitt(sf).to_pandas().set_index("event_type")
    assert int(p.loc["flat", "u_stat"]) == 0
    assert int(p.loc["flat", "change_day"]) == 0   # smallest on ties
    assert int(p.loc["duo", "u_stat"]) == 1
    _check(q_events_pettitt(sf), sf, sql_events_pettitt(),
           "events_pettitt")
    t = q_events_theilsen(sf).to_pandas().set_index("event_type")
    assert float(t.loc["flat", "slope"]) == 0.0
    assert int(t.loc["duo", "n_pairs"]) == 1
    _check(q_events_theilsen(sf), sf, sql_events_theilsen(),
           "events_theilsen")


def test_cube_single_cell(ray_session, tmp_path):
    """One (type, day) cell: all four grouping-set levels collapse to
    the same totals yet stay distinct rows."""
    from geo_ray.pipelines.queries import q_events_cube, sql_events_cube

    sf = _write_events(tmp_path, [0, 1], [100, 200], [1, 2],
                       ["click", "click"], [1.00, 2.00])
    out = q_events_cube(sf).to_pandas()
    assert len(out) == 4
    assert (out["cents"] == 300).all()
    _check(q_events_cube(sf), sf, sql_events_cube(), "events_cube")
