"""Trajectory resampling: interpolate each user's track onto a fixed
epoch grid with spherical linear interpolation (slerp) between the
bracketing observations.

The distributed shape is the standard sessionization partitioning:
only narrow (user, ts, unit-vector) rows shuffle into per-user groups,
and each group does one sort + one vectorized bracket/searchsorted +
one slerp kernel — no cross-user state, no driver loop.  Semantics
follow the reference's geodesic interpolation
(/root/reference/s2/edge_distances.go:218 InterpolateAtDistance —
point on the great circle at a parameterized fraction); here the
fraction is time-derived ((g - t0)/(t1 - t0)) and the slerp weights
sin((1-t)a)/sin(a), sin(ta)/sin(a) reproduce the same geodesic.

Grid rule: epochs are the multiples of ``step_us`` inside the user's
observed [min_ts, max_ts] span (inclusive).  An epoch equal to an
observation's timestamp, or a bracket whose endpoints are the
identical lattice point, returns the endpoint EXACTLY (no
float-identity detour through the slerp formula) so both engines take
the same branch.  Outputs are integerized to 1e-6 unit-sphere
coordinates before leaving the group, which makes the result
hash-comparable across engines (margin-checked in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def resample_group(g: pd.DataFrame, step_us: int) -> pd.DataFrame:
    """One user's track -> fixed-grid slerp samples.  Expects columns
    (user_id, tsu, event_id, x, y, z); emits (user_id, epoch,
    xu, yu, zu) in 1e-6 integer units."""
    g = g.sort_values(["tsu", "event_id"], kind="mergesort")
    ts = g["tsu"].to_numpy()
    x = g["x"].to_numpy()
    y = g["y"].to_numpy()
    z = g["z"].to_numpy()
    empty = pd.DataFrame({
        "user_id": pd.Series(dtype="int64"),
        "epoch": pd.Series(dtype="int64"),
        "xu": pd.Series(dtype="int64"),
        "yu": pd.Series(dtype="int64"),
        "zu": pd.Series(dtype="int64")})
    if len(ts) == 0:
        return empty
    g0 = ((ts[0] + step_us - 1) // step_us) * step_us
    if g0 > ts[-1]:
        return empty
    ep = np.arange(g0, ts[-1] + 1, step_us, dtype=np.int64)
    ir = np.searchsorted(ts, ep, side="right")
    i = ir - 1                      # last observation with ts <= epoch
    j = np.minimum(ir, len(ts) - 1)  # first observation with ts > epoch
    x0, y0, z0 = x[i], y[i], z[i]
    x1, y1, z1 = x[j], y[j], z[j]
    exact = (ts[i] == ep) | ((x0 == x1) & (y0 == y1) & (z0 == z1))
    with np.errstate(invalid="ignore", divide="ignore"):
        t = (ep - ts[i]).astype(np.float64) \
            / (ts[j] - ts[i]).astype(np.float64)
        cx = y0 * z1 - z0 * y1
        cy = z0 * x1 - x0 * z1
        cz = x0 * y1 - y0 * x1
        a = np.arctan2(np.sqrt(cx * cx + cy * cy + cz * cz),
                       x0 * x1 + y0 * y1 + z0 * z1)
        sa = np.sin(a)
        w0 = np.sin((1.0 - t) * a)
        w1 = np.sin(t * a)
        rx = np.where(exact, x0, (w0 * x0 + w1 * x1) / sa)
        ry = np.where(exact, y0, (w0 * y0 + w1 * y1) / sa)
        rz = np.where(exact, z0, (w0 * z0 + w1 * z1) / sa)
    return pd.DataFrame({
        "user_id": np.full(len(ep), int(g["user_id"].iloc[0]), np.int64),
        "epoch": ep,
        "xu": np.floor(rx * 1e6).astype(np.int64),
        "yu": np.floor(ry * 1e6).astype(np.int64),
        "zu": np.floor(rz * 1e6).astype(np.int64),
    })


def resample_tracks(ds, step_us: int):
    """Distributed resample over a dataset of (user_id, tsu, event_id,
    x, y, z) observation rows — user-hash bucket dispatch (constant
    Python-call count at any user cardinality)."""
    from .agg import bucketed_user_groups
    return bucketed_user_groups(
        ds, lambda g: resample_group(g, step_us))


# --------------------------------------------------------------------------
# polyline simplification (greedy radial, bounded lookahead)
# --------------------------------------------------------------------------

def _edge_chord2_vec(M: np.ndarray, a: np.ndarray,
                     b: np.ndarray) -> np.ndarray:
    """Squared-chord distance from each row of M to geodesic edge AB —
    the Project/updateMinDistance semantics (s2/edge_distances.go:
    190-270) written with EXPLICIT component arithmetic so every IEEE
    operation (and its order) is mirrored verbatim by the SQL oracle;
    the whole predicate is libm-free (mul/add/div/sqrt only), so both
    engines produce bit-identical doubles.  Degenerate lanes (A == B,
    or M on the edge axis) go NaN here / NULL in SQL and land in the
    same endpoint branch in both engines."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.ndim == 2:
        ax, ay, az = a[:, 0], a[:, 1], a[:, 2]
    else:
        ax, ay, az = a
    if b.ndim == 2:
        bx, by, bz = b[:, 0], b[:, 1], b[:, 2]
    else:
        bx, by, bz = b
    xx, xy, xz = M[:, 0], M[:, 1], M[:, 2]
    cx = ay * bz - az * by
    cy = az * bx - ax * bz
    cz = ax * by - ay * bx
    with np.errstate(invalid="ignore", divide="ignore"):
        r = (xx * cx + xy * cy + xz * cz) \
            / (cx * cx + cy * cy + cz * cz)
        px = xx - cx * r
        py = xy - cy * r
        pz = xz - cz * r
        pn = np.sqrt(px * px + py * py + pz * pz)
        qx, qy, qz = px / pn, py / pn, pz / pn
        c1 = (ay * qz - az * qy) * cx + (az * qx - ax * qz) * cy \
            + (ax * qy - ay * qx) * cz
        c2 = (qy * bz - qz * by) * cx + (qz * bx - qx * bz) * cy \
            + (qx * by - qy * bx) * cz
        da = (xx - ax) ** 2 + (xy - ay) ** 2 + (xz - az) ** 2
        db = (xx - bx) ** 2 + (xy - by) ** 2 + (xz - bz) ** 2
        di = (xx - qx) ** 2 + (xy - qy) ** 2 + (xz - qz) ** 2
        out = np.where(da <= db, da, db)
        onab = (c1 > 0) & (c2 > 0)
        return np.where(onab, di, out)


def simplify_group(g: pd.DataFrame, tol_chord2: float,
                   max_lookahead: int = 16) -> pd.DataFrame:
    """Greedy radial simplification of one user's track — the
    reference's Polyline.SubsampleVertices walk (s2/polyline.go:
    226-354: keep the longest prefix of candidates whose intermediate
    vertices all stay within tolerance, stop at the first failure,
    skip duplicate positions) with a bounded candidate lookahead that
    makes the per-step work O(max_lookahead^2) regardless of track
    length.  Expects (user_id, tsu, event_id, x, y, z); emits the
    kept (user_id, event_id) rows."""
    g = g.sort_values(["tsu", "event_id"], kind="mergesort")
    V = g[["x", "y", "z"]].to_numpy()
    E = g["event_id"].to_numpy()
    n = len(V)
    if n == 0:
        return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "event_id": pd.Series(dtype="int64")})
    kept = [0]
    idx = 0
    while idx < n - 1:
        bound = min(idx + max_lookahead, n - 1)
        best = idx + 1
        if bound >= idx + 2:
            # evaluate EVERY candidate's window in one kernel call:
            # rows are (candidate, mid) pairs; per-candidate failure
            # reduces by np.add.at, and 'stop at first failure' is
            # the argmax over the failure flags (identical decisions
            # to the sequential loop, K^2/2 rows instead of K calls)
            cands = np.arange(idx + 2, bound + 1)
            n_mids = cands - idx - 1
            c_rows = np.repeat(cands, n_mids)
            m_rows = np.concatenate(
                [np.arange(idx + 1, c) for c in cands])
            d = _edge_chord2_vec(V[m_rows], V[np.full(len(m_rows),
                                                      idx)],
                                 V[c_rows])
            fail = np.zeros(len(cands), dtype=np.int64)
            np.add.at(fail, c_rows - (idx + 2),
                      (d > tol_chord2).astype(np.int64))
            bad = fail > 0
            if bad.any():
                first_bad = int(np.argmax(bad))
                best = int(cands[first_bad]) - 1 if first_bad > 0 \
                    else idx + 1
            else:
                best = bound
        if not np.array_equal(V[best], V[kept[-1]]):
            kept.append(best)
        idx = best
    uid = int(g["user_id"].iloc[0])
    return pd.DataFrame({
        "user_id": np.full(len(kept), uid, np.int64),
        "event_id": E[np.asarray(kept, np.int64)].astype(np.int64)})


def simplify_bucket_vec(g: pd.DataFrame, tol_chord2: float,
                        max_lookahead: int = 16,
                        pair_chunk: int = 4_000_000) -> pd.DataFrame:
    """Vectorized multi-user simplification: identical decisions to
    running `simplify_group` per user, but the candidate-window
    distance kernel evaluates ALL (vertex, candidate, mid) triples of
    the whole bucket in one pass instead of one numpy call per walk
    step per user.

    The trick: the greedy walk's advance from index i depends only on
    i (first candidate c in [i+2, i+K] with an out-of-tolerance mid,
    else min(i+K, last)), so `next[i]` is a pure function precomputable
    for every vertex — exactly the `ff`/`nxt` CTEs of the SQL oracle.
    The walk itself degenerates to a per-user scalar pointer chase
    (O(kept) trivial comparisons), and the kernel-call count drops
    from O(users x steps) to O(1) per bucket.  `pair_chunk` bounds the
    transient (i, c, m) expansion memory."""
    n = len(g)
    if n == 0:
        return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "event_id": pd.Series(dtype="int64")})
    g = g.sort_values(["user_id", "tsu", "event_id"], kind="mergesort")
    U = g["user_id"].to_numpy()
    V = g[["x", "y", "z"]].to_numpy()
    E = g["event_id"].to_numpy()
    K = int(max_lookahead)

    new_u = np.empty(n, dtype=bool)
    new_u[0] = True
    new_u[1:] = U[1:] != U[:-1]
    starts = np.flatnonzero(new_u)
    ends = np.empty(len(starts), np.int64)
    ends[:-1] = starts[1:] - 1
    ends[-1] = n - 1
    seg = np.cumsum(new_u) - 1
    last = ends[seg]                       # per-row last index of its user
    idxs = np.arange(n, dtype=np.int64)
    bound = np.minimum(idxs + K, last)
    L = bound - idxs                       # candidate reach (0 at track end)

    # template of (dc, dm) offsets: dc in [2..K], dm in [1..dc-1]
    dc_t = np.concatenate([np.full(dc - 1, dc, np.int64)
                           for dc in range(2, K + 1)]) \
        if K >= 2 else np.empty(0, np.int64)
    dm_t = np.concatenate([np.arange(1, dc, dtype=np.int64)
                           for dc in range(2, K + 1)]) \
        if K >= 2 else np.empty(0, np.int64)
    P = len(dc_t)

    # per-(i, dc) "any mid out of tolerance" counts; col j <-> dc=j+2
    failm = np.zeros((n, max(K - 1, 1)), dtype=np.uint8)
    rows = np.flatnonzero(L >= 2)
    if P and len(rows):
        step = max(1, pair_chunk // P)
        for lo in range(0, len(rows), step):
            r = rows[lo:lo + step]
            ii = np.repeat(r, P)
            dcr = np.tile(dc_t, len(r))
            dmr = np.tile(dm_t, len(r))
            ok = dcr <= L[ii]
            ii, dcr, dmr = ii[ok], dcr[ok], dmr[ok]
            d = _edge_chord2_vec(V[ii + dmr], V[ii], V[ii + dcr])
            np.add.at(failm, (ii, dcr - 2),
                      (d > tol_chord2).astype(np.uint8))

    anyf = failm > 0
    has_bad = anyf.any(axis=1)
    fb = np.argmax(anyf, axis=1)           # first failing dc index
    # first_bad_c - 1 == i + (fb+2) - 1; else the full bound
    nxt = np.where(has_bad, idxs + fb + 1, bound)
    nxt = np.where(L >= 2, nxt, idxs + 1)  # 0/1-candidate windows

    out = []
    for s, e in zip(starts, ends):
        i = int(s)
        kept_last = i
        out.append(i)
        while i < e:
            b = int(nxt[i])
            if not (V[b] == V[kept_last]).all():
                out.append(b)
                kept_last = b
            i = b
    out = np.asarray(out, np.int64)
    return pd.DataFrame({"user_id": U[out].astype(np.int64),
                         "event_id": E[out].astype(np.int64)})


def simplify_tracks(ds, tol_chord2: float, max_lookahead: int = 16,
                    n_buckets: int = 64):
    """Distributed simplification: user-hash bucket groups (narrow
    rows only), the vectorized multi-user walk (`simplify_bucket_vec`,
    decision-identical to per-user `simplify_group`) runs INSIDE the
    bucket body — one Ray group per user would pay a Python dispatch
    per user."""
    import pyarrow as pa2

    from .sample import _splitmix

    def _bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype(np.uint64)
        return batch.append_column(
            "__b", pa2.array((_splitmix(u) % np.uint64(n_buckets))
                             .astype(np.int32), pa2.int32()))

    def _body(g: pd.DataFrame) -> pd.DataFrame:
        return simplify_bucket_vec(g.drop(columns=["__b"]),
                                   tol_chord2, max_lookahead)

    return ds.map_batches(_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(_body, batch_format="pandas")


# --------------------------------------------------------------------------
# spatiotemporal co-location join
# --------------------------------------------------------------------------

_COORD_BITS = 20
_COORD_BIAS = 1 << (_COORD_BITS - 1)
_COORD_MASK = (1 << _COORD_BITS) - 1


def _pack3(cells: np.ndarray) -> np.ndarray:
    shifted = cells + _COORD_BIAS
    if shifted.min() < 0 or shifted.max() > _COORD_MASK:
        raise ValueError("cell coordinate outside the +/-2^19 packing "
                         "range; shrink the time span or grow eps/w")
    key = np.zeros(len(cells), dtype=np.int64)
    for j in range(3):
        key |= shifted[:, j] << (_COORD_BITS * j)
    return key


def colocation_join(ds, *, eps_chord: float, window_us: int,
                    ts_base_us: int, n_buckets: int = 1024):
    """All unordered pairs of observations from DIFFERENT users within
    chord distance ``eps_chord`` AND ``window_us`` microseconds of each
    other — the spatiotemporal co-location join.

    Scale design (the shifted-grid exactly-once pattern of
    stages/ball_join.py, extended with a time dimension): each row
    replicates to the 2^3 grid cells over (x/eps, y/eps,
    (ts-base)/window); a qualifying pair shares at least one
    replicated cell (chord < eps implies |dx|,|dy| < eps; |dt| <=
    window implies one time-cell step), and is emitted only from the
    canonical cell where both copies carry zero offset bits.  The
    exact composite predicate — integer |dt| <= window, full 3-D
    chord2 < eps^2, user_a != user_b — runs vectorized inside the
    bucket body, so candidate-generation rounding can only cost
    duplicates work, never correctness.  Shuffle volume: 8 narrow
    rows per observation; no driver materialization.

    Expects columns (event_id, user_id, tsu, x, y, z); returns
    (event_a, event_b, user_a, user_b, dt_us) with event_a < event_b.
    """
    from ..sources.images import splitmix64

    eps = float(eps_chord)
    eps2 = eps * eps
    w = int(window_us)
    cell_s = eps * (1.0 + 1e-9)   # boundary slack, as in ball_join
    offsets = np.stack(np.meshgrid(*([np.arange(2)] * 3),
                                   indexing="ij"),
                       axis=-1).reshape(-1, 3).astype(np.int64)
    obits = np.bitwise_or.reduce(
        [(offsets[:, j] << j) for j in range(3)]).astype(np.int8)

    def _replicate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        tsu = batch.column("tsu").to_numpy()
        H = np.stack([
            np.floor(x / cell_s).astype(np.int64),
            np.floor(y / cell_s).astype(np.int64),
            (tsu - ts_base_us) // w,
        ], axis=1)
        m = len(offsets)
        targets = H[:, None, :] + offsets[None, :, :]
        keys = _pack3(targets.reshape(-1, 3))
        rep = np.repeat(np.arange(n, dtype=np.int64), m)
        bucket = (splitmix64(keys.view(np.uint64))
                  % np.uint64(n_buckets)).astype(np.int32)
        rep_idx = pa.array(rep)
        return pa.table({
            "bucket": pa.array(bucket, pa.int32()),
            "cell": pa.array(keys, pa.int64()),
            "obits": pa.array(np.tile(obits, n), pa.int8()),
            "event_id": batch.column("event_id").take(rep_idx),
            "user_id": batch.column("user_id").take(rep_idx),
            "tsu": batch.column("tsu").take(rep_idx),
            "x": batch.column("x").take(rep_idx),
            "y": batch.column("y").take(rep_idx),
            "z": batch.column("z").take(rep_idx),
        })

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        from .dedup import segment_all_pairs

        order = np.lexsort((g["event_id"].to_numpy(),
                            g["cell"].to_numpy()))
        cell = g["cell"].to_numpy()[order]
        eid = g["event_id"].to_numpy()[order]
        uid = g["user_id"].to_numpy()[order]
        tsu = g["tsu"].to_numpy()[order]
        ob = g["obits"].to_numpy().astype(np.int8)[order]
        P = np.stack([g["x"].to_numpy(), g["y"].to_numpy(),
                      g["z"].to_numpy()], axis=1)[order]
        cols = ("event_a", "event_b", "user_a", "user_b", "dt_us")
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        # one vectorized within-cell pair sweep over the whole bucket
        # (segment_all_pairs — no per-cell Python loop); emission
        # order equals the old per-cell triu walk exactly
        ii, jj = segment_all_pairs(np.diff(np.r_[starts, len(cell)]))
        if len(ii):
            canonical = (ob[ii] & ob[jj]) == 0
            dt = np.abs(tsu[ii] - tsu[jj])
            dp = P[ii] - P[jj]
            # explicit left-to-right sum: bit-identical to the SQL
            # oracle's (dx*dx + dy*dy + dz*dz) on the same doubles
            c2 = dp[:, 0] * dp[:, 0] + dp[:, 1] * dp[:, 1] \
                + dp[:, 2] * dp[:, 2]
            ok = canonical & (dt <= w) & (c2 < eps2) \
                & (uid[ii] != uid[jj])
            if ok.any():
                a, b = eid[ii[ok]], eid[jj[ok]]
                ua, ub = uid[ii[ok]], uid[jj[ok]]
                swap = a > b
                vals = (np.where(swap, b, a), np.where(swap, a, b),
                        np.where(swap, ub, ua), np.where(swap, ua, ub),
                        dt[ok])
                return pd.DataFrame({k: v.astype(np.int64)
                                     for k, v in zip(cols, vals)})
        return pd.DataFrame({k: pd.Series(dtype="int64")
                             for k in cols})

    return (ds.map_batches(_replicate, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: _pairs(g.drop(columns=["bucket"])),
                        batch_format="pandas"))
