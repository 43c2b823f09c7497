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
    x, y, z) observation rows."""
    return ds.groupby("user_id").map_groups(
        lambda g: resample_group(g, step_us), batch_format="pandas")
