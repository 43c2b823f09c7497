"""Stateless assignment stages: geotag derivation and cell-ID keying.

The point->cell chain (s2/cellid.go:638-652 via s2/stuv.go) runs as one
vectorized numpy pass per Arrow batch; ~10^6+ rows/s/core.  Wide binary
columns (``bytes``) pass through untouched (zero-copy).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import cellid as cid
from ..functions.latlng import latlng_deg_to_xyz
from ..sources.images import latlng_from_phash


def derive_geotag(batch: pa.Table) -> pa.Table:
    """phash -> (lat, lng) via the canonical derivation (FIXTURES.md §1)."""
    ph = batch.column("phash").to_numpy()
    lat, lng = latlng_from_phash(ph)
    return batch.append_column("lat", pa.array(lat, pa.float64())) \
                .append_column("lng", pa.array(lng, pa.float64()))


def assign_cell_id(batch: pa.Table) -> pa.Table:
    """(lat, lng) -> leaf cell_id (uint64) + unit xyz columns."""
    lat = batch.column("lat").to_numpy()
    lng = batch.column("lng").to_numpy()
    x, y, z = latlng_deg_to_xyz(lat, lng)
    ids = cid.cell_id_from_point_v(x, y, z)
    return (batch.append_column("cell_id", pa.array(ids, pa.uint64()))
                 .append_column("x", pa.array(x, pa.float64()))
                 .append_column("y", pa.array(y, pa.float64()))
                 .append_column("z", pa.array(z, pa.float64())))


def geotag_and_cell(batch: pa.Table) -> pa.Table:
    return assign_cell_id(derive_geotag(batch))


def add_parent_cell(batch: pa.Table, level: int,
                    out_col: str = "tile_id") -> pa.Table:
    ids = batch.column("cell_id").to_numpy()
    return batch.append_column(out_col,
                               pa.array(cid.parent_v(ids, level), pa.uint64()))


def cell_tokens(batch: pa.Table, col: str = "cell_id") -> pa.Table:
    ids = batch.column(col).to_numpy()
    toks = pa.array([cid.token(int(v)) for v in ids], pa.string())
    return batch.append_column("token", toks)
