"""Binary little-endian serialization of cell IDs and cell unions.

Semantics of reference s2/encode.go:39-210, CellID.Encode
(s2/cellid.go:484-499: raw little-endian uint64) and CellUnion
encode/decode (s2/cellunion.go:569-601: version byte 1, int64 count,
raw uint64s; decode rejects counts above 1e6 cells as hostile).
"""

from __future__ import annotations

import struct
from typing import List

ENCODING_VERSION = 1
MAX_CELLS_DECODE = 1_000_000  # s2/cellunion.go:598-601


def encode_cell_id(ci: int) -> bytes:
    return struct.pack("<Q", ci)


def decode_cell_id(data: bytes) -> int:
    return struct.unpack("<Q", data[:8])[0]


def encode_cell_union(ids: List[int]) -> bytes:
    out = struct.pack("<bq", ENCODING_VERSION, len(ids))
    out += struct.pack(f"<{len(ids)}Q", *ids) if ids else b""
    return out


def decode_cell_union(data: bytes) -> List[int]:
    version, n = struct.unpack_from("<bq", data, 0)
    if version != ENCODING_VERSION:
        raise ValueError(f"unsupported version {version}")
    if n < 0 or n > MAX_CELLS_DECODE:
        raise ValueError(f"implausible cell count {n}")
    return list(struct.unpack_from(f"<{n}Q", data, 9))
