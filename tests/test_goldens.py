"""Golden-file regression (FIXTURES.md §3): regenerating the fixtures
must reproduce the checked-in parquet byte-for-byte-equal tables."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from tests.make_goldens import GOLDEN_DIR, GOLDENS


@pytest.mark.parametrize("fname", sorted(GOLDENS))
def test_golden_reproduces(fname):
    path = os.path.join(GOLDEN_DIR, fname)
    assert os.path.exists(path), f"{fname} missing; run tests/make_goldens.py"
    want = pq.read_table(path)
    got = GOLDENS[fname]()
    assert got.equals(want), f"{fname} drifted from golden"
