"""label_grid_components vs a brute-force flood-fill oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from geo_ray.stages.grid_cc import label_grid_components, pack_xy


def _brute(cells):
    cs = set(map(tuple, cells))
    lab = {}
    for start in sorted(cs):
        if start in lab:
            continue
        comp = [start]
        seen = {start}
        while comp:
            cx, cy = comp.pop()
            for nx, ny in ((cx + 1, cy), (cx - 1, cy),
                           (cx, cy + 1), (cx, cy - 1)):
                if (nx, ny) in cs and (nx, ny) not in seen:
                    seen.add((nx, ny))
                    comp.append((nx, ny))
        root = min(seen)
        m = int(pack_xy(np.array([root[0]]), np.array([root[1]]))[0])
        for c in seen:
            lab[c] = m
    return lab


def _run(cells, tile=8):
    df = pd.DataFrame(cells, columns=["x", "y"]).astype(np.int64)
    out, _info = label_grid_components(rd.from_pandas(df), tile=tile,
                                       num_parts=8)
    got = out.to_pandas()
    return {(int(r.x), int(r.y)): int(r.blob)
            for r in got.itertuples()}


def test_cross_tile_blob(ray_session):
    # one blob crossing a tile boundary at x=8 (tile=8), one isolated
    cells = [(6, 3), (7, 3), (8, 3), (9, 3), (9, 4), (20, 20)]
    assert _run(cells) == _brute(cells)


def test_corner_meeting_no_diagonal(ray_session):
    # diagonal touch is NOT connected under 4-connectivity
    cells = [(7, 7), (8, 8)]
    got = _run(cells)
    assert got == _brute(cells)
    assert got[(7, 7)] != got[(8, 8)]


def test_negative_coords(ray_session):
    cells = [(-1, 0), (0, 0), (-1, -1), (5, -9), (5, -8), (4, -8)]
    assert _run(cells) == _brute(cells)


@pytest.mark.parametrize("seed,n,lo,hi", [(3, 250, -30, 30),
                                          (11, 400, 0, 40)])
def test_random_grid_matches_brute(ray_session, seed, n, lo, hi):
    rng = np.random.default_rng(seed)
    pts = rng.integers(lo, hi, size=(n, 2))
    cells = list({(int(a), int(b)) for a, b in pts})
    assert _run(cells) == _brute(cells)


def test_snake_across_many_tiles(ray_session):
    # a 1-cell-wide path spanning 6 tiles horizontally: the worst
    # case for label propagation depth
    cells = [(x, 0) for x in range(48)] + [(0, 30)]
    got = _run(cells)
    assert got == _brute(cells)
    assert len({got[(x, 0)] for x in range(48)}) == 1
