"""Snap-rounding geometry builder (S2Builder-style assembly layer).

The Go reference ships only the snap *functions* and their radius /
separation guarantees (s2/builder_snapper.go:82-505) plus the builder
constants (s2/builder.go:17-35) — the graph/assembly machinery of the
C++ S2Builder was never ported.  This module supplies that capability
with the published snap-rounding construction:

1. optionally split crossing input edges at their robust intersection
   points (splitCrossingEdges semantics; uses the same crossing sign
   and exact-intersection ladder as the boolean overlay so coincident
   inputs split at bit-identical points);
2. choose snap *sites*: every input vertex is snapped by the snapper
   (Identity / CellID / IntLatLng, geo_ray.functions.snap), then
   merged greedily onto any existing site within ``snap_radius`` —
   first-come order, nearest site wins;
3. reroute every edge through the sites lying within ``snap_radius``
   of it, ordered by their projection along the edge (interior-vertex
   rerouting — the step that makes snap rounding topology-safe: no
   snapped edge can pass on the wrong side of a site);
4. discard degenerate edges, cancel sibling pairs (a directed edge
   against its reverse — shared borders of adjacent input loops
   annihilate, the polygon-union-of-tiles use case) and merge
   duplicate directed edges;
5. assemble: closed loops stitched with the leftmost-turn rule and
   normalized into the xor containment model for polygons; open
   chains walked end-to-end for polylines.

Determinism: site selection depends only on input order, so the
distributed stage (geo_ray.stages.build) sorts each group by edge id
before assembly.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..functions.distance import edge_intersection_robust
from ..functions.edges import crossing_sign
from ..functions.snap import IdentitySnapper
from .boolean import _stitch
from .loop import Loop
from .polygon import Polygon

Vec = Tuple[float, float, float]


def _chord2_threshold(radius_rad: float) -> float:
    """Squared chord length corresponding to an angular radius."""
    if radius_rad <= 0.0:
        return 0.0
    s = 2.0 * math.sin(min(radius_rad, math.pi) / 2.0)
    return s * s


def _unit(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class Builder:
    """Accumulates directed edges, then snap-rounds and assembles them.

    Polygon edges must have the region interior on the left (the
    reference's loop orientation convention, s2/loop.go:45-48).
    """

    def __init__(self, snapper=None, *, split_crossing_edges: bool = False):
        self.snapper = snapper if snapper is not None else IdentitySnapper()
        self.split_crossing_edges = bool(split_crossing_edges)
        self._edges: List[Tuple[Vec, Vec]] = []

    # -- input --------------------------------------------------------------

    def add_edge(self, a: Vec, b: Vec) -> None:
        self._edges.append((tuple(float(c) for c in a),
                            tuple(float(c) for c in b)))

    def add_loop(self, loop: Loop) -> None:
        for (u, v) in loop.edges():
            self.add_edge(u, v)

    def add_polygon(self, poly: Polygon) -> None:
        """Adds boundary edges with the interior on the left (hole
        loops, stored CCW in the xor model, are emitted reversed)."""
        depths = poly._loop_depths()
        for lp, d in zip(poly.loops, depths):
            for (u, v) in lp.edges():
                self.add_edge(*( (v, u) if d % 2 == 1 else (u, v) ))

    def add_polyline(self, vertices: Sequence[Vec]) -> None:
        for i in range(len(vertices) - 1):
            self.add_edge(vertices[i], vertices[i + 1])

    # -- snap rounding ------------------------------------------------------

    def _split_self_crossings(self, edges):
        """Split every edge at its interior crossings with every other
        edge (splitCrossingEdges).  O(E^2) scalar scan — builder inputs
        are per-shape, not per-dataset."""
        splits: List[List[np.ndarray]] = [[] for _ in edges]
        for i in range(len(edges)):
            u, v = edges[i]
            for j in range(i + 1, len(edges)):
                c, d = edges[j]
                if crossing_sign(u, v, c, d) > 0:
                    x = edge_intersection_robust(u, v, c, d)
                    splits[i].append(x)
                    splits[j].append(x)
        out: List[Tuple[Vec, Vec]] = []
        for (u, v), pts in zip(edges, splits):
            if not pts:
                out.append((u, v))
                continue
            ua = np.asarray(u, dtype=np.float64)
            va = np.asarray(v, dtype=np.float64)
            w = _unit(va - ua * float(ua @ va))
            pts = sorted(pts, key=lambda x: math.atan2(float(x @ w),
                                                       float(x @ ua)))
            chain: List[Vec] = [u]
            for x in pts:
                t = tuple(float(c) for c in x)
                if t != chain[-1]:
                    chain.append(t)
            if v != chain[-1]:
                chain.append(v)
            for k in range(len(chain) - 1):
                out.append((chain[k], chain[k + 1]))
        return out

    def _choose_sites(self, edges):
        """Greedy site selection: snapped vertex becomes a new site
        unless an existing site lies within snap_radius (then the
        nearest existing site absorbs it)."""
        # Radius-based greedy merge applies to identity snapping only:
        # lattice snappers merge vertices by mapping them to the same
        # lattice point, and their min_vertex_separation guarantees
        # (snap.py) assume distinct lattice sites are kept as-is.
        radius = (float(getattr(self.snapper, "snap_radius", 0.0))
                  if isinstance(self.snapper, IdentitySnapper) else 0.0)
        thresh = _chord2_threshold(radius)
        site_list: List[Vec] = []
        site_set = set()
        site_rows: List[np.ndarray] = []
        vertex_site = {}  # raw vertex tuple -> site tuple
        for (u, v) in edges:
            for p in (u, v):
                if p in vertex_site:
                    continue
                sx, sy, sz = self.snapper.snap_point(*p)
                s = (float(sx), float(sy), float(sz))
                # lattice snappers map nearby vertices to the same site
                # exactly; dedupe by value first
                if s in site_set:
                    vertex_site[p] = s
                    continue
                # greedy radius merge: absorb into the nearest existing
                # site within snap_radius
                if thresh > 0.0 and site_rows:
                    d2 = np.sum((np.asarray(site_rows)
                                 - np.asarray(s)) ** 2, axis=1)
                    k = int(np.argmin(d2))
                    if d2[k] <= thresh:
                        vertex_site[p] = site_list[k]
                        continue
                site_set.add(s)
                site_list.append(s)
                site_rows.append(np.asarray(s, dtype=np.float64))
                vertex_site[p] = s
        site_arr = (np.asarray(site_rows, dtype=np.float64)
                    if site_rows else np.empty((0, 3), dtype=np.float64))
        return site_list, site_arr, vertex_site

    def _snap(self):
        edges = list(self._edges)
        if self.split_crossing_edges:
            edges = self._split_self_crossings(edges)
        sites, site_arr, vertex_site = self._choose_sites(edges)
        radius = float(getattr(self.snapper, "snap_radius", 0.0))
        thresh = _chord2_threshold(radius)

        snapped: List[Tuple[Vec, Vec]] = []
        for (u, v) in edges:
            su, sv = vertex_site[u], vertex_site[v]
            chain = [su]
            if thresh > 0.0 and len(sites) > 2:
                chain.extend(self._interior_sites(u, v, su, sv, site_arr,
                                                  sites, thresh))
            if sv != chain[-1]:
                chain.append(sv)
            for k in range(len(chain) - 1):
                if chain[k] != chain[k + 1]:
                    snapped.append((chain[k], chain[k + 1]))
        return snapped

    def _interior_sites(self, u, v, su, sv, site_arr, sites, thresh):
        """Sites within snap_radius of edge uv, ordered along it
        (the rerouting step)."""
        ua = np.asarray(u, dtype=np.float64)
        va = np.asarray(v, dtype=np.float64)
        axb = np.cross(ua, va)
        n2 = float(axb @ axb)
        if n2 == 0.0:
            return []
        # perpendicular distance of every site to the edge's great
        # circle, then range-check the along-edge projection
        proj = site_arr - np.outer(site_arr @ axb / n2, axb)
        norms = np.linalg.norm(proj, axis=1)
        ok = norms > 0
        proj[ok] = proj[ok] / norms[ok][:, None]
        w = _unit(va - ua * float(ua @ va))
        t = np.arctan2(proj @ w, proj @ ua)
        t_end = math.atan2(float(va @ w), float(va @ ua))
        d2 = np.sum((site_arr - proj) ** 2, axis=1)  # exact chord2 to circle
        inside = ok & (t > 1e-15) & (t < t_end - 1e-15) & (d2 <= thresh)
        order = np.argsort(t[inside])
        idx = np.flatnonzero(inside)[order]
        out = []
        for i in idx:
            s = sites[int(i)]
            if s != su and s != sv:
                out.append(s)
        return out

    # -- assembly -----------------------------------------------------------

    def _graph_edges(self, *, for_polygon: bool):
        snapped = self._snap()
        if not for_polygon:
            return snapped
        # sibling-pair cancellation, then duplicate merge
        from collections import Counter
        count = Counter(snapped)
        kept: List[Tuple[Vec, Vec]] = []
        for (e, c) in list(count.items()):
            rev = (e[1], e[0])
            if e[0] == e[1]:
                continue  # degenerate after snapping
            if rev in count:
                r = count[rev]
                if e < rev:
                    if c > r:
                        kept.append(e)
                    elif r > c:
                        kept.append(rev)
                # equal multiplicities annihilate entirely
            else:
                kept.append(e)
        return kept

    def build_polygon(self) -> Polygon:
        kept = self._graph_edges(for_polygon=True)
        if not kept:
            return Polygon([Loop.empty()])
        chains = _stitch(kept)
        loops: List[Loop] = []
        for c in chains:
            if len(c) < 3:
                continue
            lp = Loop(c)
            loops.append(lp.invert() if lp.area() > 2 * math.pi else lp)
        if not loops:
            return Polygon([Loop.empty()])
        return Polygon(loops)

    def build_polylines(self) -> List[List[Vec]]:
        """Walk maximal open chains (merged duplicate edges)."""
        from collections import defaultdict
        edges = list(dict.fromkeys(self._graph_edges(for_polygon=False)))
        out_edges = defaultdict(list)
        in_deg = defaultdict(int)
        for (a, b) in edges:
            if a != b:
                out_edges[a].append(b)
                in_deg[b] += 1
        chains: List[List[Vec]] = []
        # starts: vertices with more outgoing than incoming, first
        starts = [v for v in out_edges
                  if len(out_edges[v]) > in_deg.get(v, 0)]
        remaining = sum(len(vs) for vs in out_edges.values())
        while remaining:
            start = None
            for v in starts:
                if out_edges[v]:
                    start = v
                    break
            if start is None:
                start = next(v for v, vs in out_edges.items() if vs)
            chain = [start]
            cur = start
            while out_edges[cur]:
                nxt = out_edges[cur].pop(0)
                remaining -= 1
                chain.append(nxt)
                cur = nxt
                if cur == start:
                    break  # closed back on itself
            chains.append(chain)
        return chains
