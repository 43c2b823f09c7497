"""Static guard: every parquet scan of a data table must prune
columns at the read (`columns=[...]`).  A read that loads all columns
for a narrow transform is wrong at 100 TB — this test makes the rule
un-regressable instead of a review convention.

Exemptions: the tiny dimension tables (nation: 25 rows, region: 5 —
whole-row driver reads are the documented broadcast pattern) and
files that round-trip THIS ENGINE'S OWN outputs, whose schema is by
construction the wanted projection: checkpoint.py (stage re-reads)
and spatial_layout.py (the upsert/delete/compact rewrite paths must
read every column of the partition they rewrite; its query-path
reads all pass columns=).
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / "geo_ray"
EXEMPT_FILES = {"checkpoint.py", "spatial_layout.py"}
EXEMPT_TABLES = ("nation", "region")


def _call_name(node: ast.Call) -> str:
    f = node.func
    if isinstance(f, ast.Attribute):
        return f.attr
    if isinstance(f, ast.Name):
        return f.id
    return ""


def _path_mentions_exempt_table(node: ast.Call) -> bool:
    for arg in list(node.args) + [kw.value for kw in node.keywords]:
        for n in ast.walk(arg):
            if isinstance(n, ast.Constant) and isinstance(n.value, str):
                if any(t in n.value for t in EXEMPT_TABLES):
                    return True
    return False


def test_every_table_scan_prunes_columns():
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        if py.name in EXEMPT_FILES:
            continue
        tree = ast.parse(py.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            if _call_name(node) not in ("read_parquet", "read_table"):
                continue
            kwnames = {kw.arg for kw in node.keywords}
            if "columns" in kwnames:
                continue
            if _path_mentions_exempt_table(node):
                continue
            offenders.append(f"{py.relative_to(PKG.parent)}:{node.lineno}")
    assert not offenders, (
        "parquet scans without columns= (add pruning or an exemption "
        f"with a reason): {offenders}")
