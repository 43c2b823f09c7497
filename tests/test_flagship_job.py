"""End-to-end smoke of the `ray job submit` entrypoint
(jobs/flagship_job.py): runs as a real subprocess (its own Ray
session, like a job runner would), then re-runs with the same --out
and must resume every stage from checkpoint with identical metrics."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out_dir: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    # a job owns its own Ray session; keep it off the test session's
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "flagship_job.py"),
         "--num-images", "2000", "--num-cpus", "4", "--out", out_dir],
        capture_output=True, text=True, env=env, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.timeout(900)
def test_job_runs_and_resumes(tmp_path):
    out = str(tmp_path / "job_out")
    first = _run(out)
    assert first["num_images"] == 2000
    assert first["n_matches"] > 0 and first["n_tiles"] > 0
    # stage checkpoints exist on disk
    names = os.listdir(out)
    assert any("points" in n for n in names), names

    second = _run(out)
    assert second["n_matches"] == first["n_matches"]
    assert second["n_tiles"] == first["n_tiles"]
    # every stage must resume from its checkpoint on the re-run
    infos = second["stage_info"]
    assert infos and all(
        i.get("cached") or i.get("shards_cached") for i in infos), infos
