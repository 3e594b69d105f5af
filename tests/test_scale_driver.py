"""The resumable recycled-process scale driver (scripts/scale_bench.py)
— the machinery behind the 50K/100K proofs — end-to-end on a small CPU
fixture: phases run in subprocesses, checkpoint, resume by skipping,
and produce a perfect clustering of the synthetic families."""

import json
import os
import subprocess
import sys


def _run(n, workdir, env):
    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "scale_bench.py")
    return subprocess.run(
        [sys.executable, "-u", script, str(n), "--workdir", workdir],
        env=env, capture_output=True, text=True, timeout=900,
    )


def test_phased_driver_end_to_end_and_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo  # no axon site: forces CPU in workers
    env["JAX_PLATFORMS"] = "cpu"
    work = str(tmp_path / "scale")

    r = _run(300, work, env)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.load(open(os.path.join(work, "summary.json")))
    reps = [p for p in summary["phases"] if p["phase"] == "reps"][0]
    assert reps["purity"] == 1.0
    assert reps["n_clusters"] == reps["n_families"]
    assert summary["n_seqs"] == 300
    assert summary["recycled_processes"] >= 4  # gen+canopy+>=1 chunk+reps

    # resume: delete only the final outputs; earlier phases must be
    # skipped (no re-generation), the rest re-run to the same result
    os.remove(os.path.join(work, "clusters.json"))
    os.remove(os.path.join(work, "summary.json"))
    r2 = _run(300, work, env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "skip (exists): fam_of.npy" in r2.stderr
    assert "skip (exists): canopy.json" in r2.stderr
    assert "skip (exists): verify_0.npy" in r2.stderr
    summary2 = json.load(open(os.path.join(work, "summary.json")))
    reps2 = [p for p in summary2["phases"] if p["phase"] == "reps"][0]
    assert reps2["n_clusters"] == reps["n_clusters"]
    assert reps2["purity"] == 1.0
