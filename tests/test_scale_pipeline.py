"""End-to-end test of the config-4 full-pipeline scale driver
(scripts/scale_pipeline.py): subprocess phases, resume-skip, and the
generated-vs-inferred validation signals (purity / core genes / RF)."""

import json
import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts", "scale_pipeline.py")


@pytest.mark.slow
def test_pipeline_driver_small(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    work = str(tmp_path / "w")
    args = [sys.executable, SCRIPT, "--species", "7", "--families", "10",
            "--workdir", work]
    r = subprocess.run(args, capture_output=True, text=True, env=env, timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    # parse the report from pipeline_log.json (the driver echoes it too)
    log = json.load(open(os.path.join(work, "pipeline_log.json")))
    report_line = [e["result"] for e in log if isinstance(e, dict)
                   and "result" in e and '"phase": "report"' in e.get("result", "")]
    rep = json.loads(report_line[-1])
    assert rep["purity"] >= 0.9
    assert rep["n_core_genes"] >= 3
    assert rep["rf"] is not None and rep["rf"]["norm_rf"] <= 0.6

    # resume: rerunning skips every phase
    r2 = subprocess.run(args, capture_output=True, text=True, env=env, timeout=600)
    assert r2.returncode == 0
    assert r2.stdout.count("skipping") >= 4
