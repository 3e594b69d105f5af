"""Weights-arrival drill (scripts/weights_drill.py) — the rehearsal for
real-ProstT5 day (createdb.rs:144-166; VERDICT r4 missing #1) must stay
a working RUN: synthetic checkpoint fabrication exercises the real HF
loader path (safetensors + config.json geometry + tokenizer files)."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_drill_loader_smoke(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "weights_drill.py"),
         "--synthetic", "small", "--cpu", "--skip-pipeline",
         "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert rep["probe_ok"] and rep["loaded_pretrained"]
    assert rep["geometry"]["d_model"] == 256  # config.json-inferred
    assert rep["predict_residues_per_s"] > 0
    assert rep["n_seqs_smoke"] > 0


def test_infer_config_from_hf_config_json(tmp_path):
    from unicore_tpu.models.prostt5 import T5Config, infer_config

    d = {"d_model": 512, "d_kv": 64, "num_heads": 8, "d_ff": 2048,
         "num_layers": 6, "feed_forward_proj": "gated-gelu"}
    with open(tmp_path / "config.json", "w") as f:
        json.dump(d, f)
    cfg = infer_config(str(tmp_path))
    assert cfg is not None
    assert (cfg.d_model, cfg.d_kv, cfg.n_heads, cfg.d_ff, cfg.n_layers) == \
        (512, 64, 8, 2048, 6)
    assert cfg.ff == "gated-gelu"
    # no config.json -> None (gguf dirs; engine falls back to XL)
    assert infer_config(str(tmp_path / "nope")) is None
