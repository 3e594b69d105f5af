#!/usr/bin/env python
"""Weights-arrival drill — ONE command for the day real ProstT5 weights land.

The repo's one environment-blocked gap is real-weight 3Di parity
(createdb.rs:144-166; VERDICT missing #1): every golden and calibration
artifact is currently mock-conditioned, and they all re-derive the day a
checkpoint appears.  This script rehearses that whole day end-to-end so
it is a RUN, not a project:

    # rehearsal (no weights needed; fabricates a synthetic checkpoint
    # with the full HF ProstT5 file layout and drives the real loaders):
    python scripts/weights_drill.py --synthetic small
    python scripts/weights_drill.py --synthetic full     # real geometry, ~4.6 GB

    # the real day:
    python scripts/weights_drill.py --checkpoint /path/to/prostt5_dir
    #   (HF safetensors dir, pytorch_model.bin, or foldseek *.gguf dir)

Steps (each timed, JSON report at the end):
  1. [synthetic only] fabricate {dir}/model.safetensors with the exact
     HF ProstT5 tensor naming (incl. classifier CNN) — exercises
     models/prostt5.py::load_params + tokenizer fallback for real.
  2. Load the checkpoint through ProstT5Engine (the createdb path).
  3. Predict 3Di for the 3-proteome fixture; validate lengths/alphabet/
     determinism; report residues/s.
  4. Run the FULL easy-core CLI with the checkpoint as the model
     (createdb -> cluster -> profile -> tree), regenerating every
     golden-format artifact into {workdir}/golden_new/.
  5. Diff against tests/golden/* stage by stage (3Di strings, clust.tsv,
     copiness.tsv, core-gene sets) — with mock goldens differences are
     EXPECTED; the report quantifies them per stage.
  6. Print the copy command that promotes golden_new -> tests/golden
     (never auto-overwrites) plus the follow-ups (full30 golden, scale
     re-validation, crossval vs the reference once its binaries exist).

E-value statistics need NO offline refit: the stats cache is keyed on
the scoring system (matrices/weights/gaps/bias — align/stats.py), not on
the 3Di model; the canopy/rep-round nulls are calibrated per run from
the data (cascade._robust_null, stats.fit_empirical_pair_null).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

FIXTURE = ["Treponema_pallidum.fa", "Treponema_denticola.fa",
           "Leptospira_biflexa.fa"]
DATA = "/root/reference/example/data"


def make_synthetic_checkpoint(out_dir: str, size: str, seed: int = 0) -> None:
    """Fabricate an HF-layout ProstT5 checkpoint (safetensors + CNN head)."""
    from safetensors.numpy import save_file

    from unicore_tpu.models.prostt5 import T5Config

    cfg = T5Config() if size == "full" else T5Config.small()
    rng = np.random.RandomState(seed)
    V = 150  # HF ProstT5 vocab (128 base + specials); rows gathered by id

    def w(*shape, scale=None):
        s = scale if scale is not None else (shape[0] ** -0.5)
        return (rng.randn(*shape) * s).astype(np.float32)

    tensors = {
        "shared.weight": w(V, cfg.d_model, scale=1.0),
        "encoder.final_layer_norm.weight": np.ones(cfg.d_model, np.float32),
        "encoder.block.0.layer.0.SelfAttention."
        "relative_attention_bias.weight": w(cfg.rel_buckets, cfg.n_heads,
                                            scale=0.1),
    }
    inner = cfg.n_heads * cfg.d_kv
    for i in range(cfg.n_layers):
        pre = f"encoder.block.{i}.layer"
        tensors[f"{pre}.0.layer_norm.weight"] = np.ones(cfg.d_model, np.float32)
        for nm in ("q", "k", "v"):
            tensors[f"{pre}.0.SelfAttention.{nm}.weight"] = w(inner, cfg.d_model)
        tensors[f"{pre}.0.SelfAttention.o.weight"] = w(cfg.d_model, inner)
        tensors[f"{pre}.1.layer_norm.weight"] = np.ones(cfg.d_model, np.float32)
        tensors[f"{pre}.1.DenseReluDense.wi.weight"] = w(cfg.d_ff, cfg.d_model)
        tensors[f"{pre}.1.DenseReluDense.wo.weight"] = w(cfg.d_model, cfg.d_ff)
    # foldseek CNN head layout: torch conv2d (out, in, k, 1)
    tensors["classifier.0.weight"] = w(cfg.cnn_hidden, cfg.d_model,
                                       cfg.cnn_kernel, 1, scale=0.05)
    tensors["classifier.0.bias"] = np.zeros(cfg.cnn_hidden, np.float32)
    tensors["classifier.3.weight"] = w(cfg.n_classes, cfg.cnn_hidden,
                                       cfg.cnn_kernel, 1, scale=0.05)
    tensors["classifier.3.bias"] = np.zeros(cfg.n_classes, np.float32)

    os.makedirs(out_dir, exist_ok=True)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    # pin the tokenizer mapping the way a real checkpoint ships it
    aa_order = "ALGVSREDTIPKFQNYMHWC"  # ProtT5 frequency order, ids 3..22
    added = {"<AA2fold>": 128, "<fold2AA>": 129}
    with open(os.path.join(out_dir, "added_tokens.json"), "w") as f:
        json.dump(added, f)
    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2}
    for k, a in enumerate(aa_order):
        vocab["▁" + a] = 3 + k
    with open(os.path.join(out_dir, "tokenizer.json"), "w") as f:
        json.dump({"model": {"vocab": vocab}, "added_tokens": [
            {"id": i, "content": c} for c, i in added.items()]}, f)
    # config.json pins the geometry (models/prostt5.py::infer_config),
    # exactly as real HF checkpoints ship it
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({"d_model": cfg.d_model, "d_kv": cfg.d_kv,
                   "num_heads": cfg.n_heads, "d_ff": cfg.d_ff,
                   "num_layers": cfg.n_layers,
                   "feed_forward_proj": "relu"}, f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", help="Real checkpoint dir (HF/gguf)")
    ap.add_argument("--synthetic", choices=["small", "full"],
                    help="Fabricate a synthetic checkpoint of this geometry")
    ap.add_argument("--workdir", default="/tmp/weights_drill")
    ap.add_argument("--tree-builder", default="fasttree")
    ap.add_argument("--skip-pipeline", action="store_true",
                    help="Stop after the predict smoke (loader drill only)")
    ap.add_argument("--cpu", action="store_true",
                    help="Force the CPU backend (leave the chip alone)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if not args.checkpoint and not args.synthetic:
        args.synthetic = "small"

    work = args.workdir
    os.makedirs(work, exist_ok=True)
    report = {"mode": "real" if args.checkpoint else f"synthetic-{args.synthetic}"}

    ckpt = args.checkpoint
    if not ckpt:
        ckpt = os.path.join(work, "ckpt")
        t0 = time.time()
        make_synthetic_checkpoint(ckpt, args.synthetic)
        report["fabricate_s"] = round(time.time() - t0, 1)

    # ---- step 2: loader drill (the exact createdb path: geometry from
    # the checkpoint's config.json, weights through load_params) ----
    from unicore_tpu.models.prostt5 import ProstT5Engine

    t0 = time.time()
    engine = ProstT5Engine(ckpt)
    ok = engine.probe()
    report["load_s"] = round(time.time() - t0, 1)
    report["probe_ok"] = bool(ok)
    report["loaded_pretrained"] = bool(engine.loaded_pretrained)
    report["geometry"] = {
        "d_model": engine.cfg.d_model, "n_layers": engine.cfg.n_layers,
        "d_ff": engine.cfg.d_ff, "n_heads": engine.cfg.n_heads,
    }
    if not ok or not engine.loaded_pretrained:
        print(json.dumps(report))
        print("FAIL: checkpoint did not load/probe as pretrained weights",
              file=sys.stderr)
        return 1

    # ---- step 3: predict smoke on the fixture ----
    from unicore_tpu.io.fasta import read_fasta

    seqs = []
    for f in FIXTURE:
        seqs.extend(read_fasta(os.path.join(DATA, f)).values())
    seqs = [s for s in seqs if len(s) >= 2][:64]
    t0 = time.time()
    ss = engine.predict(seqs)
    dt = time.time() - t0
    n_res = sum(len(s) for s in seqs)
    assert all(len(a) == len(b) for a, b in zip(seqs, ss)), "length mismatch"
    alpha = set("ACDEFGHIKLMNPQRSTVWY")
    assert all(set(x) <= alpha for x in ss), "non-3Di letters emitted"
    ss2 = engine.predict(seqs[:8])
    assert ss2 == ss[:8], "prediction not deterministic"
    report["predict_residues_per_s"] = round(n_res / dt, 1)
    report["n_seqs_smoke"] = len(seqs)

    if args.skip_pipeline:
        print(json.dumps(report))
        return 0

    # ---- step 4: full easy-core + golden regeneration ----
    from unicore_tpu.cli import build_parser, resolve
    from unicore_tpu.workflow import easy_core

    ind = os.path.join(work, "in")
    if os.path.isdir(ind):
        shutil.rmtree(ind)
    os.makedirs(ind)
    for s in FIXTURE:
        shutil.copy(os.path.join(DATA, s), ind)
    out = os.path.join(work, "out")
    if os.path.isdir(out):
        shutil.rmtree(out)
    t0 = time.time()
    ns = build_parser().parse_args([
        "easy-core", ind, out, ckpt, os.path.join(work, "tmp"),
        "--tree-builder", args.tree_builder,
        "--tree-options=-gamma -boot 10", "-v", "1",
    ])
    easy_core.run(resolve(ns))
    report["easy_core_s"] = round(time.time() - t0, 1)

    gold_new = os.path.join(work, "golden_new")
    os.makedirs(gold_new, exist_ok=True)
    shutil.copy(os.path.join(out, "proteome", "proteome_db.map"),
                os.path.join(gold_new, "proteome_db.map"))
    shutil.copy(os.path.join(out, "cluster", "clust.tsv"),
                os.path.join(gold_new, "clust.tsv"))
    shutil.copy(os.path.join(out, "profile", "copiness.tsv"),
                os.path.join(gold_new, "copiness.tsv"))
    from unicore_tpu.io.seqdb import SeqDB
    db = SeqDB.read(os.path.join(out, "proteome", "proteome_db"))
    with open(os.path.join(gold_new, "3di_sample.tsv"), "w") as f:
        for n, s in list(zip(db.names, db.ss_seqs))[:40]:
            f.write(f"{n}\t{s}\n")
    genes = sorted(g for g in os.listdir(os.path.join(out, "profile"))
                   if g.endswith(".txt"))
    with open(os.path.join(gold_new, "core_genes.txt"), "w") as f:
        for g in genes:
            members = sorted(
                open(os.path.join(out, "profile", g)).read().splitlines())
            f.write(g + "\t" + ";".join(members) + "\n")

    # ---- step 5: stage-by-stage diff vs the shipped goldens ----
    gold_old = os.path.join(_REPO, "tests", "golden")
    diff = {}
    for fname in ("3di_sample.tsv", "clust.tsv", "copiness.tsv",
                  "core_genes.txt", "proteome_db.map"):
        a = open(os.path.join(gold_old, fname)).read().splitlines()
        b = open(os.path.join(gold_new, fname)).read().splitlines()
        sa, sb = set(a), set(b)
        diff[fname] = {
            "equal": a == b,
            "lines_old": len(a), "lines_new": len(b),
            "jaccard": round(len(sa & sb) / max(len(sa | sb), 1), 4),
        }
    # 3Di per-residue identity on shared names
    olds = dict(l.split("\t") for l in
                open(os.path.join(gold_old, "3di_sample.tsv")).read().splitlines())
    news = dict(l.split("\t") for l in
                open(os.path.join(gold_new, "3di_sample.tsv")).read().splitlines())
    shared = set(olds) & set(news)
    ident = [sum(x == y for x, y in zip(olds[k], news[k])) / max(len(olds[k]), 1)
             for k in shared if len(olds[k]) == len(news[k])]
    diff["3di_residue_identity_mean"] = round(float(np.mean(ident)), 4) if ident else None
    report["diff_vs_shipped_goldens"] = diff
    report["n_clusters"] = len({l.split("\t")[0] for l in
                                open(os.path.join(gold_new, "clust.tsv"))})
    report["n_core_genes"] = len(genes)
    report["promote_cmd"] = f"cp {gold_new}/* {gold_old}/"
    report["followups"] = [
        "regenerate tests/golden/full30.json (scripts/gen_full30_golden.py)",
        "re-run config-4: python scripts/scale_pipeline.py --workdir /tmp/scale_r5w",
        "crossval vs reference binaries when available (scripts/crossval.py)",
    ]
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
