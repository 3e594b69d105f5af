"""Scaling-efficiency harness (BASELINE.json configs 4-5 plumbing).

Measures, on the available devices (real TPU slice or the virtual CPU
mesh via XLA_FLAGS=--xla_force_host_platform_device_count=N):

  * ProstT5 inference residues/sec at dp=1 vs dp=N (weights random —
    identical FLOP cost to trained weights)
  * SW pair-batch throughput at dp=1 vs dp=N (sharded kernel)

Prints one JSON line per measurement plus a scaling-efficiency summary.
Run: python scripts/scaling_bench.py [--seqs 512] [--len 384]

Note: on the virtual CPU mesh all "devices" share one physical CPU, so
the efficiency numbers there only validate the sharding plumbing; real
scaling measurements require an actual multi-chip slice.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=256)
    ap.add_argument("--len", type=int, dest="length", default=384)
    ap.add_argument("--pairs", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n_dev = len(jax.devices())
    results = {}

    # ---- ProstT5 DP scaling ----
    from unicore_tpu.models.prostt5 import T5Config, init_params
    from unicore_tpu.parallel.mesh import make_mesh
    from unicore_tpu.parallel.sharding import make_sharded_predict

    cfg = T5Config(d_model=512, d_kv=64, n_heads=8, d_ff=2048, n_layers=8)
    params = init_params(cfg, seed=0)
    rng = np.random.RandomState(0)
    B, L = args.seqs, args.length
    toks = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    mask = jnp.asarray(np.ones((B, L), bool))

    for dp in sorted({1, n_dev}):
        mesh = make_mesh(n_devices=dp, dp=dp, tp=1)
        run = make_sharded_predict(cfg, mesh)
        with mesh:
            out = run(params, toks, mask)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(3):
                out = run(params, toks, mask)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / 3
        rps = B * L / dt
        results[f"prostt5_res_per_s_dp{dp}"] = rps
        print(json.dumps({"metric": f"prostt5_residues_per_sec_dp{dp}", "value": round(rps), "unit": "res/s"}))

    if n_dev > 1:
        eff = results[f"prostt5_res_per_s_dp{n_dev}"] / (n_dev * results["prostt5_res_per_s_dp1"])
        print(json.dumps({"metric": "prostt5_dp_scaling_efficiency", "value": round(eff, 3), "unit": "fraction"}))

    # ---- SW DP scaling ----
    from jax.sharding import Mesh
    from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
    from unicore_tpu.ops.sw import sw_forward_sharded

    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    P, SL = args.pairs, 256
    qa = rng.randint(0, 20, (P, SL)).astype(np.int32)
    qs = rng.randint(0, 20, (P, SL)).astype(np.int32)
    ta = rng.randint(0, 20, (P, SL)).astype(np.int32)
    ts = rng.randint(0, 20, (P, SL)).astype(np.int32)
    ln = np.full(P, SL, np.int32)
    plat = jax.devices()[0].platform
    backend = "pallas" if plat in ("tpu", "axon") else "xla"

    for dp in sorted({1, n_dev}):
        mesh = Mesh(np.asarray(jax.devices()[:dp]), ("dp",))
        out = sw_forward_sharded(qa, qs, ta, ts, ln, ln, saa, s3d, mesh, backend=backend)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = sw_forward_sharded(qa, qs, ta, ts, ln, ln, saa, s3d, mesh, backend=backend)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        g = P * SL * SL / dt / 1e9
        results[f"sw_gcups_dp{dp}"] = g
        print(json.dumps({"metric": f"sw_gcups_dp{dp}", "value": round(g, 2), "unit": "GCUPS"}))

    if n_dev > 1:
        eff = results[f"sw_gcups_dp{n_dev}"] / (n_dev * results["sw_gcups_dp1"])
        print(json.dumps({"metric": "sw_dp_scaling_efficiency", "value": round(eff, 3), "unit": "fraction"}))


if __name__ == "__main__":
    main()
