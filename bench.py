"""Benchmark — Smith-Waterman 3Di+AA alignment throughput per chip.

Runs the Pallas prefix-scan SW kernel (the pipeline's hot inner loop,
replacing foldseek's gapped alignment stage) on the attached accelerator
and prints ONE JSON line:

    {"metric": "sw_3di_gcups_per_chip", "value": N, "unit": "GCUPS",
     "vs_baseline": N / 2.0}

Baseline note: the reference publishes no numbers (BASELINE.md); the
denominator 2.0 GCUPS is the documented stand-in for CPU-Foldseek-class
striped-SW throughput on one server core-group, per BASELINE.json's
">=50x CPU-Foldseek per chip" target framing.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
    from unicore_tpu.ops.sw import sw_forward_pallas, sw_forward_xla, build_scores

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")

    rng = np.random.RandomState(7)
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)

    if on_tpu:
        B, L, iters = 2048, 512, 20
    else:
        B, L, iters = 64, 128, 2

    import functools
    import jax.numpy as jnp

    qa = rng.randint(0, 20, (B, L)).astype(np.int32)
    qs = rng.randint(0, 20, (B, L)).astype(np.int32)
    ta = rng.randint(0, 20, (B, L)).astype(np.int32)
    ts = rng.randint(0, 20, (B, L)).astype(np.int32)
    ln = np.full(B, L, np.int32)

    if on_tpu:
        # loop inside one jit so per-dispatch transport latency (large on
        # tunneled dev chips) does not pollute the kernel measurement
        dsaa, ds3d = jnp.asarray(saa), jnp.asarray(s3d)
        dqa, dqs, dta, dts, dln = (jnp.asarray(x) for x in (qa, qs, ta, ts, ln))

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(qa, qs, ta, ts, ln, n):
            def body(i, acc):
                q2 = jnp.roll(qa, i, axis=0)
                b, _, _ = sw_forward_pallas(q2, qs, ta, ts, ln, ln, dsaa, ds3d)
                return acc + jnp.sum(b)
            return jax.lax.fori_loop(0, n, body, 0.0)

        jax.block_until_ready(run(dqa, dqs, dta, dts, dln, n=iters))
        t0 = time.time()
        out = run(dqa, dqs, dta, dts, dln, n=iters)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
    else:
        def run_once():
            scores = build_scores(qa, qs, ta, ts, ln, ln, saa, s3d)
            return sw_forward_xla(scores)

        jax.block_until_ready(run_once())
        t0 = time.time()
        for _ in range(iters):
            out = run_once()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters

    gcups = B * L * L / dt / 1e9
    baseline_gcups = 2.0
    print(json.dumps({
        "metric": "sw_3di_gcups_per_chip",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / baseline_gcups, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
