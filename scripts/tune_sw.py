"""SW kernel tuning harness — measures GCUPS for kernel variants on the
attached TPU and verifies each variant bit-exact against the f32 default.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tune_sw.py [shape ...]
        shapes like 4096x256 (B x L); default tunes 4096x256.

Methodology (BENCH_NOTES.md): the iteration loop lives inside ONE jitted
program (the tunnel adds ~100 ms per dispatch and caches identical
executions), inputs vary per iteration, dispatch RTT is subtracted, and
the min of 2 timed runs is reported.  Results print as JSON lines.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
from unicore_tpu.ops.sw import sw_forward_pallas

# int16 DP is untunable on this toolchain: the Mosaic remote compiler
# crashes on ANY int16 vector arithmetic (max/add/roll — probed op by op,
# see BENCH_NOTES.md round 2).  All configs below are f32 DP.
CONFIGS = [
    {},  # f32 default = correctness reference
    {"gap_window": 64, "batch_tile": 64},
    {"gap_window": 64, "batch_tile": 96},
    {"gap_window": 64, "batch_tile": 96, "chains": 2},
    {"ungapped": True, "batch_tile": 64},
]


def run_shape(B: int, L: int, iters: int = 40) -> None:
    rng = np.random.RandomState(7)
    saa = jnp.asarray(BLOSUM62.astype(np.float32))
    s3d = jnp.asarray(default_3di_matrix().astype(np.float32))
    qa = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    qs = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    ta = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    ts = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    ln = jnp.asarray(np.full(B, L, np.int32))

    ref_out = None
    for kw in CONFIGS:
        label = ",".join(f"{k}={v}" for k, v in kw.items()) or "f32-default"
        iters_c = iters * 10 if kw.get("ungapped") else iters

        def call(q2, kw=kw):
            return sw_forward_pallas(q2, qs, ta, ts, ln, ln, saa, s3d, **kw)

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(seed, n, kw=kw):
            def body(i, acc):
                q2 = jnp.roll(qa, i + seed, axis=0)
                b, _, _ = call(q2)
                return acc + jnp.sum(b)
            return jax.lax.fori_loop(0, n, body, 0.0)

        try:
            t0 = time.time()
            out = jax.block_until_ready(call(qa))
            compile_s = time.time() - t0
            if kw.get("ungapped"):
                ok = None  # different op; no f32-SW comparison
            elif ref_out is None:
                ref_out = tuple(np.asarray(x) for x in out)
                ok = True
            else:
                ok = all((np.asarray(a) == b).all() for a, b in zip(out, ref_out))
            jax.block_until_ready(loop(jnp.int32(0), n=iters_c))
            times = []
            for seed in (1000, 2000):
                t0 = time.time()
                jax.block_until_ready(loop(jnp.int32(seed), n=iters_c))
                times.append(time.time() - t0)
            dt = max((min(times) - 0.1) / iters_c, 1e-6)
            gcups = B * L * L / dt / 1e9
            print(json.dumps({
                "shape": f"{B}x{L}", "config": label,
                "ms_per_iter": round(dt * 1e3, 2),
                "gcups": round(gcups, 2), "exact": ok,
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — report and move on
            print(json.dumps({
                "shape": f"{B}x{L}", "config": label,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            }), flush=True)


if __name__ == "__main__":
    shapes = sys.argv[1:] or ["4096x256"]
    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    for sh in shapes:
        b, l = map(int, sh.split("x"))
        run_shape(b, l)
