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

Robustness: the dev TPU tunnel occasionally wedges a client at claim
time (hangs forever at 0% CPU).  The measurement therefore runs in a
watchdog subprocess with retries; the parent prints the one JSON line.
Measurements keep the iteration loop inside a single jitted program and
vary inputs per timed call (the tunnel adds ~100 ms per dispatch and
caches identical executions).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _measure() -> None:
    """Child-process entry: print one JSON result line."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
    from unicore_tpu.ops.sw import build_scores, sw_forward_pallas, sw_forward_xla

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")

    rng = np.random.RandomState(7)
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)

    if on_tpu:
        B, L, iters = 2048, 512, 20
        dsaa, ds3d = jnp.asarray(saa), jnp.asarray(s3d)
        qa = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
        qs = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
        ta = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
        ts = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
        ln = jnp.asarray(np.full(B, L, np.int32))

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(seed, n):
            def body(i, acc):
                q2 = jnp.roll(qa, i + seed, axis=0)
                # the engine's shipping config (align/engine.py defaults):
                # windowed gap scan + the auto batch tile (64)
                b, _, _ = sw_forward_pallas(
                    q2, qs, ta, ts, ln, ln, dsaa, ds3d, gap_window=64,
                )
                return acc + jnp.sum(b)
            return jax.lax.fori_loop(0, n, body, 0.0)

        jax.block_until_ready(loop(jnp.int32(0), n=iters))  # compile+warm
        times = []
        for seed in (1000, 2000):
            t0 = time.time()
            jax.block_until_ready(loop(jnp.int32(seed), n=iters))
            times.append(time.time() - t0)
        dt = (min(times) - 0.1) / iters  # subtract one dispatch RTT
        dt = max(dt, 1e-6)
    else:
        B, L, iters = 64, 128, 2
        qa = rng.randint(0, 20, (B, L)).astype(np.int32)
        qs = rng.randint(0, 20, (B, L)).astype(np.int32)
        ta = rng.randint(0, 20, (B, L)).astype(np.int32)
        ts = rng.randint(0, 20, (B, L)).astype(np.int32)
        ln = np.full(B, L, np.int32)

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


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    last_line = None
    for attempt in range(5):
        try:
            r = subprocess.run(
                [sys.executable, "-u", "-c", "import bench; bench._measure()"],
                cwd=here, env=env, capture_output=True, text=True, timeout=330,
            )
            for ln in (r.stdout or "").strip().splitlines():
                if ln.startswith("{"):
                    last_line = ln
            if last_line:
                break
        except subprocess.TimeoutExpired:
            print(f"bench attempt {attempt + 1} timed out (device claim wedged); retrying", file=sys.stderr)
        time.sleep(10)
    if last_line is None:
        # all attempts wedged/failed — report honestly with zero value
        last_line = json.dumps({
            "metric": "sw_3di_gcups_per_chip",
            "value": 0.0,
            "unit": "GCUPS",
            "vs_baseline": 0.0,
            "error": "device unavailable after 4 attempts",
        })
    print(last_line)
    return 0


if __name__ == "__main__":
    if os.environ.get("UNICORE_TPU_BENCH_CHILD"):
        _measure()
    else:
        sys.exit(main())
