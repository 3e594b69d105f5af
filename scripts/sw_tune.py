"""Kernel tuning harness: time sw_forward_pallas variants on the chip.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/sw_tune.py \
            B L [batch_tile] [gap_window] [segments] [iters]

Prints one line:  cfg=<...> ms/iter=<...> GCUPS=<...>

Run ONE at a time (the tunnel serializes clients).  Keeps the iteration
loop inside one jit and varies inputs per call (tunnel caches identical
executions — see BENCH_NOTES.md).
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
from unicore_tpu.ops.sw import sw_forward_pallas


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    bt = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    gw = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    seg = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    iters = int(sys.argv[6]) if len(sys.argv) > 6 else 10

    rng = np.random.RandomState(7)
    saa = jnp.asarray(BLOSUM62.astype(np.float32))
    s3d = jnp.asarray(default_3di_matrix().astype(np.float32))
    qa = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    qs = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    ta = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    ts = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    ln = jnp.asarray(np.full(B, L, np.int32))

    kw = dict(batch_tile=bt, gap_window=gw, segments=seg)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(seed, n):
        def body(i, acc):
            q2 = jnp.roll(qa, i + seed, axis=0)
            b, _, _ = sw_forward_pallas(q2, qs, ta, ts, ln, ln, saa, s3d, **kw)
            return acc + jnp.sum(b)
        return jax.lax.fori_loop(0, n, body, 0.0)

    t0 = time.time()
    jax.block_until_ready(loop(jnp.int32(0), n=iters))
    compile_s = time.time() - t0
    times = []
    for seed in (1000, 2000, 3000):
        t0 = time.time()
        jax.block_until_ready(loop(jnp.int32(seed), n=iters))
        times.append(time.time() - t0)
    dt = (min(times) - 0.1) / iters
    gcups = B * L * L / dt / 1e9
    print(
        f"cfg B={B} L={L} bt={bt} gw={gw} seg={seg} "
        f"compile={compile_s:.1f}s ms/iter={dt*1e3:.2f} GCUPS={gcups:.1f} "
        f"times={[round(t,3) for t in times]}"
    )


if __name__ == "__main__":
    main()
