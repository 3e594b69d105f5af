"""One-off: probe batch_tile values between the shipped 64 and the
known-overflow 96 (VMEM ceiling), same measurement discipline as
bench.py (loop inside one jit, distinct inputs per timed call).
Compare only within this run (chip state drifts between sessions)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
from unicore_tpu.ops.sw import sw_forward_pallas

B, L, iters = 2048, 512, 20
rng = np.random.RandomState(7)
saa = jnp.asarray(BLOSUM62.astype(np.float32))
s3d = jnp.asarray(default_3di_matrix().astype(np.float32))
qa = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
qs = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
ta = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
ts = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
ln = jnp.asarray(np.full(B, L, np.int32))

for bt in (64, 72, 80):
    @functools.partial(jax.jit, static_argnames=("n", "tile"))
    def loop(seed, n, tile):
        def body(i, acc):
            q2 = jnp.roll(qa, i + seed, axis=0)
            b, _, _ = sw_forward_pallas(
                q2, qs, ta, ts, ln, ln, saa, s3d,
                gap_window=64, batch_tile=tile,
            )
            return acc + jnp.sum(b)
        return jax.lax.fori_loop(0, n, body, 0.0)

    try:
        jax.block_until_ready(loop(jnp.int32(0), n=iters, tile=bt))
        times = []
        for seed in (1000, 2000):
            t0 = time.time()
            jax.block_until_ready(loop(jnp.int32(seed), n=iters, tile=bt))
            times.append(time.time() - t0)
        dt = max((min(times) - 0.1) / iters, 1e-6)
        print(f"BT={bt}: {B * L * L / dt / 1e9:.2f} GCUPS", flush=True)
    except Exception as e:  # VMEM overflow etc.
        print(f"BT={bt}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
