"""Perf probe: ceiling of the boundary-where fold (NOT exact — A/B timing only).

Measures the shipping kernel vs a hacked variant with the two per-row
boundary selects removed (diag roll-where and Pexc roll-where).  If the
gain is under ~4% the fold is not worth its complexity (sentinel raise +
bucket-bump policy).  Run on the TPU.
"""
import sys, time
import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from unicore_tpu.matrices import BLOSUM62, MAT3DI
import unicore_tpu.ops.sw as sw

def bench_config(tag, B, L, iters=8):
    rng = np.random.RandomState(0)
    saa = BLOSUM62.astype(np.float32)
    s3d = MAT3DI.astype(np.float32)
    qa = rng.randint(0, 20, (B, L)).astype(np.int32)
    qs = rng.randint(0, 20, (B, L)).astype(np.int32)
    ta = rng.randint(0, 20, (B, L)).astype(np.int32)
    ts = rng.randint(0, 20, (B, L)).astype(np.int32)
    ln = np.full(B, L, np.int32)

    @jax.jit
    def loop(qa, qs, ta, ts, ln):
        def body(c, _):
            qa, qs, ta, ts = c
            b, qe, te = sw.sw_forward_pallas(
                qa, qs, ta, ts, ln, ln, saa, s3d, gap_window=64)
            qa = qa + (b[0] % 2).astype(jnp.int32) * 0
            return (qa, qs, ta, ts), b[0]
        _, bs = jax.lax.scan(body, (jnp.asarray(qa), jnp.asarray(qs), jnp.asarray(ta), jnp.asarray(ts)), None, length=iters)
        return bs
    r = loop(qa, qs, ta, ts, ln)
    r.block_until_ready()
    t0 = time.time()
    r = loop(qa, qs, ta, ts, ln)
    r.block_until_ready()
    dt = time.time() - t0
    cells = B * L * L * iters
    print(f"{tag}: B={B} L={L} {cells/dt/1e9:.2f} GCUPS", flush=True)
    return cells / dt / 1e9

orig_kernel = sw._sw_kernel
mode = sys.argv[1] if len(sys.argv) > 1 else "ship"
if mode == "fold":
    # monkeypatch: strip the two boundary selects (INEXACT, perf only)
    import functools
    import jax as _jax
    from jax.experimental.pallas import tpu as pltpu
    src_one_row_patch = True
    def patched_kernel(*args, **kw):
        # re-enter the original with gap_window as-is but wrap one_row? simplest:
        # monkeypatch jnp.where? too broad. Use env flag consumed inside.
        return orig_kernel(*args, **kw)
    # Instead: patch at the source level below via sw._PROBE_FOLD
    sw._PROBE_FOLD = True
else:
    sw._PROBE_FOLD = False

for B, L in ((512, 128), (128, 256), (64, 512)):
    bench_config(mode, B, L)
