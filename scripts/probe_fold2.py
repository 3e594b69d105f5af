"""Interleaved A/B of the boundary-where fold (drift-controlled)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from unicore_tpu.matrices import BLOSUM62, MAT3DI
import unicore_tpu.ops.sw as sw

saa = BLOSUM62.astype(np.float32); s3d = MAT3DI.astype(np.float32)

def make(B, L, iters, fold):
    rng = np.random.RandomState(0)
    qa = rng.randint(0, 20, (B, L)).astype(np.int32)
    qs = rng.randint(0, 20, (B, L)).astype(np.int32)
    ta = rng.randint(0, 20, (B, L)).astype(np.int32)
    ts = rng.randint(0, 20, (B, L)).astype(np.int32)
    ln = np.full(B, L, np.int32)
    sw._PROBE_FOLD = fold
    # distinct unroll value per variant forces a distinct jit cache entry
    # (unroll=8 default; both 8 -> same key! use score_dtype trick?) —
    # instead clear caches before tracing each variant.
    jax.clear_caches()
    @jax.jit
    def loop(qa, qs, ta, ts, ln):
        def body(c, _):
            qa, qs, ta, ts = c
            b, qe, te = sw.sw_forward_pallas(qa, qs, ta, ts, ln, ln, saa, s3d, gap_window=64)
            return (qa, qs, ta, ts), b[0]
        _, bs = jax.lax.scan(body, (jnp.asarray(qa), jnp.asarray(qs), jnp.asarray(ta), jnp.asarray(ts)), None, length=iters)
        return bs
    r = loop(qa, qs, ta, ts, ln); r.block_until_ready()
    def run():
        t0 = time.time()
        rr = loop(qa, qs, ta, ts, ln); rr.block_until_ready()
        return B * L * L * iters / (time.time() - t0) / 1e9
    return run

for B, L in ((512, 128), (64, 512)):
    ship = make(B, L, 8, False)
    # NOTE: clear_caches in make() wipes the other's compiled fn — so
    # rebuild closures alternately instead: compile ship, run, compile
    # fold, run, recompile ship, run ... 3 rounds
    res = {"ship": [], "fold": []}
    for rnd in range(3):
        for name, fold in (("ship", False), ("fold", True)):
            fn = make(B, L, 8, fold)
            res[name].append(fn())
    print(f"B={B} L={L} ship={['%.0f'%x for x in res['ship']]} fold={['%.0f'%x for x in res['fold']]}", flush=True)
