"""Round-3 SW kernel tuning: batch-tile scaling via sub-blocked scores.

Round-2 data showed near-linear GCUPS scaling BT 32->48->64 (latency-
bound chain), capped by the (BT, RB, LT) score scratch in VMEM.  The
`score_rows` sub-blocking shrinks that scratch RB/SR-fold, so BT can
keep climbing.  This sweep measures the new configs against the
shipping one IN THE SAME SESSION (the chip drifts ~1.8x between
sessions; only within-run ratios transfer), checking bit-exactness vs
the XLA scan on every config first.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
     python -u scripts/tune_sw3.py [B L]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
from unicore_tpu.ops.sw import build_scores, sw_forward_pallas, sw_forward_xla


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    iters = 20
    rng = np.random.RandomState(7)
    saa = jnp.asarray(BLOSUM62.astype(np.float32))
    s3d = jnp.asarray(default_3di_matrix().astype(np.float32))
    qa = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    qs = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    ta = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    ts = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    ln = jnp.asarray(np.full(B, L, np.int32))
    print(f"platform={jax.devices()[0].platform} B={B} L={L}", flush=True)

    # exactness reference on a subset — computed on the HOST CPU device
    # (sending the (nchk, L, L) score tensor through the tunnel and
    # compiling the scan remotely takes forever / wedges)
    nchk = min(B, 128)
    S = build_scores(np.asarray(qa[:nchk]), np.asarray(qs[:nchk]),
                     np.asarray(ta[:nchk]), np.asarray(ts[:nchk]),
                     np.full(nchk, L, np.int32), np.full(nchk, L, np.int32),
                     np.asarray(saa), np.asarray(s3d))
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        ref = [np.asarray(x) for x in sw_forward_xla(
            jax.device_put(jnp.asarray(S), cpu0), gap_window=64)]

    configs = [
        ("ship bt64 sr=rb", dict(gap_window=64)),
        ("bt96 sr64", dict(gap_window=64, batch_tile=96, score_rows=64)),
        ("bt128 sr64", dict(gap_window=64, batch_tile=128, score_rows=64)),
        ("bt128 sr32", dict(gap_window=64, batch_tile=128, score_rows=32)),
        ("bt160 sr32", dict(gap_window=64, batch_tile=160, score_rows=32)),
        ("bt192 sr32", dict(gap_window=64, batch_tile=192, score_rows=32)),
        ("bt128 sr32 ch2", dict(gap_window=64, batch_tile=128, score_rows=32, chains=2)),
        ("bt256 sr16", dict(gap_window=64, batch_tile=256, score_rows=16)),
    ]
    base_ms = None
    for name, kw in configs:
        try:
            t0 = time.time()
            b0, q0, t0e = sw_forward_pallas(
                qa[:nchk], qs[:nchk], ta[:nchk], ts[:nchk],
                ln[:nchk], ln[:nchk], saa, s3d, **kw)
            jax.block_until_ready(b0)
            compile_s = time.time() - t0
            ok = (np.array_equal(np.asarray(b0), ref[0])
                  and np.array_equal(np.asarray(q0), ref[1])
                  and np.array_equal(np.asarray(t0e), ref[2]))
            if not ok:
                print(f"{name:18s}  INEXACT — rejected", flush=True)
                continue

            @functools.partial(jax.jit, static_argnames=("n",))
            def loop(seed, n, _kw=tuple(sorted(kw.items()))):
                def body(i, acc):
                    q2 = jnp.roll(qa, i + seed, axis=0)
                    bb, _, _ = sw_forward_pallas(
                        q2, qs, ta, ts, ln, ln, saa, s3d, **dict(_kw))
                    return acc + jnp.sum(bb)
                return jax.lax.fori_loop(0, n, body, 0.0)

            jax.block_until_ready(loop(jnp.int32(0), n=iters))
            times = []
            for seed in (1000, 2000):
                t0 = time.time()
                jax.block_until_ready(loop(jnp.int32(seed), n=iters))
                times.append(time.time() - t0)
            dt = max((min(times) - 0.1) / iters, 1e-6)
            ms = dt * 1e3
            gcups = B * L * L / dt / 1e9
            if base_ms is None:
                base_ms = ms
            print(f"{name:18s}  {ms:7.2f} ms/iter  {gcups:7.1f} GCUPS  "
                  f"x{base_ms / ms:4.2f} vs ship  (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:18s}  FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
