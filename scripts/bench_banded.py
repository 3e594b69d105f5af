"""Long-pair throughput: banded SW (ops/banded.py) vs full-matrix SW.

Times the production entry points on planted-homology pairs at long
lengths (1.5k-3k residues), loop-inside-jit with distinct inputs per
timed call (tunnel-cache-proof, same methodology as bench.py).  Reports
pair/s and the effective full-matrix GCUPS both paths achieve on the
same workload — banded does W/Lt of the cell work, so its effective
number should be ~Lt/W higher.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 python scripts/bench_banded.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def planted(rng, L, shift):
    qa = rng.randint(0, 20, L).astype(np.int32)
    qs = rng.randint(0, 20, L).astype(np.int32)
    ta = np.concatenate([rng.randint(0, 20, shift), qa]).astype(np.int32)
    ts = np.concatenate([rng.randint(0, 20, shift), qs]).astype(np.int32)
    nm = L // 10
    pos = rng.randint(shift, shift + L, nm)
    ta[pos] = rng.randint(0, 20, nm)
    return qa, qs, ta[:L], ts[:L]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from unicore_tpu.matrices import get_3di_matrix, get_aa_matrix
    from unicore_tpu.ops.banded import sw_forward_banded, vote_diagonal
    from unicore_tpu.ops.sw import sw_forward_pallas

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    W = 256
    iters = 8
    rng = np.random.RandomState(0)
    saa = get_aa_matrix().astype(np.float32)
    s3d = get_3di_matrix().astype(np.float32)

    qa = np.zeros((B, L), np.int32)
    qs = np.zeros((B, L), np.int32)
    ta = np.zeros((B, L), np.int32)
    ts = np.zeros((B, L), np.int32)
    d0 = np.zeros(B, np.int32)
    for i in range(B):
        a, s, t, u = planted(rng, L, int(rng.randint(0, 60)))
        qa[i], qs[i], ta[i], ts[i] = a, s, t, u
        d0[i] = vote_diagonal(a, s, t, u) or 0
    ql = np.full(B, L, np.int32)
    tl = np.full(B, L, np.int32)

    dev = jax.devices()[0]
    print(f"device: {dev.platform}", file=sys.stderr)

    def timed(fn, *args, **kw):
        # warm (compile)
        r = fn(*args, **kw)
        jax.block_until_ready(r)
        t0 = time.time()
        for it in range(iters):
            # distinct inputs per call (roll the batch) defeat the remote
            # result cache
            a2 = tuple(
                np.roll(np.asarray(a), it + 1, axis=0)
                if getattr(a, "shape", ()) and a.shape[0] == B else a
                for a in args
            )
            r = fn(*a2, **kw)
            jax.block_until_ready(r)
        return (time.time() - t0) / iters

    t_full = timed(
        sw_forward_pallas if dev.platform in ("tpu", "axon") else _xla_full(saa, s3d),
        qa, qs, ta, ts, ql, tl, saa, s3d, **({"gap_window": 64} if True else {}),
    )
    t_band = timed(
        lambda *a: sw_forward_banded(*a, W=W, gap_window=64),
        qa, qs, ta, ts, ql, tl, d0, jnp.asarray(saa), jnp.asarray(s3d),
    )
    cells = B * float(L) * L
    print(json.dumps({
        "metric": "banded_speedup",
        "L": L, "B": B, "W": W,
        "full_ms": round(t_full * 1e3, 1),
        "banded_ms": round(t_band * 1e3, 1),
        "speedup": round(t_full / t_band, 2),
        "full_gcups": round(cells / t_full / 1e9, 2),
        "banded_effective_gcups": round(cells / t_band / 1e9, 2),
    }))


def _xla_full(saa, s3d):
    from unicore_tpu.ops.sw import build_scores, sw_forward_xla

    def fn(qa, qs, ta, ts, ql, tl, _saa, _s3d, gap_window=64):
        s = build_scores(qa, qs, ta, ts, ql, tl, saa, s3d)
        return sw_forward_xla(s, gap_window=gap_window)

    return fn


if __name__ == "__main__":
    main()
