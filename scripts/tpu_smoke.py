"""On-hardware kernel exactness smoke — the verify recipe's kernel probe.

Runs ONE compiled (non-interpret) Pallas SW batch in the shipping
configuration plus an ungapped-rescore batch on the attached chip and
asserts bit-exactness (scores AND end cells) against the NumPy Gotoh /
Kadane references.  Exits nonzero on any mismatch, so a Mosaic lowering
regression cannot ship silently (round-1 VERDICT weak #5).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 600 python scripts/tpu_smoke.py
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax

    from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
    from unicore_tpu.ops.sw import (
        GAP_EXTEND_INT,
        GAP_OPEN_INT,
        build_scores,
        sw_forward_pallas,
        ungapped_forward_xla,
    )
    from unicore_tpu.ops.sw_ref import sw_forward_ref

    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        print(f"SKIP: no TPU attached (platform={plat})")
        return 0

    rng = np.random.RandomState(11)
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    B, L = 64, 256
    qa = rng.randint(0, 20, (B, L)).astype(np.int32)
    qs = rng.randint(0, 20, (B, L)).astype(np.int32)
    ta = rng.randint(0, 20, (B, L)).astype(np.int32)
    ts = rng.randint(0, 20, (B, L)).astype(np.int32)
    qlen = rng.randint(32, L + 1, B).astype(np.int32)
    tlen = rng.randint(32, L + 1, B).astype(np.int32)
    for b in range(0, B, 2):  # planted homology
        w = min(qlen[b], tlen[b], 48)
        qa[b, :w] = ta[b, :w]
        qs[b, :w] = ts[b, :w]

    # shipping config: gap_window=64, auto batch tile
    best, qe, te = (
        np.asarray(x)
        for x in sw_forward_pallas(qa, qs, ta, ts, qlen, tlen, saa, s3d,
                                   gap_window=64)
    )
    scores = build_scores(qa, qs, ta, ts, qlen, tlen, saa, s3d)
    bad = 0
    for b in range(B):
        # reference MUST use the kernel's shipped default units (100/10
        # since round 4; hardcoded 28/3 here made the smoke a false alarm)
        rb, ri, rj = sw_forward_ref(scores[b, : qlen[b], : tlen[b]],
                                    GAP_OPEN_INT, GAP_EXTEND_INT)
        if best[b] != rb or (rb > 0 and (qe[b], te[b]) != (ri, rj)):
            print(f"MISMATCH pair {b}: got ({best[b]}, {qe[b]}, {te[b]}) "
                  f"want ({rb}, {ri}, {rj})")
            bad += 1
    # ungapped rescore path, compiled
    ub, uqe, ute = (
        np.asarray(x)
        for x in sw_forward_pallas(qa, qs, ta, ts, qlen, tlen, saa, s3d,
                                   ungapped=True)
    )
    xb, xqe, xte = (np.asarray(x) for x in ungapped_forward_xla(scores))
    if not ((ub == xb).all() and (uqe[xb > 0] == xqe[xb > 0]).all()
            and (ute[xb > 0] == xte[xb > 0]).all()):
        print("MISMATCH: compiled ungapped kernel != XLA reference")
        bad += 1

    if bad:
        print(f"FAIL: {bad} mismatches")
        return 1
    print(f"OK: {B} gapped pairs bit-exact (scores + end cells) and "
          "ungapped rescore exact, compiled on", plat)
    return 0


if __name__ == "__main__":
    sys.exit(main())
