"""Alignment score statistics (Karlin-Altschul E-values).

The reference delegates E-value computation to Foldseek.  Here we compute
ungapped Karlin-Altschul lambda for the *actual* combined substitution
matrix by solving  sum_ij p_i p_j exp(lambda * s_ij) = 1  (Newton), with
uniform background frequencies per channel, and use the BLAST-style
gapped approximation K = 0.041.  E = K * m * n * exp(-lambda * S),
bits = (lambda * S - ln K) / ln 2.

This is an approximation (gapped parameters would need simulation);
downstream it only gates cluster/search edges, where the coverage
criterion dominates.
"""

from __future__ import annotations

import functools
import math

import numpy as np

K_DEFAULT = 0.041


@functools.lru_cache(maxsize=8)
def _lambda_cached(key) -> float:
    S, p, q = key
    S = np.array(S)
    p = np.array(p)
    q = np.array(q)

    def f(lam: float) -> float:
        with np.errstate(over="ignore"):
            return float(p @ np.exp(np.minimum(lam * S, 700.0)) @ q) - 1.0

    if float(p @ S @ q) >= 0:
        # positive expected score: KA theory inapplicable; weak fallback
        return 1e-3
    hi = 0.5
    while f(hi) < 0 and hi < 64:
        hi *= 2
    lo = 1e-6
    for _ in range(80):
        mid = (lo + hi) / 2
        if f(mid) < 0:
            lo = mid
        else:
            hi = mid
    return float((lo + hi) / 2)


def karlin_lambda(S: np.ndarray, p: np.ndarray | None = None, q: np.ndarray | None = None) -> float:
    """Solve sum p_i q_j exp(lambda s_ij) = 1 for lambda > 0."""
    n, m = S.shape
    if p is None:
        p = np.full(n, 1.0 / n)
    if q is None:
        q = np.full(m, 1.0 / m)
    key = (
        tuple(map(tuple, np.round(S, 6))),
        tuple(np.round(p, 9)),
        tuple(np.round(q, 9)),
    )
    return _lambda_cached(key)


def combined_lambda(saa: np.ndarray, s3d: np.ndarray, w_aa: float, w_3di: float) -> float:
    """Lambda for the combined independent-channel score w_aa*Saa + w_3di*S3d.

    Under channel independence the MGF factorizes, so we solve on the
    (small) joint 21x21 x 21x21 outer sum via the 441-state joint matrix.
    """
    n = saa.shape[0]
    joint = (
        w_aa * np.repeat(np.repeat(saa, n, 0), n, 1)
        + w_3di * np.tile(np.tile(s3d, (n, 1)), (1, n))
    )
    # exclude X states from the background (they never occur in real data)
    keep = [i * n + j for i in range(n - 1) for j in range(n - 1)]
    joint = joint[np.ix_(keep, keep)]
    return karlin_lambda(joint)


def evalue(score: np.ndarray, m: float, n: float, lam: float, K: float = K_DEFAULT) -> np.ndarray:
    return K * m * n * np.exp(-lam * np.asarray(score, dtype=np.float64))


def bitscore(score: np.ndarray, lam: float, K: float = K_DEFAULT) -> np.ndarray:
    return (lam * np.asarray(score, dtype=np.float64) - math.log(K)) / math.log(2.0)
