"""Guide trees for progressive MSA: k-mer distances + UPGMA.

MAFFT-style shared-6mer distance for speed (no pairwise DP needed for the
guide stage); UPGMA agglomeration.  Deterministic: ties broken by lowest
pair index.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from unicore_tpu.alphabets import encode_aa


def kmer_distance_matrix(seqs: List[str], k: int = 6) -> np.ndarray:
    """1 - shared-kmer fraction, computed via hashed k-mer sets."""
    n = len(seqs)
    sets = []
    for s in seqs:
        codes = encode_aa(s).astype(np.int64)
        if len(codes) < k:
            sets.append(frozenset([tuple(codes)]))
            continue
        v = np.zeros(len(codes) - k + 1, dtype=np.int64)
        for i in range(k):
            v = v * 21 + codes[i : i + len(v)]
        sets.append(frozenset(v.tolist()))
    D = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            denom = min(len(sets[i]), len(sets[j])) or 1
            shared = len(sets[i] & sets[j])
            D[i, j] = D[j, i] = 1.0 - shared / denom
    return D


class GuideNode:
    __slots__ = ("idx", "left", "right", "height", "size")

    def __init__(self, idx: int, left: "Optional[GuideNode]" = None,
                 right: "Optional[GuideNode]" = None, height: float = 0.0):
        self.idx = idx
        self.left = left
        self.right = right
        self.height = height
        self.size = 1 if left is None else left.size + right.size

    @property
    def is_leaf(self) -> bool:
        return self.left is None


def upgma(D: np.ndarray) -> GuideNode:
    n = D.shape[0]
    if n == 1:
        return GuideNode(0)
    d = D.astype(np.float64).copy()
    np.fill_diagonal(d, np.inf)
    active = list(range(n))
    nodes = [GuideNode(i) for i in range(n)]
    sizes = np.ones(n)

    for _ in range(n - 1):
        # find min pair among active
        sub = d[np.ix_(active, active)]
        flat = np.argmin(sub)
        ai, aj = np.unravel_index(flat, sub.shape)
        if ai > aj:
            ai, aj = aj, ai
        i, j = active[ai], active[aj]
        h = d[i, j] / 2.0
        merged = GuideNode(-1, nodes[i], nodes[j], height=h)
        # update distances (weighted average)
        si, sj = sizes[i], sizes[j]
        for kx in active:
            if kx in (i, j):
                continue
            nd = (d[i, kx] * si + d[j, kx] * sj) / (si + sj)
            d[i, kx] = d[kx, i] = nd
        sizes[i] = si + sj
        nodes[i] = merged
        active.remove(j)
    return nodes[active[0]]
