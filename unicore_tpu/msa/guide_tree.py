"""Guide trees for progressive MSA: k-mer distances + UPGMA.

MAFFT-style shared-6mer distance for speed (no pairwise DP needed for the
guide stage); UPGMA agglomeration.  Deterministic: ties broken by lowest
pair index.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from unicore_tpu.alphabets import encode_aa


def kmer_distance_matrix(seqs: List[str], k: int = 6, dim: int = 8192) -> np.ndarray:
    """1 - shared-kmer fraction via hashed k-mer bags and ONE (N, dim) x
    (dim, N) matmul — replaces the O(n^2) Python set intersections (the
    guide stage only shapes merge order, so the rare hash collision is
    immaterial and the result stays deterministic)."""
    n = len(seqs)
    feats = np.zeros((n, dim), dtype=np.float32)
    mult = np.uint64(0x9E3779B97F4A7C15)
    for r, s in enumerate(seqs):
        codes = encode_aa(s).astype(np.uint64)
        m = len(codes) - k + 1
        if m <= 0:
            continue
        v = np.zeros(m, dtype=np.uint64)
        for i in range(k):
            v = v * np.uint64(21) + codes[i : i + m]
        v = v * mult
        v ^= v >> np.uint64(29)
        feats[r, (v % np.uint64(dim)).astype(np.int64)] = 1.0
    kbits = feats.sum(axis=1)
    shared = feats @ feats.T
    denom = np.maximum(np.minimum(kbits[:, None], kbits[None, :]), 1.0)
    D = 1.0 - shared / denom
    np.fill_diagonal(D, 0.0)
    return np.maximum(D, 0.0)


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
