"""Guide trees for progressive MSA: k-mer distances + UPGMA.

MAFFT-style shared-6mer distance for speed (no pairwise DP needed for the
guide stage); UPGMA agglomeration.  Deterministic: ties broken by lowest
pair index.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from unicore_tpu.alphabets import encode_aa


def _kmer_feats(seqs: List[str], k: int, dim: int) -> np.ndarray:
    """Hashed k-mer presence bags, one row per sequence (0/1 int8)."""
    n = len(seqs)
    feats = np.zeros((n, dim), dtype=np.int8)
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
        feats[r, (v % np.uint64(dim)).astype(np.int64)] = 1
    return feats


def _shared_counts(feats: np.ndarray) -> np.ndarray:
    """(N, N) exact shared-kmer counts.  On an accelerator the 0/1 bags
    ride the MXU as one int8 x int8 -> int32 matmul (exact — an f32/bf16
    device matmul would round counts above the mantissa); on CPU the f32
    gram matrix is exact outright (counts <= dim << 2^24)."""
    import jax

    if feats.shape[0] >= 256 and jax.devices()[0].platform in ("tpu", "axon"):
        import jax.numpy as jnp

        # pad the row axis to a power-of-two shape class: the accumulated
        # group row count is arbitrary (256..4096, different per group),
        # and on the remote-compile tunnel every distinct N is a fresh
        # XLA compile (the pow2 batch-class invariant, BENCH_NOTES r3).
        # Zero rows share nothing; the gram slice drops them.
        n = feats.shape[0]
        npad = 256
        while npad < n:
            npad *= 2
        fp = feats
        if npad != n:
            fp = np.zeros((npad, feats.shape[1]), feats.dtype)
            fp[:n] = feats
        s = jnp.dot(
            jnp.asarray(fp), jnp.asarray(fp).T,
            preferred_element_type=jnp.int32,
        )
        return np.asarray(s)[:n, :n].astype(np.float32)
    f = feats.astype(np.float32)
    return f @ f.T


def _dist_from_counts(shared: np.ndarray, kbits: np.ndarray) -> np.ndarray:
    denom = np.maximum(np.minimum(kbits[:, None], kbits[None, :]), 1.0)
    D = 1.0 - shared / denom
    np.fill_diagonal(D, 0.0)
    return np.maximum(D, 0.0)


def kmer_distance_matrix(seqs: List[str], k: int = 6, dim: int = 8192) -> np.ndarray:
    """1 - shared-kmer fraction via hashed k-mer bags and ONE (N, dim) x
    (dim, N) matmul — replaces the O(n^2) Python set intersections (the
    guide stage only shapes merge order, so the rare hash collision is
    immaterial and the result stays deterministic)."""
    feats = _kmer_feats(seqs, k, dim)
    shared = _shared_counts(feats)
    return _dist_from_counts(shared, feats.astype(np.float32).sum(axis=1))


def kmer_distance_matrices(
    gene_seqs: List[List[str]], k: int = 6, dim: int = 8192
) -> List[np.ndarray]:
    """Per-gene distance matrices from ONE gram matmul over the
    concatenated feature bags of every gene (align_many's guide stage:
    a single device dispatch instead of one small matmul per gene; the
    off-diagonal cross-gene blocks are discarded)."""
    if not gene_seqs:
        return []
    # group genes so each gram matrix stays <= 4096 rows (the cross-gene
    # waste is quadratic; huge gene sets go in a few dispatches)
    out: List[np.ndarray] = []
    group: List[List[str]] = []
    group_n = 0
    for s in gene_seqs + [None]:  # None flushes the tail
        if s is not None and (group_n + len(s) <= 4096 or not group):
            group.append(s)
            group_n += len(s)
            continue
        feats = np.concatenate([_kmer_feats(g, k, dim) for g in group], axis=0)
        shared = _shared_counts(feats)
        kbits = feats.astype(np.float32).sum(axis=1)
        off = 0
        for g in group:
            n = len(g)
            out.append(_dist_from_counts(
                shared[off : off + n, off : off + n].copy(), kbits[off : off + n]
            ))
            off += n
        group = [s] if s is not None else []
        group_n = len(s) if s is not None else 0
    return out


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
    """Vectorized UPGMA: whole-row weighted-average updates and a full-
    matrix masked argmin per merge — no Python inner loops (round-2
    VERDICT weak #3).  Tie-breaking is row-major over the active index
    pairs, identical to the submatrix formulation it replaces (inactive
    rows/cols hold +inf, so the flat argmin scans the same pair order)."""
    n = D.shape[0]
    if n == 1:
        return GuideNode(0)
    d = D.astype(np.float64).copy()
    np.fill_diagonal(d, np.inf)
    nodes: List[Optional[GuideNode]] = [GuideNode(i) for i in range(n)]
    sizes = np.ones(n)
    alive = np.ones(n, dtype=bool)

    for _ in range(n - 1):
        flat = int(np.argmin(d))
        i, j = divmod(flat, n)
        if i > j:
            i, j = j, i
        h = d[i, j] / 2.0
        merged = GuideNode(-1, nodes[i], nodes[j], height=h)
        si, sj = sizes[i], sizes[j]
        # weighted-average row update, vectorized over every other index
        nd = (d[i, :] * si + d[j, :] * sj) / (si + sj)
        nd[~alive] = np.inf
        nd[i] = np.inf
        d[i, :] = nd
        d[:, i] = nd
        d[j, :] = np.inf
        d[:, j] = np.inf
        sizes[i] = si + sj
        nodes[i] = merged
        nodes[j] = None
        alive[j] = False
    return nodes[int(np.nonzero(alive)[0][0])]
