"""Progressive multiple sequence alignment (FoldMason / MAFFT equivalent).

Modes:
  * "3di+aa" — structure-aware: column scores combine AA (BLOSUM62) and
    3Di substitution profiles, FoldMason-style weighting
    (`foldmason structuremsa` contract, tree.rs:201-231)
  * "aa"     — sequence-only (mafft / mafft-linsi contract,
    tree.rs:166-198); `refine_iters > 0` adds iterative refinement
    passes (linsi-flavored accuracy bump)

Algorithm: hashed-kmer distances -> UPGMA guide tree -> postorder
profile-profile semi-global NW merges (ops/nw.py).  Alignments are
represented as (n_seqs, n_cols) int32 index matrices (-1 = gap), so
merges are pure integer column surgery; profiles are one-hot averages.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from unicore_tpu.alphabets import AA_SIZE, TDI_SIZE, encode_3di, encode_aa
from unicore_tpu.matrices import get_3di_matrix, get_aa_matrix
from unicore_tpu.msa.guide_tree import GuideNode, kmer_distance_matrix, upgma
from unicore_tpu.ops.nw import nw_align, profile_scores


class _Alignment:
    """rows: original sequence indices; cols: index matrix (n, L), -1=gap."""

    __slots__ = ("rows", "cols")

    def __init__(self, rows: List[int], cols: np.ndarray):
        self.rows = rows
        self.cols = cols  # (n, L) int32


def _profile(aln: _Alignment, seqs_codes: List[np.ndarray], size: int) -> np.ndarray:
    n, L = aln.cols.shape
    prof = np.zeros((L, size), dtype=np.float32)
    for r, sidx in enumerate(aln.rows):
        codes = seqs_codes[sidx]
        idx = aln.cols[r]
        valid = idx >= 0
        prof[np.nonzero(valid)[0], codes[idx[valid]]] += 1.0
    prof /= max(n, 1)
    return prof


def _merge(aln1: _Alignment, aln2: _Alignment, path: List[Tuple[int, int]]) -> _Alignment:
    L = len(path)
    n1, n2 = aln1.cols.shape[0], aln2.cols.shape[0]
    out = np.full((n1 + n2, L), -1, dtype=np.int32)
    for c, (i, j) in enumerate(path):
        if i >= 0:
            out[:n1, c] = aln1.cols[:, i]
        if j >= 0:
            out[n1:, c] = aln2.cols[:, j]
    return _Alignment(aln1.rows + aln2.rows, out)


class ProgressiveMSA:
    name = "tpu-progressive-msa"

    def __init__(
        self,
        mode: str = "3di+aa",
        refine_iters: int = 0,
        gap_open: float = 11.0,
        gap_extend: float = 1.0,
        w_aa: float = 1.4,
        w_3di: float = 2.1,
    ):
        self.mode = mode
        self.refine_iters = refine_iters
        self.gap_open = gap_open
        self.gap_extend = gap_extend
        if mode == "3di+aa":
            self.w_aa, self.w_3di = w_aa, w_3di
        else:
            self.w_aa, self.w_3di = 1.0, 0.0
        self.saa = get_aa_matrix().astype(np.float32)
        self.s3d = get_3di_matrix().astype(np.float32)

    # ------------------------------------------------------------------
    def align(
        self, names: List[str], aa_seqs: List[str], ss_seqs: Optional[List[str]] = None
    ) -> Dict[str, str]:
        """Returns {name: aligned AA sequence with '-' gaps} preserving
        input order."""
        n = len(aa_seqs)
        if n == 0:
            return {}
        aa_codes = [encode_aa(s).astype(np.int32) for s in aa_seqs]
        use_ss = self.w_3di > 0 and ss_seqs is not None
        ss_codes = [encode_3di(s).astype(np.int32) for s in ss_seqs] if use_ss else None

        if n == 1:
            return {names[0]: aa_seqs[0]}

        D = kmer_distance_matrix(aa_seqs)
        root = upgma(D)
        aln = self._align_node(root, aa_codes, ss_codes)

        for _ in range(self.refine_iters):
            aln = self._refine(aln, aa_codes, ss_codes)

        return self._emit(aln, names, aa_seqs)

    # ------------------------------------------------------------------
    def _align_node(
        self, node: GuideNode, aa_codes, ss_codes
    ) -> _Alignment:
        if node.is_leaf:
            L = len(aa_codes[node.idx])
            return _Alignment([node.idx], np.arange(L, dtype=np.int32)[None, :])
        a1 = self._align_node(node.left, aa_codes, ss_codes)
        a2 = self._align_node(node.right, aa_codes, ss_codes)
        return self._pairwise_merge(a1, a2, aa_codes, ss_codes)

    def _pairwise_merge(self, a1, a2, aa_codes, ss_codes) -> _Alignment:
        fa1 = _profile(a1, aa_codes, AA_SIZE)
        fa2 = _profile(a2, aa_codes, AA_SIZE)
        fs1 = fs2 = None
        if ss_codes is not None:
            fs1 = _profile(a1, ss_codes, TDI_SIZE)
            fs2 = _profile(a2, ss_codes, TDI_SIZE)
        S = profile_scores(
            fa1, fa2, self.saa, fs1, fs2, self.s3d, w_aa=self.w_aa, w_3di=self.w_3di
        )
        path, _ = nw_align(S, go=self.gap_open, ge=self.gap_extend)
        merged = _merge(a1, a2, path)
        return self._strip_empty(merged)

    @staticmethod
    def _strip_empty(aln: _Alignment) -> _Alignment:
        keep = (aln.cols >= 0).any(axis=0)
        return _Alignment(aln.rows, aln.cols[:, keep])

    # ------------------------------------------------------------------
    def _refine(self, aln: _Alignment, aa_codes, ss_codes) -> _Alignment:
        """Leave-one-out iterative refinement (linsi-flavored)."""
        n = len(aln.rows)
        if n < 3:
            return aln
        for r in range(n):
            rows_rest = [i for i in range(n) if i != r]
            rest = self._strip_empty(
                _Alignment([aln.rows[i] for i in rows_rest], aln.cols[rows_rest])
            )
            solo_idx = aln.rows[r]
            L = len(aa_codes[solo_idx])
            solo = _Alignment([solo_idx], np.arange(L, dtype=np.int32)[None, :])
            merged = self._pairwise_merge(rest, solo, aa_codes, ss_codes)
            # restore row order
            order = np.argsort([merged.rows.index(x) for x in aln.rows])
            aln = _Alignment(
                [merged.rows[i] for i in order], merged.cols[order]
            )
        return aln

    # ------------------------------------------------------------------
    @staticmethod
    def _emit(aln: _Alignment, names: List[str], aa_seqs: List[str]) -> Dict[str, str]:
        out: Dict[str, str] = {}
        by_row = {sidx: r for r, sidx in enumerate(aln.rows)}
        L = aln.cols.shape[1]
        for sidx in range(len(names)):
            r = by_row[sidx]
            seq = aa_seqs[sidx]
            chars = ["-"] * L
            idx = aln.cols[r]
            for c in range(L):
                if idx[c] >= 0:
                    chars[c] = seq[idx[c]]
            out[names[sidx]] = "".join(chars)
        return out

    def probe(self) -> bool:
        out = self.align(["a", "b"], ["ACDE", "ACDE"], ["DDDD", "DDDD"])
        return out["a"] == "ACDE" and out["b"] == "ACDE"
