"""Substitution matrices for AA and 3Di scoring.

* BLOSUM62 — standard NCBI values, order ARNDCQEGHILKMFPSTWYV + X.
* 3Di default — the reference delegates 3Di scoring to Foldseek's learned
  `mat3di` matrix (values derived from structure-pair training data, not
  re-derivable offline).  The default here is a parameterized surrogate
  (match/mismatch/unknown) that preserves the algorithmic contract; for
  strict Foldseek score parity a real matrix file can be supplied via
  `load_matrix_file` (standard NCBI/foldseek text format) or the
  UNICORE_TPU_3DI_MATRIX environment variable.

Combined structural score (Foldseek-style, gapped SW over 3Di(+AA)):
    s(i,j) = w_3di * S3di[q3di_i, t3di_j] + w_aa * Saa[qaa_i, taa_j]
with Foldseek's default weighting ~ (2.1 : 1.4) normalized here to 1.4/2.1.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from unicore_tpu.alphabets import AA_FULL, AA_SIZE, TDI_FULL, TDI_SIZE

_BLOSUM62_ROWS = """
 4 -1 -2 -2  0 -1 -1  0 -2 -1 -1 -1 -1 -2 -1  1  0 -3 -2  0
-1  5  0 -2 -3  1  0 -2  0 -3 -2  2 -1 -3 -2 -1 -1 -3 -2 -3
-2  0  6  1 -3  0  0  0  1 -3 -3  0 -2 -3 -2  1  0 -4 -2 -3
-2 -2  1  6 -3  0  2 -1 -1 -3 -4 -1 -3 -3 -1  0 -1 -4 -3 -3
 0 -3 -3 -3  9 -3 -4 -3 -3 -1 -1 -3 -1 -2 -3 -1 -1 -2 -2 -1
-1  1  0  0 -3  5  2 -2  0 -3 -2  1  0 -3 -1  0 -1 -2 -1 -2
-1  0  0  2 -4  2  5 -2  0 -3 -3  1 -2 -3 -1  0 -1 -3 -2 -2
 0 -2  0 -1 -3 -2 -2  6 -2 -4 -4 -2 -3 -3 -2  0 -2 -2 -3 -3
-2  0  1 -1 -3  0  0 -2  8 -3 -3 -1 -2 -1 -2 -1 -2 -2  2 -3
-1 -3 -3 -3 -1 -3 -3 -4 -3  4  2 -3  1  0 -3 -2 -1 -3 -1  3
-1 -2 -3 -4 -1 -2 -3 -4 -3  2  4 -2  2  0 -3 -2 -1 -2 -1  1
-1  2  0 -1 -3  1  1 -2 -1 -3 -2  5 -1 -3 -1  0 -1 -3 -2 -2
-1 -1 -2 -3 -1  0 -2 -3 -2  1  2 -1  5  0 -2 -1 -1 -1 -1  1
-2 -3 -3 -3 -2 -3 -3 -3 -1  0  0 -3  0  6 -4 -2 -2  1  3 -1
-1 -2 -2 -1 -3 -1 -1 -2 -2 -3 -3 -1 -2 -4  7 -1 -1 -4 -3 -2
 1 -1  1  0 -1  0  0  0 -1 -2 -2  0 -1 -2 -1  4  1 -3 -2 -2
 0 -1  0 -1 -1 -1 -1 -2 -2 -1 -1 -1 -1 -2 -1  1  5 -2 -2  0
-3 -3 -4 -4 -2 -2 -3 -2 -2 -3 -2 -3 -1  1 -4 -3 -2 11  2 -3
-2 -2 -2 -3 -2 -1 -2 -3  2 -1 -1 -2 -1  3 -3 -2 -2  2  7 -1
 0 -3 -3 -3 -1 -2 -2 -3 -3  3  1 -2  1 -1 -2 -2  0 -3 -1  4
"""


def _blosum62() -> np.ndarray:
    m = np.full((AA_SIZE, AA_SIZE), -1, dtype=np.int32)
    rows = [r for r in _BLOSUM62_ROWS.strip().split("\n")]
    for i, row in enumerate(rows):
        vals = [int(x) for x in row.split()]
        m[i, :20] = vals
    m[20, :] = -1
    m[:, 20] = -1
    return m


BLOSUM62 = _blosum62()


def default_3di_matrix(match: int = 6, mismatch: int = -3, unknown: int = -1) -> np.ndarray:
    m = np.full((TDI_SIZE, TDI_SIZE), mismatch, dtype=np.int32)
    np.fill_diagonal(m, match)
    m[TDI_SIZE - 1, :] = unknown
    m[:, TDI_SIZE - 1] = unknown
    return m


def load_matrix_file(path: str, alphabet: str) -> np.ndarray:
    """Parse an NCBI/foldseek-format substitution matrix text file."""
    with open(path) as f:
        lines = [ln for ln in f if ln.strip() and not ln.lstrip().startswith("#")]
    header = lines[0].split()
    col_idx: Dict[str, int] = {}
    size = len(alphabet)
    m = np.zeros((size, size), dtype=np.int32)
    for j, c in enumerate(header):
        col_idx[c.upper()] = j
    pos = {c: i for i, c in enumerate(alphabet)}
    for ln in lines[1:]:
        parts = ln.split()
        row_letter = parts[0].upper()
        if row_letter not in pos:
            continue
        i = pos[row_letter]
        for c, j in col_idx.items():
            if c in pos and j + 1 < len(parts) + 1:
                m[i, pos[c]] = int(round(float(parts[j + 1])))
    return m


def get_3di_matrix() -> np.ndarray:
    override = os.environ.get("UNICORE_TPU_3DI_MATRIX")
    if override and os.path.isfile(override):
        return load_matrix_file(override, TDI_FULL)
    return default_3di_matrix()


def get_aa_matrix() -> np.ndarray:
    override = os.environ.get("UNICORE_TPU_AA_MATRIX")
    if override and os.path.isfile(override):
        return load_matrix_file(override, AA_FULL)
    return BLOSUM62


# Foldseek-style combined weighting (3Di : AA = 2.1 : 1.4 = 3 : 2),
# expressed in small integer units (6 : 4, gaps 28/3) so every combined
# cell score is a small integer — exact under bf16 MXU arithmetic and in
# bf16 score storage (see ops/sw.py docstring)
W_3DI = 6.0
W_AA = 4.0


def combined_matrix(w_3di: float = W_3DI, w_aa: float = W_AA) -> Optional[np.ndarray]:
    """Joint (21*21 x 21*21) matrix over (aa, 3di) pairs, float32.

    Index = aa_code * TDI_SIZE + tdi_code.  Used to fold both channels
    into one MXU-friendly score lookup.
    """
    aa = get_aa_matrix().astype(np.float32)
    tdi = get_3di_matrix().astype(np.float32)
    joint = (
        w_aa * np.repeat(np.repeat(aa, TDI_SIZE, 0), TDI_SIZE, 1)
        + w_3di * np.tile(np.tile(tdi, (AA_SIZE, 1)), (1, AA_SIZE))
    )
    return joint.astype(np.float32)
