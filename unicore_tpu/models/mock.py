"""Deterministic mock 3Di predictor (test backend).

Without network egress the real ProstT5 weights cannot be downloaded, so
tests and offline runs use this deterministic surrogate: the 3Di letter at
position i is a fixed function of the AA trigram (i-1, i, i+1).  Identical
local contexts map to identical letters, so homologous sequences receive
highly similar 3Di strings — preserving the downstream behavior the
pipeline depends on (structural clustering of homologs) while being fully
reproducible across hosts and backends.

Selected with model == "mock" or UNICORE_TPU_MOCK_PROSTT5=1.
"""

from __future__ import annotations

from typing import List

import numpy as np

from unicore_tpu.alphabets import AA_SIZE, TDI_ALPHABET, encode_aa

_RNG = np.random.RandomState(20240617)
_TABLE = _RNG.randint(0, len(TDI_ALPHABET), size=AA_SIZE ** 3).astype(np.int8)


class MockProstT5:
    name = "mock-prostt5"

    def predict(self, sequences: List[str]) -> List[str]:
        out = []
        tdi = np.frombuffer(TDI_ALPHABET.encode(), dtype=np.uint8)
        for seq in sequences:
            a = encode_aa(seq).astype(np.int64)
            left = np.roll(a, 1)
            right = np.roll(a, -1)
            if len(a) > 0:
                left[0] = AA_SIZE - 1
                right[-1] = AA_SIZE - 1
            key = (left * AA_SIZE + a) * AA_SIZE + right
            codes = _TABLE[key]
            out.append(tdi[codes].tobytes().decode())
        return out
