"""Batched SW traceback via device direction bits — the m8 fill path.

The m8 columns (fident/alnlen/mismatch/gapopen, search.rs:56-61
convertalis contract) need the actual alignment path of every gated
hit.  The round-3 implementation ran a full NumPy Gotoh per hit — a
serial host O(L^2) DP per window.  Here the forward DP of MANY hit
windows runs as ONE jitted lax.scan batch on the device, emitting
compact per-cell direction bits; the host walks each path in O(path)
from the bits (the same device-forward/host-decode split as
ops/nw_device.py, tree.rs MSA loop).

Exactness: scores are integers (combined substitution units plus the
integer composition-bias corrections), the DP is int32, and the bits
encode exactly the equality tests of the NumPy golden model
(ops/sw_ref.py sw_traceback_ref):

    bit0  H[i,j] == E[i,j]        (traceback prefers E)
    bit1  H[i,j] == F[i,j]        (then F; else diagonal)
    bit2  E[i,j] == H[i,j-1]-go   (gap-open while in E)
    bit3  F[i,j] == H[i-1,j]-go   (gap-open while in F)
    bit4  H[i,j] == 0             (local-alignment stop)

so decoded paths are bit-identical to sw_traceback_ref on every
platform (tests/test_sw_bits.py).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INT_NEG = -(2 ** 28)
PAD_SCORE = -20000


@functools.partial(jax.jit, static_argnames=("go", "ge"))
def sw_forward_bits(
    S: jnp.ndarray,    # (B, L1, L2) int16/int32 integer scores (pad <= 0)
    l1: jnp.ndarray,   # (B,) int32 true row counts
    l2: jnp.ndarray,   # (B,) int32 true col counts
    go: int,
    ge: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Local (SW) affine forward emitting direction bits.

    Returns (bits (B, L1, L2) uint8, best_i (B,), best_j (B,), score
    (B,)); best_i/best_j are 0-based end cells, -1 when the best is 0
    (empty alignment).  Ties resolve row-major like np.argmax over the
    full H matrix (lowest i, then lowest j)."""
    B, L1, L2 = S.shape
    S = S.astype(jnp.int32)
    jge = (jnp.arange(L2 + 1, dtype=jnp.int32) * ge)[None, :]

    def cummax(x):
        return jax.lax.associative_scan(jnp.maximum, x, axis=-1)

    def row_step(carry, s_row):
        H_prev, F_prev, best, bi, bj, i = carry
        F = jnp.maximum(H_prev - go, F_prev - ge)                # (B, L2+1)
        diag = H_prev[:, :-1] + s_row
        h0 = jnp.maximum(0, jnp.maximum(diag, F[:, 1:]))
        G = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), h0], axis=1)
        P = cummax(G[:, :-1] + jge[:, :-1])
        Escan = P - go - jge[:, 1:] + ge
        H_in = jnp.maximum(h0, Escan)
        H = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), H_in], axis=1)
        P2 = cummax(H[:, :-1] + jge[:, :-1])
        E = P2 - go - jge[:, 1:] + ge
        bits = (
            (H_in == E).astype(jnp.uint8)
            | ((H_in == F[:, 1:]).astype(jnp.uint8) << 1)
            | ((E == H[:, :-1] - go).astype(jnp.uint8) << 2)
            | ((F[:, 1:] == H_prev[:, 1:] - go).astype(jnp.uint8) << 3)
            | ((H_in == 0).astype(jnp.uint8) << 4)   # local-alignment stop
        )
        # best tracking: row max (first occurrence = lowest j), strict >
        # across rows keeps the earliest row — np.argmax(H) semantics
        valid = (jnp.arange(L2, dtype=jnp.int32)[None, :] < l2[:, None]) & \
                (i <= l1)[:, None]
        Hv = jnp.where(valid, H_in, INT_NEG)
        row_max = jnp.max(Hv, axis=1)
        row_arg = jnp.argmax(Hv, axis=1).astype(jnp.int32)
        upd = row_max > best
        best = jnp.where(upd, row_max, best)
        bi = jnp.where(upd, i - 1, bi)
        bj = jnp.where(upd, row_arg, bj)
        return (H, F, best, bi, bj, i + 1), bits

    H0 = jnp.zeros((B, L2 + 1), jnp.int32)
    F0 = jnp.full((B, L2 + 1), INT_NEG, jnp.int32)
    init = (H0, F0, jnp.zeros((B,), jnp.int32),
            jnp.full((B,), -1, jnp.int32), jnp.full((B,), -1, jnp.int32),
            jnp.int32(1))
    (_, _, best, bi, bj, _), bits = jax.lax.scan(
        row_step, init, jnp.swapaxes(S, 0, 1)
    )
    return jnp.swapaxes(bits, 0, 1), bi, bj, best


def decode_sw_path(
    bits: np.ndarray, bi: int, bj: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Walk the bits from end cell (bi, bj) (0-based) — the exact
    decision sequence of sw_traceback_ref (E preferred, then F, else
    diagonal; stop at H==0, detected as leaving via a diagonal step
    whose predecessors are exhausted)."""
    q_idx: List[int] = []
    t_idx: List[int] = []
    if bi < 0 or bj < 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    i, j = bi + 1, bj + 1  # 1-based DP coords
    state = "H"
    while i > 0 and j > 0:
        b = bits[i - 1, j - 1]
        if state == "H":
            if b & 16:  # H == 0 marker
                break
            if b & 1:
                state = "E"
                continue
            if b & 2:
                state = "F"
                continue
            q_idx.append(i - 1)
            t_idx.append(j - 1)
            i -= 1
            j -= 1
        elif state == "E":
            q_idx.append(-1)
            t_idx.append(j - 1)
            if b & 4:
                state = "H"
            j -= 1
        else:
            q_idx.append(i - 1)
            t_idx.append(-1)
            if b & 8:
                state = "H"
            i -= 1
    q_idx.reverse()
    t_idx.reverse()
    return np.array(q_idx, dtype=np.int32), np.array(t_idx, dtype=np.int32)


def _bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def sw_traceback_batch(
    S_list: List[np.ndarray], go: int, ge: int, batch_size: int = 64,
) -> List[Tuple[np.ndarray, np.ndarray, float]]:
    """Batched device traceback over many integer score windows.

    Returns [(q_idx, t_idx, score), ...] in order, identical to
    sw_traceback_ref's (q_arr, t_arr, score) on each window.  Windows
    are bucketed to square pow2 shapes (bounded compile count, the
    shape-class invariant) and all batches dispatch before any decode.
    """
    out: List = [None] * len(S_list)
    buckets = {}
    for k, S in enumerate(S_list):
        L1, L2 = S.shape
        if L1 == 0 or L2 == 0:
            out[k] = (np.zeros(0, np.int32), np.zeros(0, np.int32), 0.0)
            continue
        buckets.setdefault(_bucket(max(L1, L2)), []).append(k)

    inflight = []
    for Lb, idxs in sorted(buckets.items()):
        bsz = max(1, min(batch_size, (64 << 20) // (Lb * Lb * 2)))
        for s0 in range(0, len(idxs), bsz):
            chunk = idxs[s0 : s0 + bsz]
            B = bsz if len(idxs) > bsz else min(
                bsz, max(4, 1 << (len(chunk) - 1).bit_length())
            )
            Sp = np.full((B, Lb, Lb), PAD_SCORE, dtype=np.int16)
            l1 = np.ones(B, dtype=np.int32)
            l2 = np.ones(B, dtype=np.int32)
            for row, k in enumerate(chunk):
                a, b = S_list[k].shape
                Sk = S_list[k]
                assert int(Sk.max(initial=0)) < -PAD_SCORE and \
                    int(Sk.min(initial=0)) > PAD_SCORE, "score exceeds int16"
                Sp[row, :a, :b] = Sk
                l1[row], l2[row] = a, b
            res = sw_forward_bits(
                jnp.asarray(Sp), jnp.asarray(l1), jnp.asarray(l2),
                int(go), int(ge),
            )
            inflight.append((chunk, res))
    for chunk, (bits, bi, bj, score) in inflight:
        bits = np.asarray(bits)
        bi, bj, score = np.asarray(bi), np.asarray(bj), np.asarray(score)
        for row, k in enumerate(chunk):
            q_arr, t_arr = decode_sw_path(bits[row], int(bi[row]), int(bj[row]))
            out[k] = (q_arr, t_arr, float(score[row]))
    return out
