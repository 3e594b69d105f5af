"""Batched Smith-Waterman on TPU — prefix-scan formulation.

The affine-gap local-alignment recurrence has a serial dependency along
each DP row (E[i][j] depends on E[i][j-1]).  We break it with the classic
scan reformulation: compute the row first without E,

    H0[j] = max(0, H[i-1][j-1] + s(i,j), F[i][j]),

then resolve all query-gap extensions at once with a prefix max

    E[j] = max_{k<j} (H0[k] + k*ge) - go - (j-1)*ge,
    H[j] = max(H0[j], E[j]).

Using H0 (instead of the final H) as gap origin is exact whenever
go >= ge: a gap opened from an E-derived cell is always dominated by
extending the earlier gap directly.  The prefix max is a Kogge-Stone scan
(log2(Lt) shift+max steps) on the VPU, vectorized over a batch of pairs
in the sublane dimension — the whole DP runs as dense (BT, Lt) vector
ops with zero scalar loops.

Scoring runs on the MXU inside the same kernel: per-pair target score
profiles are built once via one-hot matmuls against the 3Di and AA
substitution matrices (factorized — two K=21 matmuls instead of one
K=441 joint matmul), then each query row block gathers its scores with
one (RB, 2*21) x (2*21, Lt) matmul.  Substitution scores never touch HBM.

Two interchangeable backends:
  * `sw_forward_xla`   — pure jax.lax implementation of the same math
                         (runs on CPU/GPU/TPU; reference + fallback)
  * `sw_forward_pallas`— the Pallas TPU kernel (speed-of-light path)

Both return (best, qend, tend) per pair; start positions come from a
second pass on reversed sequences (see align/engine.py).

Replaces the gapped-alignment stage of `foldseek cluster/search`
(contract: cluster.rs:43-55, search.rs:44-53).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
NA = 21  # alphabet size (20 + X) for both AA and 3Di channels


# ---------------------------------------------------------------------------
# XLA (lax) backend — same recurrence, jit-friendly, any device
# ---------------------------------------------------------------------------

def _prefix_max(t: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix max along the last axis, log-step shifts."""
    L = t.shape[-1]
    d = 1
    while d < L:
        shifted = jnp.pad(t[..., :-d], [(0, 0)] * (t.ndim - 1) + [(d, 0)], constant_values=NEG)
        t = jnp.maximum(t, shifted)
        d *= 2
    return t


@functools.partial(jax.jit, static_argnames=("go", "ge"))
def sw_forward_xla(
    scores: jnp.ndarray,  # (B, Lq, Lt) float32, padded cells already ~NEG
    go: float = 10.0,
    ge: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    B, Lq, Lt = scores.shape
    jge = (jnp.arange(Lt, dtype=jnp.float32) * ge)[None, :]  # (1, Lt)

    def row_step(carry, s_row):
        H_prev, F_prev, best, bi, bj, i = carry
        diag = jnp.pad(H_prev[:, :-1], ((0, 0), (1, 0)))
        F = jnp.maximum(H_prev - go, F_prev - ge)
        H0 = jnp.maximum(0.0, jnp.maximum(diag + s_row, F))
        P = _prefix_max(H0 + jge)
        Pexc = jnp.pad(P[:, :-1], ((0, 0), (1, 0)), constant_values=NEG)
        E = Pexc - go + ge - jge
        H = jnp.maximum(H0, E)
        row_max = jnp.max(H, axis=1)
        row_arg = jnp.argmax(H, axis=1).astype(jnp.int32)
        upd = row_max > best
        best = jnp.where(upd, row_max, best)
        bi = jnp.where(upd, i, bi)
        bj = jnp.where(upd, row_arg, bj)
        return (H, F, best, bi, bj, i + 1), None

    init = (
        jnp.zeros((B, Lt), jnp.float32),
        jnp.full((B, Lt), NEG, jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.int32(0),
    )
    (H, F, best, bi, bj, _), _ = jax.lax.scan(row_step, init, jnp.swapaxes(scores, 0, 1))
    return best, bi, bj


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _sw_kernel(
    # scalar prefetch
    qlen_ref, tlen_ref,          # (B,) int32 SMEM
    # inputs
    qa_ref, qs_ref,              # (BT, RB) int32 query codes (row block)
    ta_ref, ts_ref,              # (BT, LT) int32 target codes
    saa_ref, s3d_ref,            # (32, 128) f32 padded substitution matrices
    # outputs
    best_ref, qend_ref, tend_ref,  # (BT, 128)
    # scratch
    h_ref, f_ref,                # (BT, LT) f32 DP state
    prof_ref,                    # (BT, 2*NA-padded=64, LT) f32 target profiles
    sc_ref,                      # (BT, RB, LT) f32 score block
    bb_ref, bi_ref, bj_ref,      # (BT, 128) running best/argmax
    *,
    BT: int, RB: int, LT: int,
    go: float, ge: float, w_aa: float, w_3di: float,
):
    b = pl.program_id(0)
    r = pl.program_id(1)

    col = jax.lax.broadcasted_iota(jnp.int32, (BT, LT), 1)
    jge = col.astype(jnp.float32) * ge

    @pl.when(r == 0)
    def _init():
        h_ref[:] = jnp.zeros((BT, LT), jnp.float32)
        f_ref[:] = jnp.full((BT, LT), NEG, jnp.float32)
        bb_ref[:] = jnp.zeros((BT, 128), jnp.float32)
        bi_ref[:] = jnp.zeros((BT, 128), jnp.int32)
        bj_ref[:] = jnp.zeros((BT, 128), jnp.int32)
        # Per-pair target score profiles, once per pair:
        #   prof[bb, a, j]      = w_aa  * SAA[a, ta[bb, j]]
        #   prof[bb, NA + a, j] = w_3di * S3D[a, ts[bb, j]]
        # zero the full profile scratch first: rows 2*NA..63 are never
        # written below, and uninitialized VMEM would poison the one-hot
        # matmul (0 * garbage / 0 * NaN)
        prof_ref[:] = jnp.zeros_like(prof_ref)
        arow = jax.lax.broadcasted_iota(jnp.int32, (NA, LT), 0)
        saa = saa_ref[:NA, :NA]
        s3d = s3d_ref[:NA, :NA]
        for bb in range(BT):
            oh_a = (ta_ref[bb, :][None, :] == arow).astype(jnp.float32)  # (NA, LT)
            oh_s = (ts_ref[bb, :][None, :] == arow).astype(jnp.float32)
            prof_ref[bb, :NA, :] = jnp.dot(saa, oh_a, preferred_element_type=jnp.float32) * w_aa
            prof_ref[bb, NA : 2 * NA, :] = jnp.dot(s3d, oh_s, preferred_element_type=jnp.float32) * w_3di

    # ---- score block for this (b, r): one small MXU matmul per pair ----
    rowsel = jax.lax.broadcasted_iota(jnp.int32, (RB, 64), 1)
    irow = jax.lax.broadcasted_iota(jnp.int32, (RB, LT), 0) + r * RB
    colr = jax.lax.broadcasted_iota(jnp.int32, (RB, LT), 1)
    for bb in range(BT):
        qa = qa_ref[bb, :][:, None]  # (RB, 1)
        qs = qs_ref[bb, :][:, None]
        oh = ((rowsel == qa) | (rowsel == qs + NA)).astype(jnp.float32)  # (RB, 64)
        blk = jnp.dot(oh, prof_ref[bb, :, :], preferred_element_type=jnp.float32)  # (RB, LT)
        ql = qlen_ref[b * BT + bb]
        tl = tlen_ref[b * BT + bb]
        valid = (irow < ql) & (colr < tl)
        sc_ref[bb, :, :] = jnp.where(valid, blk, NEG)

    # ---- DP rows ----
    def row_body(i_local, _):
        i_global = r * RB + i_local
        H_prev = h_ref[:]
        F_prev = f_ref[:]
        s_row = sc_ref[:, i_local, :]  # (BT, LT)

        diag = jnp.where(col == 0, 0.0, pltpu.roll(H_prev, shift=1, axis=1))
        F = jnp.maximum(H_prev - go, F_prev - ge)
        H0 = jnp.maximum(0.0, jnp.maximum(diag + s_row, F))

        t = H0 + jge
        d = 1
        while d < LT:
            rolled = pltpu.roll(t, shift=d, axis=1)
            t = jnp.maximum(t, jnp.where(col >= d, rolled, NEG))
            d *= 2
        Pexc = jnp.where(col == 0, NEG, pltpu.roll(t, shift=1, axis=1))
        E = Pexc - go + ge - jge
        H = jnp.maximum(H0, E)

        h_ref[:] = H
        f_ref[:] = F

        row_max = jnp.max(H, axis=1, keepdims=True)          # (BT, 1)
        row_arg = jnp.argmax(H, axis=1).astype(jnp.int32)[:, None]
        upd = row_max > bb_ref[:, 0:1]
        bb_ref[:, 0:1] = jnp.where(upd, row_max, bb_ref[:, 0:1])
        bi_ref[:, 0:1] = jnp.where(upd, i_global, bi_ref[:, 0:1])
        bj_ref[:, 0:1] = jnp.where(upd, row_arg, bj_ref[:, 0:1])
        return 0

    jax.lax.fori_loop(0, RB, row_body, 0)

    @pl.when(r == pl.num_programs(1) - 1)
    def _emit():
        best_ref[:] = jnp.broadcast_to(bb_ref[:, 0:1], (BT, 128))
        qend_ref[:] = jnp.broadcast_to(bi_ref[:, 0:1], (BT, 128))
        tend_ref[:] = jnp.broadcast_to(bj_ref[:, 0:1], (BT, 128))


@functools.partial(
    jax.jit,
    static_argnames=("go", "ge", "w_aa", "w_3di", "block_rows", "batch_tile", "interpret"),
)
def sw_forward_pallas(
    qa: jnp.ndarray,    # (B, Lq) int32 AA codes (pad with X)
    qs: jnp.ndarray,    # (B, Lq) int32 3Di codes
    ta: jnp.ndarray,    # (B, Lt) int32
    ts: jnp.ndarray,    # (B, Lt) int32
    qlen: jnp.ndarray,  # (B,) int32
    tlen: jnp.ndarray,  # (B,) int32
    saa: jnp.ndarray,   # (21, 21) f32
    s3d: jnp.ndarray,   # (21, 21) f32
    go: float = 10.0,
    ge: float = 1.0,
    w_aa: float = 1.4,
    w_3di: float = 2.1,
    block_rows: int = 128,
    batch_tile: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    B, Lq = qa.shape
    Lt = ta.shape[1]
    BT, RB = batch_tile, min(block_rows, Lq)
    assert B % BT == 0 and Lq % RB == 0 and Lt % 128 == 0

    saa_p = jnp.zeros((32, 128), jnp.float32).at[:NA, :NA].set(saa.astype(jnp.float32))
    s3d_p = jnp.zeros((32, 128), jnp.float32).at[:NA, :NA].set(s3d.astype(jnp.float32))

    kernel = functools.partial(
        _sw_kernel,
        BT=BT, RB=RB, LT=Lt,
        go=float(go), ge=float(ge), w_aa=float(w_aa), w_3di=float(w_3di),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // BT, Lq // RB),
        in_specs=[
            pl.BlockSpec((BT, RB), lambda b, r, *_: (b, r)),
            pl.BlockSpec((BT, RB), lambda b, r, *_: (b, r)),
            pl.BlockSpec((BT, Lt), lambda b, r, *_: (b, 0)),
            pl.BlockSpec((BT, Lt), lambda b, r, *_: (b, 0)),
            pl.BlockSpec((32, 128), lambda b, r, *_: (0, 0)),
            pl.BlockSpec((32, 128), lambda b, r, *_: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((BT, 128), lambda b, r, *_: (b, 0)),
            pl.BlockSpec((BT, 128), lambda b, r, *_: (b, 0)),
            pl.BlockSpec((BT, 128), lambda b, r, *_: (b, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((BT, Lt), jnp.float32),
            pltpu.VMEM((BT, Lt), jnp.float32),
            pltpu.VMEM((BT, 64, Lt), jnp.float32),
            pltpu.VMEM((BT, RB, Lt), jnp.float32),
            pltpu.VMEM((BT, 128), jnp.float32),
            pltpu.VMEM((BT, 128), jnp.int32),
            pltpu.VMEM((BT, 128), jnp.int32),
        ],
    )

    best, qend, tend = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(B) * Lq * Lt * 40,
            bytes_accessed=int(B) * (Lq + Lt) * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qlen, tlen, qa, qs, ta, ts, saa_p, s3d_p)

    return best[:, 0], qend[:, 0], tend[:, 0]


# ---------------------------------------------------------------------------
# Host-side helper: masked combined score tensor for the XLA backend
# ---------------------------------------------------------------------------

def build_scores(
    qa: np.ndarray, qs: np.ndarray, ta: np.ndarray, ts: np.ndarray,
    qlen: np.ndarray, tlen: np.ndarray,
    saa: np.ndarray, s3d: np.ndarray,
    w_aa: float = 1.4, w_3di: float = 2.1,
) -> np.ndarray:
    s = w_aa * saa[qa[:, :, None], ta[:, None, :]] + w_3di * s3d[qs[:, :, None], ts[:, None, :]]
    B, Lq, Lt = s.shape
    qm = np.arange(Lq)[None, :] < qlen[:, None]
    tm = np.arange(Lt)[None, :] < tlen[:, None]
    mask = qm[:, :, None] & tm[:, None, :]
    return np.where(mask, s, NEG).astype(np.float32)
