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
substitution matrices, then each query row block gathers its scores with
one (RB, 64) x (64, Lt) matmul.  Substitution scores never touch HBM.

**Integer scoring units**: the default convention maps Foldseek's
combined weighting (the weighted MEAN 0.4*aa + 0.6*3di, gap 10/1) to
small integers scaled x10 (w_aa=4, w_3di=6, go=100, ge=10 — see the
default-units note above W_AA_INT; the 28/3 sum-mapping of rounds 1-3
was falsified round 4).  Every combined cell score stays within +-256 —
exactly representable in bf16 — so the MXU one-hot matmuls, the bf16
score scratch, and the f32 DP are all bit-exact.  E-value lambdas are
fitted to the scaled matrix (align/stats.py), so statistics stay
consistent.

Ties resolve row-major (lowest (i, j) wins), matching the NumPy golden
model, via a min-key reduction over (row * Lt + col) at emit time.

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
_PROBE_FOLD = False  # scripts/probe_fold.py perf probe (INEXACT when True)

# Default integer scoring units: Foldseek's combined structural score is
# the weighted MEAN (1.4*aa + 2.1*3di) / 3.5 = 0.4*aa + 0.6*3di, scored
# with gap open 10 / extend 1 in that mean scale.  Internally everything
# is scaled x10 to small integers: weights 4 : 6 (exact 2:3 = 1.4:2.1)
# and gaps 100 / 10.  The x10 scale matters: the pre-round-4 mapping
# (28/3, a x2.857 scale that treated the combined score as a SUM) made
# gap moves ~3.5x too cheap relative to the trained mat3di's dynamic
# range, putting gapped chance scores in the LINEAR phase (random
# background pairs scored ~4.5 per cell and E-values were meaningless).
# Measured null medians at L=256 under the implied 3Di background:
# ungapped 171, gapped(100/10) ~171 (log phase), gapped(28/3) 1108.
# Small integers keep every cell score below 128, so the score block
# stores exactly in bf16 (half the VMEM of f32), which doubles the
# usable batch tile.
W_AA_INT = 4.0
W_3DI_INT = 6.0
GAP_OPEN_INT = 100.0
GAP_EXTEND_INT = 10.0


# ---------------------------------------------------------------------------
# XLA (lax) backend — same recurrence, jit-friendly, any device
# ---------------------------------------------------------------------------

def _prefix_max(t: jnp.ndarray, window: int = 0) -> jnp.ndarray:
    """Inclusive prefix max along the last axis, log-step shifts.

    `window > 0` caps the lookback to the window (the XLA counterpart of
    the Pallas kernel's gap_window: both backends then compute the SAME
    windowed-gap algorithm, keeping TPU/CPU outputs byte-identical)."""
    L = t.shape[-1]
    limit = L if not window else min(L, window)
    d = 1
    while d < limit:
        shifted = jnp.pad(t[..., :-d], [(0, 0)] * (t.ndim - 1) + [(d, 0)], constant_values=NEG)
        t = jnp.maximum(t, shifted)
        d *= 2
    return t


@functools.partial(jax.jit, static_argnames=("go", "ge", "gap_window"))
def sw_forward_xla(
    scores: jnp.ndarray,  # (B, Lq, Lt) float32, padded cells already ~NEG
    go: float = GAP_OPEN_INT,
    ge: float = GAP_EXTEND_INT,
    gap_window: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    B, Lq, Lt = scores.shape
    jge = (jnp.arange(Lt, dtype=jnp.float32) * ge)[None, :]  # (1, Lt)

    def row_step(carry, s_row):
        H_prev, F_prev, best, bi, bj, i = carry
        diag = jnp.pad(H_prev[:, :-1], ((0, 0), (1, 0)))
        F = jnp.maximum(H_prev - go, F_prev - ge)
        H0 = jnp.maximum(0.0, jnp.maximum(diag + s_row, F))
        P = _prefix_max(H0 + jge, window=gap_window)
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


@jax.jit
def ungapped_forward_xla(
    scores: jnp.ndarray,  # (B, Lq, Lt) float32, padded cells already ~NEG
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Max ungapped diagonal segment score (foldseek rescore-stage analog).

    Each diagonal is an independent maximal-segment (Kadane) chain:
    H[i][j] = max(0, H[i-1][j-1] + s[i][j]).  One vector op per row —
    roughly an order of magnitude cheaper than gapped SW."""
    B, Lq, Lt = scores.shape

    def row_step(carry, s_row):
        H_prev, best, bi, bj, i = carry
        diag = jnp.pad(H_prev[:, :-1], ((0, 0), (1, 0)))
        H = jnp.maximum(0.0, diag + s_row)
        row_max = jnp.max(H, axis=1)
        row_arg = jnp.argmax(H, axis=1).astype(jnp.int32)
        upd = row_max > best
        best = jnp.where(upd, row_max, best)
        bi = jnp.where(upd, i, bi)
        bj = jnp.where(upd, row_arg, bj)
        return (H, best, bi, bj, i + 1), None

    init = (
        jnp.zeros((B, Lt), jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.int32(0),
    )
    (_, best, bi, bj, _), _ = jax.lax.scan(row_step, init, jnp.swapaxes(scores, 0, 1))
    return best, bi, bj


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _sw_kernel(
    # scalar prefetch
    qlen_ref, tlen_ref,          # (B,) int32 SMEM (B = Brows * SEG pairs)
    # inputs
    qa_ref, qs_ref,              # (BT, SEG, RB) int32 query codes (row block)
    ta_ref, ts_ref,              # (BT, LT) int32 packed target codes
    # [qc_ref]                   # (BT, SEG, RB) int32 per-query-row score
    #                            # correction, present iff use_bias
    # saa_ref, s3d_ref           # (32, 128) f32 substitution matrices
    # outputs
    # best_ref, qend_ref, tend_ref  # (BT, 128); column s = segment s's pair
    # scratch
    # h_ref, f_ref               # (BT, LT) f32 DP state
    # sc_ref                     # (BT, RB, LT) bf16 score block (small
    #                            # integer scores are bf16-exact)
    # bb_ref                     # (BT, LT) f32 running per-column best
    # br_ref                     # (BT, LT) i32 row index of column best
    *rest,
    BT: int, RB: int, LT: int, SEG: int,
    go: float, ge: float, w_aa: float, w_3di: float,
    gap_window: int = 0,
    chains: int = 1,
    dp_dtype=jnp.float32,
    ungapped: bool = False,
    unroll: int = 8,
    score_rows: int = 0,
    use_bias: bool = False,
):
    """Segment-packed SW: each lane row carries SEG independent pairs in
    LT/SEG-lane segments.  All per-row vector work (shifts, scan, best
    tracking) is shared across the SEG pairs, and the Kogge-Stone scan
    only needs log2(LT/SEG) steps — a ~SEG-fold throughput win for short
    buckets.  SEG == 1 recovers the plain kernel."""
    if use_bias:
        qc_ref = rest[0]
        rest = rest[1:]
    else:
        qc_ref = None
    (saa_ref, s3d_ref, best_ref, qend_ref, tend_ref,
     h_ref, f_ref, sc_ref, bb_ref, br_ref) = rest
    b = pl.program_id(0)
    r = pl.program_id(1)
    SEG_L = LT // SEG
    CB = BT // chains  # sublane rows per independent DP chain

    # int16 DP: 16-bit types tile natively at (16, 128) — half the vregs
    # per vector op, ~2x elementwise throughput.  All scores are small
    # integers; H is clamped at H_CAP per row so no intermediate can wrap
    # (worst case H_CAP + max_cell_score + Lt*ge < 32767).
    int_dp = dp_dtype == jnp.int16
    NEGv = -20000 if int_dp else NEG
    H_CAP = 30000
    # Safety coupling: masked (PAD-code) cells carry the adaptive pad
    # sentinel -sent from the score matmul, with sent >= 20480 asserted
    # host-side in sw_forward_pallas, so a diagonal extension INTO a
    # masked cell scores at most H_CAP - 20480 < 10000.  The true best
    # of any pair that reaches H > sent is itself > sent, so ghost
    # values can never win the per-column max — but ONLY while
    # H_CAP - sent < sent.  The host assert guarantees that for the
    # actual sentinel; the conservative 20000 bound is re-checked here
    # (20000 <= sent always holds, so H_CAP - sent <= H_CAP - 20000).
    if int_dp:
        assert H_CAP - 20000 < 20000, (H_CAP, NEGv)

    col = jax.lax.broadcasted_iota(jnp.int32, (CB, LT), 1)
    col_local = col & (SEG_L - 1)          # SEG_L is a power of two
    jge = (col_local * int(ge)).astype(dp_dtype) if int_dp else col_local.astype(jnp.float32) * ge
    # E = Pexc - go + ge - jge folds to one subtract with this hoisted
    # per-column constant (2 fewer vector ops per DP row)
    jge_go = jge + (jnp.int16(int(go) - int(ge)) if int_dp else (go - ge))
    # scan depth: full segment, or the (exact for gaps < window) cap
    scan_limit = SEG_L if not gap_window else min(SEG_L, gap_window)
    scan_masks = []
    d = 1
    while d < scan_limit:
        scan_masks.append(col_local >= d)
        d *= 2
    m0 = col_local == 0

    ridx_dtype = jnp.int16 if int_dp else jnp.int32

    @pl.when(r == 0)
    def _init():
        h_ref[:] = jnp.zeros((BT, LT), dp_dtype)
        f_ref[:] = jnp.full((BT, LT), NEGv, dp_dtype)
        bb_ref[:] = jnp.zeros((BT, LT), dp_dtype)
        br_ref[:] = jnp.zeros((BT, LT), ridx_dtype)

    # ---- score sub-blocks for this (b, r) ----
    # Per-pair target profiles are rebuilt per row-block (cheap MXU work)
    # instead of persisting in VMEM — the freed memory buys a larger BT,
    # which shortens the serial DP chain per cell.  `score_rows` (SR)
    # further sub-blocks the score scratch below the 128-row grid block:
    # scores for SR rows are built, their DP rows run, then the next SR
    # rows overwrite the same scratch — the scratch shrinks RB/SR-fold,
    # buying a second doubling of BT (VMEM budget: sc = BT*SR*LT*2B).
    SR = score_rows or RB
    nsub = RB // SR
    rowsel = jax.lax.broadcasted_iota(jnp.int32, (SR, SEG * 64), 1)
    # Sentinel-by-PAD-code: the host remaps every beyond-length position
    # of all four code arrays to PAD (= NA); the substitution matrices
    # carry a pad row/column of -2048 per channel, so any cell touching a
    # pad position scores -2048*(w_aa + w_3di) <= -20000 straight out of
    # the MXU matmul.  The old per-pair validity mask (5 vector ops on
    # (SR, LT) per pair per block: ~15% of total VPU work) disappears.
    NA2 = NA + 1  # 22: letters + X + PAD
    arow = jax.lax.broadcasted_iota(jnp.int32, (NA2, LT), 0)
    acol = jax.lax.broadcasted_iota(jnp.int32, (NA2, LT), 1)
    saa = saa_ref[:NA2, :NA2]
    s3d = s3d_ref[:NA2, :NA2]

    def build_scores_sub(sub: int):
        for bb in range(BT):
            ta_row = ta_ref[bb, :][None, :]
            ts_row = ts_ref[bb, :][None, :]
            oh = jnp.zeros((SR, SEG * 64), jnp.bool_)
            profs = []
            bias_cols = jnp.zeros((SR, SEG * 64), jnp.bfloat16) if use_bias else None
            for s in range(SEG):
                segm = (acol // SEG_L) == s
                oh_a = ((ta_row == arow) & segm).astype(jnp.bfloat16)
                oh_s = ((ts_row == arow) & segm).astype(jnp.bfloat16)
                # integer-valued entries (< 256, plus the pad -2048 =
                # -16*128) -> exact in bf16
                pa = jnp.dot(saa, oh_a.astype(jnp.float32), preferred_element_type=jnp.float32) * w_aa
                ps = jnp.dot(s3d, oh_s.astype(jnp.float32), preferred_element_type=jnp.float32) * w_3di
                # composition-bias rides the same MXU matmul (use_bias):
                # the spare row 31 of segment s's AA channel block holds
                # 1.0 on the segment's columns; the matching one-hot
                # column carries the per-query-row correction value (an
                # integer <= 255, bf16-exact), so score row i of pair
                # (bb, s) gets +qc[i] at zero DP-path cost.
                profs.append(pa.astype(jnp.bfloat16))
                profs.append(ps.astype(jnp.bfloat16))
                # static SR-row sublane slice of the block's query codes
                # (sub is a Python int; offsets stay 8-aligned for Mosaic)
                qa = qa_ref[bb, s, :][:, None][sub * SR : (sub + 1) * SR]
                qs = qs_ref[bb, s, :][:, None][sub * SR : (sub + 1) * SR]
                # channel blocks are padded to 32 rows each: AA at s*64, 3Di at s*64+32
                oh = oh | (rowsel == qa + s * 64) | (rowsel == qs + s * 64 + 32)
                if use_bias:
                    cv = qc_ref[bb, s, :][:, None][sub * SR : (sub + 1) * SR]
                    bias_cols = bias_cols + jnp.where(
                        rowsel == s * 64 + 31, cv, 0
                    ).astype(jnp.bfloat16)
            # pad each (NA2, LT) channel block to 32 rows -> (SEG*64, LT);
            # with bias, row 31 of each AA block is the segment-mask unit
            # row that broadcasts the per-row correction across the band
            if use_bias:
                prof_parts = []
                for s in range(SEG):
                    segm_row = ((acol[0:1] // SEG_L) == s).astype(jnp.bfloat16)
                    prof_parts.append(jnp.concatenate(
                        [profs[2 * s],
                         jnp.zeros((32 - NA2 - 1, LT), jnp.bfloat16),
                         segm_row], axis=0))
                    prof_parts.append(jnp.pad(profs[2 * s + 1], ((0, 32 - NA2), (0, 0))))
                prof = jnp.concatenate(prof_parts, axis=0)
                ohf = oh.astype(jnp.bfloat16) + bias_cols
            else:
                prof = jnp.concatenate(
                    [jnp.pad(pp, ((0, 32 - NA2), (0, 0))) for pp in profs], axis=0
                )
                ohf = oh.astype(jnp.bfloat16)
            blk = jnp.dot(ohf, prof, preferred_element_type=jnp.float32)
            sc_ref[bb, :, :] = blk.astype(sc_ref.dtype)

    # ---- DP rows ----
    # The row recurrence is serial, so the loop is latency-bound: Mosaic's
    # per-iteration fori_loop overhead rivals the vector work.  Hand-unroll
    # UNROLL rows per loop iteration (values flow in registers between the
    # unrolled rows; h/f stores happen once per iteration).  The score rows
    # for the iteration are fetched as ONE aligned (BT, UNROLL, LT) block —
    # newer Mosaic rejects dynamic single-row indexes into the sublane dim
    # (must be provably 8-aligned), and the block load is faster anyway.
    UNROLL = unroll
    assert SR % UNROLL == 0

    if int_dp:
        goc, gec = jnp.int16(int(go)), jnp.int16(int(ge))
        zero, negc = jnp.int16(0), jnp.int16(NEGv)
        capc = jnp.int16(H_CAP)
    else:
        goc, gec = go, ge
        zero, negc, capc = 0.0, NEG, None

    def one_row(i_global, H_prev, F_prev, s_row, BBv, BRv):
        if _PROBE_FOLD:  # perf ceiling probe only — NOT exact
            diag = pltpu.roll(H_prev, shift=1, axis=1)
        else:
            diag = jnp.where(m0, zero, pltpu.roll(H_prev, shift=1, axis=1))
        if ungapped:
            # ungapped diagonal rescore: every diagonal is an independent
            # maximal-segment chain — no gap states at all (the TPU analog
            # of foldseek's ungapped rescore stage between the k-mer match
            # and gapped SW, cluster.rs:43-55 pipeline contract)
            H = jnp.maximum(zero, diag + s_row)
            upd = H > BBv
            BBv = jnp.where(upd, H, BBv)
            BRv = jnp.where(upd, i_global.astype(ridx_dtype), BRv)
            return H, F_prev, BBv, BRv
        F = jnp.maximum(H_prev - goc, F_prev - gec)
        H0 = jnp.maximum(zero, jnp.maximum(diag + s_row, F))
        t = H0 + jge
        d = 1
        k = 0
        while d < scan_limit:
            rolled = pltpu.roll(t, shift=d, axis=1)
            t = jnp.maximum(t, jnp.where(scan_masks[k], rolled, negc))
            d *= 2
            k += 1
        if _PROBE_FOLD:  # perf ceiling probe only — NOT exact
            Pexc = pltpu.roll(t, shift=1, axis=1)
        else:
            Pexc = jnp.where(m0, negc, pltpu.roll(t, shift=1, axis=1))
        E = Pexc - jge_go
        H = jnp.maximum(H0, E)
        if int_dp:
            # cap so no later intermediate (H + s + Lt*ge) can wrap int16
            H = jnp.minimum(H, capc)
        # elementwise per-column best tracking (strict > keeps the
        # earliest row, giving row-major tie-breaking)
        upd = H > BBv
        BBv = jnp.where(upd, H, BBv)
        BRv = jnp.where(upd, i_global.astype(ridx_dtype), BRv)
        return H, F, BBv, BRv

    def make_row_body(sub: int):
        def row_body(iu, _):
            # `chains` independent DP streams (disjoint sublane halves of
            # the batch tile) are advanced in lockstep: the scheduler can
            # overlap one chain's dependent-op latency with the other's
            # issue slots.
            i0 = pl.multiple_of(iu * UNROLL, UNROLL)
            s_blk = sc_ref[:, pl.ds(i0, UNROLL), :].astype(dp_dtype)
            st = []
            for c in range(chains):
                sl = pl.ds(c * CB, CB)
                st.append((h_ref[sl], f_ref[sl], bb_ref[sl], br_ref[sl]))
            for u in range(UNROLL):
                nxt = []
                for c, (H, F, BBv, BRv) in enumerate(st):
                    s_row = s_blk[c * CB : (c + 1) * CB, u, :]  # (CB, LT)
                    nxt.append(one_row(r * RB + sub * SR + i0 + u, H, F, s_row, BBv, BRv))
                st = nxt
            for c, (H, F, BBv, BRv) in enumerate(st):
                sl = pl.ds(c * CB, CB)
                h_ref[sl] = H
                f_ref[sl] = F
                bb_ref[sl] = BBv
                br_ref[sl] = BRv
            return 0
        return row_body

    for sub in range(nsub):
        build_scores_sub(sub)
        jax.lax.fori_loop(0, SR // UNROLL, make_row_body(sub), 0)

    @pl.when(r == pl.num_programs(1) - 1)
    def _emit():
        col128 = jax.lax.broadcasted_iota(jnp.int32, (BT, 128), 1)
        out_b = jnp.zeros((BT, 128), jnp.float32)
        out_q = jnp.zeros((BT, 128), jnp.int32)
        out_t = jnp.zeros((BT, 128), jnp.int32)
        coll = jax.lax.broadcasted_iota(jnp.int32, (BT, SEG_L), 1)
        for s in range(SEG):
            BB = bb_ref[:, s * SEG_L : (s + 1) * SEG_L].astype(jnp.float32)
            ROW = br_ref[:, s * SEG_L : (s + 1) * SEG_L].astype(jnp.int32)
            best = jnp.max(BB, axis=1, keepdims=True)  # (BT, 1)
            # among max-valued cells pick min (row, col): row-major ties
            key = ROW * SEG_L + coll
            cand = BB >= best
            minkey = jnp.min(
                jnp.where(cand, key, jnp.int32(2**30)), axis=1, keepdims=True
            )
            qe = minkey // SEG_L
            te = minkey - qe * SEG_L
            sel = col128 == s
            out_b = jnp.where(sel, best, out_b)
            out_q = jnp.where(sel, qe, out_q)
            out_t = jnp.where(sel, te, out_t)
        best_ref[:] = out_b
        qend_ref[:] = out_q
        tend_ref[:] = out_t


def _pick_segments(Lt: int) -> int:
    if Lt <= 128:
        return 4
    if Lt <= 256:
        return 2
    return 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "go", "ge", "w_aa", "w_3di", "block_rows", "batch_tile", "interpret", "segments", "score_dtype", "gap_window", "chains", "dp_dtype", "ungapped", "unroll", "score_rows",
    ),
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
    go: float = GAP_OPEN_INT,
    ge: float = GAP_EXTEND_INT,
    w_aa: float = W_AA_INT,
    w_3di: float = W_3DI_INT,
    block_rows: int = 128,
    batch_tile: int = 0,  # 0 = auto (largest tile fitting VMEM)
    interpret: bool = False,
    segments: int = 0,
    score_dtype: str = "bf16",  # "bf16" | "f32" (escape hatch for Mosaic
                                # lowering regressions on 16-bit scratch)
    gap_window: int = 0,  # >0 caps query-gap length to the window; exact
                          # whenever the optimal alignment has no gap
                          # >= window (with ge=10, a 64-gap costs 730 --
                          # rarely optimal for real proteins)  # 0 = auto (pack 2-4 short pairs per lane row)
    chains: int = 1,  # independent interleaved DP chains per tile (sublane
                      # split; results are identical for any value)
    dp_dtype: str = "f32",  # "f32" | "i16": int16 DP state halves the vregs
                            # per vector op (native (16,128) tiling).  Exact
                            # for integer scoring units: H is capped at
                            # 30000, above any real protein pair's score in
                            # the default units (>=230 identical residues at
                            # max per-residue score; see BENCH_NOTES.md).
    ungapped: bool = False,  # diagonal-only maximal segment score (no gap
                             # states): the rescore stage between the k-mer
                             # prefilter and gapped SW
    unroll: int = 8,  # DP rows per fori_loop iteration (loop-overhead
                      # amortization; must divide block_rows)
    score_rows: int = 0,  # score-scratch rows (SR): scores are built and
                          # consumed SR rows at a time, shrinking the
                          # dominant VMEM scratch RB/SR-fold so the batch
                          # tile can grow past 64.  0 = RB (legacy).
    qc: jnp.ndarray = None,  # (B, Lq) int32 per-query-position score
                             # correction (composition bias, |qc| <= 255),
                             # added to every cell of the row.  None = off
                             # (identical lowering to the tuned config).
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    B, Lq = qa.shape
    Lt = ta.shape[1]
    SEG = segments or _pick_segments(Lt)
    rb_eff = Lq if Lq <= block_rows else block_rows
    SR = score_rows or rb_eff
    if SR > rb_eff:
        SR = rb_eff
    if batch_tile:
        BT = batch_tile
    else:
        # score scratch (BT, SR, SEG*Lt) is the VMEM driver; keep it
        # within ~8 MB so DP state + double-buffered inputs still fit
        sc_bytes = 2 if score_dtype == "bf16" else 4
        # cap at 64 when SR == RB (legacy config); sub-blocked scores
        # (SR < RB) shrink the scratch and raise the cap (tuned on-chip,
        # BENCH_NOTES round 3)
        cap = 64 if SR == rb_eff else 128
        BT = max(8, min(cap, (12 * 1024 * 1024 // (SR * SEG * Lt * sc_bytes)) // 8 * 8))
    # pad the pair count so it reshapes into (Brows, SEG) packed rows
    pad_to = BT * SEG
    Bp = ((B + pad_to - 1) // pad_to) * pad_to
    if Bp != B:
        padn = Bp - B
        qa = jnp.concatenate([qa, jnp.full((padn, Lq), 20, qa.dtype)])
        qs = jnp.concatenate([qs, jnp.full((padn, Lq), 20, qs.dtype)])
        ta = jnp.concatenate([ta, jnp.full((padn, Lt), 20, ta.dtype)])
        ts = jnp.concatenate([ts, jnp.full((padn, Lt), 20, ts.dtype)])
        qlen = jnp.concatenate([qlen, jnp.ones((padn,), qlen.dtype)])
        tlen = jnp.concatenate([tlen, jnp.ones((padn,), tlen.dtype)])
        if qc is not None:
            qc = jnp.concatenate([qc, jnp.zeros((padn, Lq), qc.dtype)])

    Brows = Bp // SEG
    LTK = Lt * SEG  # packed lane width

    # remap every beyond-length position to PAD = NA (kernel contract:
    # pad rows/cols of the padded substitution matrices score the masked
    # -2048-per-channel sentinel straight from the MXU)
    PAD = NA
    colq = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    colt = jnp.arange(Lt, dtype=jnp.int32)[None, :]
    qmask = colq < qlen[:, None]
    tmask = colt < tlen[:, None]
    qa = jnp.where(qmask, qa, PAD)
    qs = jnp.where(qmask, qs, PAD)
    ta = jnp.where(tmask, ta, PAD)
    ts = jnp.where(tmask, ts, PAD)

    # pack: pair p -> (row p // SEG, segment p % SEG)
    qa_p = qa.reshape(Brows, SEG, Lq)
    qs_p = qs.reshape(Brows, SEG, Lq)
    ta_p = ta.reshape(Brows, SEG * Lt)
    ts_p = ts.reshape(Brows, SEG * Lt)
    use_bias = qc is not None
    if use_bias:
        # zero correction on pad rows (masked cells stay sentinel-bound)
        qc_p = jnp.where(qmask, qc, 0).astype(jnp.int32).reshape(Brows, SEG, Lq)

    # Mosaic requires the trailing block dim to be a multiple of 128 or
    # equal to the full array dim
    RB = Lq if Lq <= block_rows else block_rows
    assert Brows % BT == 0 and Lq % RB == 0 and Lt % 128 == 0
    assert RB == Lq or RB % 128 == 0

    # Matrices carry a PAD row/column (code NA = 21) of -pad_v per
    # channel: any cell touching a pad position scores
    # -pad_v*(w_aa + w_3di) — the masked-cell sentinel — directly from
    # the score matmul (no validity mask in the kernel).  pad_v adapts
    # to the weights so arbitrary weight conventions keep working (the
    # default 4/6 units give the canonical -2048 -> -20480).  pad_v must
    # be bf16-exact (<= 8 significant bits), so round up to the smallest
    # power-of-two granularity that guarantees exactness at pad_v's own
    # magnitude — NOT a fixed 128 multiple, which overshoots past int16
    # range for large weight sums (w_aa + w_3di ~ 130 pushed the old
    # rounding past 32000).  The overshoot of this rounding is <= 1/128
    # of pad_v, so sent always lands in [20480, ~21000 + wsum) — above
    # the cap-coupling bound H_CAP - |s| < |s| and inside int16 for the
    # i16 DP path.
    wsum = float(w_aa) + float(w_3di)
    pad_v0 = int(np.ceil(20480.0 / wsum))
    gran = 1 << max(0, pad_v0.bit_length() - 8)  # bf16-exact granularity
    pad_v = -(-pad_v0 // gran) * gran
    sent = pad_v * wsum
    assert 20000.0 <= sent < 32000.0 and 30000 - sent < sent, (w_aa, w_3di, sent)
    saa_p = jnp.zeros((32, 128), jnp.float32).at[:NA, :NA].set(saa.astype(jnp.float32))
    saa_p = saa_p.at[PAD, : NA + 1].set(-float(pad_v)).at[: NA + 1, PAD].set(-float(pad_v))
    s3d_p = jnp.zeros((32, 128), jnp.float32).at[:NA, :NA].set(s3d.astype(jnp.float32))
    s3d_p = s3d_p.at[PAD, : NA + 1].set(-float(pad_v)).at[: NA + 1, PAD].set(-float(pad_v))


    assert BT % chains == 0 and (BT // chains) % 8 == 0, (BT, chains)
    if dp_dtype == "i16":
        assert float(go) == int(go) and float(ge) == int(ge), (go, ge)
        # the per-cell scores fed to the int16 DP must themselves be
        # integers or astype(int16) silently truncates: weights integral
        # (the substitution matrices are integer-valued by contract —
        # checked host-side in align/engine.py)
        assert float(w_aa) == int(w_aa) and float(w_3di) == int(w_3di), (w_aa, w_3di)
        # no intermediate may wrap: t = H (<= cap 30000) + jge (<= SEG_L*ge)
        # plus one cell score (< 150) must stay below 32767
        assert Lt * ge + 30000 + 150 < 32767, (Lt, ge)
        # the best-row scratch is int16 too: global row indices must fit
        assert Lq < 32768, ("i16 row-index scratch wraps at Lq >= 32768", Lq)
        # int16 native tile is (16, 128): each chain's sublane slice must
        # stay 16-aligned or Mosaic falls off the fast layout
        assert (BT // chains) % 16 == 0, (BT, chains)
        dp_jdt, ridx_jdt = jnp.int16, jnp.int16
    else:
        dp_jdt, ridx_jdt = jnp.float32, jnp.int32
    assert RB % SR == 0 and SR % 8 == 0, (RB, SR)
    kernel = functools.partial(
        _sw_kernel,
        BT=BT, RB=RB, LT=LTK, SEG=SEG,
        go=float(go), ge=float(ge), w_aa=float(w_aa), w_3di=float(w_3di),
        gap_window=gap_window, chains=chains, dp_dtype=dp_jdt,
        ungapped=ungapped, unroll=unroll, score_rows=SR,
        use_bias=use_bias,
    )

    qspec = pl.BlockSpec((BT, SEG, RB), lambda b, r, *_: (b, 0, r))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Brows // BT, Lq // RB),
        in_specs=[
            qspec,
            pl.BlockSpec((BT, SEG, RB), lambda b, r, *_: (b, 0, r)),
            pl.BlockSpec((BT, LTK), lambda b, r, *_: (b, 0)),
            pl.BlockSpec((BT, LTK), lambda b, r, *_: (b, 0)),
        ] + ([qspec] if use_bias else []) + [
            pl.BlockSpec((32, 128), lambda b, r, *_: (0, 0)),
            pl.BlockSpec((32, 128), lambda b, r, *_: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((BT, 128), lambda b, r, *_: (b, 0)),
            pl.BlockSpec((BT, 128), lambda b, r, *_: (b, 0)),
            pl.BlockSpec((BT, 128), lambda b, r, *_: (b, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((BT, LTK), dp_jdt),
            pltpu.VMEM((BT, LTK), dp_jdt),
            pltpu.VMEM((BT, SR, LTK), jnp.bfloat16 if score_dtype == "bf16" else jnp.float32),
            pltpu.VMEM((BT, LTK), dp_jdt),
            pltpu.VMEM((BT, LTK), ridx_jdt),
        ],
    )

    best, qend, tend = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Brows, 128), jnp.float32),
            jax.ShapeDtypeStruct((Brows, 128), jnp.int32),
            jax.ShapeDtypeStruct((Brows, 128), jnp.int32),
        ),
        interpret=interpret,
    )(qlen, tlen, qa_p, qs_p, ta_p, ts_p,
      *((qc_p,) if use_bias else ()), saa_p, s3d_p)

    # unpack: pair p at [p // SEG, p % SEG]
    best = best[:, :SEG].reshape(-1)[:B]
    qend = qend[:, :SEG].reshape(-1)[:B]
    tend = tend[:, :SEG].reshape(-1)[:B]
    return best, qend, tend


# ---------------------------------------------------------------------------
# Host-side helper: masked combined score tensor for the XLA backend
# ---------------------------------------------------------------------------

def build_scores(
    qa: np.ndarray, qs: np.ndarray, ta: np.ndarray, ts: np.ndarray,
    qlen: np.ndarray, tlen: np.ndarray,
    saa: np.ndarray, s3d: np.ndarray,
    w_aa: float = W_AA_INT, w_3di: float = W_3DI_INT,
    qc: np.ndarray = None,
) -> np.ndarray:
    s = w_aa * saa[qa[:, :, None], ta[:, None, :]] + w_3di * s3d[qs[:, :, None], ts[:, None, :]]
    if qc is not None:
        s = s + np.asarray(qc)[:, :, None]
    B, Lq, Lt = s.shape
    qm = np.arange(Lq)[None, :] < qlen[:, None]
    tm = np.arange(Lt)[None, :] < tlen[:, None]
    mask = qm[:, :, None] & tm[:, None, :]
    return np.where(mask, s, NEG).astype(np.float32)


# ---------------------------------------------------------------------------
# Multi-device data parallelism: shard the pair batch over a 1-D mesh
# ---------------------------------------------------------------------------

def sw_forward_sharded(
    qa, qs, ta, ts, qlen, tlen, saa, s3d,
    mesh,
    go: float = GAP_OPEN_INT,
    ge: float = GAP_EXTEND_INT,
    w_aa: float = W_AA_INT,
    w_3di: float = W_3DI_INT,
    backend: str = "pallas",
    ungapped: bool = False,
    gap_window: int = 0,
    qc=None,
):
    """Run the forward kernel data-parallel over every device of `mesh`.

    The batch axis is sharded over the mesh's first axis; each device runs
    the Pallas kernel (or the XLA scan) on its shard — the pure-DP layout
    of BASELINE.json's "query sharded, pairwise tiles per chip" design.
    B must be divisible by (n_devices * batch_tile).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map as _sm
        _sm_kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
        _sm_kw = {"check_rep": False}

    axis = mesh.axis_names[0]
    use_bias = qc is not None

    if backend == "pallas":
        def local(qa, qs, ta, ts, ql, tl, *rest):
            lqc = rest[0] if use_bias else None
            lsaa, ls3d = rest[-2:]
            return sw_forward_pallas(
                qa, qs, ta, ts, ql, tl, lsaa, ls3d,
                go=go, ge=ge, w_aa=w_aa, w_3di=w_3di, ungapped=ungapped,
                gap_window=gap_window, qc=lqc,
            )
    else:
        def local(qa, qs, ta, ts, ql, tl, *rest):
            lqc = rest[0] if use_bias else None
            saa, s3d = rest[-2:]
            s = (
                w_aa * saa[qa[:, :, None], ta[:, None, :]]
                + w_3di * s3d[qs[:, :, None], ts[:, None, :]]
            )
            if lqc is not None:
                s = s + lqc[:, :, None]
            Lq, Lt = qa.shape[1], ta.shape[1]
            qm = jnp.arange(Lq)[None, :] < ql[:, None]
            tm = jnp.arange(Lt)[None, :] < tl[:, None]
            mask = qm[:, :, None] & tm[:, None, :]
            s = jnp.where(mask, s.astype(jnp.float32), NEG)
            if ungapped:
                return ungapped_forward_xla(s)
            return sw_forward_xla(s, go=go, ge=ge, gap_window=gap_window)

    fn = _sm(
        local,
        mesh=mesh,
        in_specs=(P(axis),) * (6 + (1 if use_bias else 0)) + (P(), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        **_sm_kw,
    )
    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    args = [jax.device_put(jnp.asarray(x), sh) for x in (qa, qs, ta, ts, qlen, tlen)]
    if use_bias:
        args.append(jax.device_put(jnp.asarray(qc, jnp.int32), sh))
    args += [jax.device_put(jnp.asarray(saa, jnp.float32), rep),
             jax.device_put(jnp.asarray(s3d, jnp.float32), rep)]
    return jax.jit(fn)(*args)
