"""Batched profile-profile NW on device — the MSA inner loop.

Replaces the per-merge Python row loop of ops/nw.py for the tree stage
(`foldmason structuremsa` / `mafft` contract, tree.rs:166-231): merges
from MANY genes are batched into one (B, L, L) integer DP that runs as a
single jitted lax.scan over rows, emitting compact direction bits; the
host decodes tracebacks from the bits with a tiny O(path) walk.

Exactness contract: scores are pre-quantized integers (ops/nw.py QUANT),
the DP is int32, and prefix maxima use associative max (exact in any
association) — so the device result is bit-identical to the NumPy
reference `nw_align` on every platform, including every tie decision.

Direction bits per cell (i, j), 1-based DP coordinates:
    bit0  H[i,j] == E[i,j]        (traceback prefers E)
    bit1  H[i,j] == F[i,j]        (then F; else diagonal)
    bit2  E[i,j] == H[i,j-1]-go   (gap-open while in E)
    bit3  F[i,j] == H[i-1,j]-go   (gap-open while in F)
"""

from __future__ import annotations

import functools
from collections import deque
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INT_NEG = -(2 ** 28)  # sentinel with headroom: no int32 wrap after +-go/jge
# Score matrices ship as int16 (half the host->device transfer); padded
# cells use PAD_SCORE.  Padding correctness does not depend on the pad
# magnitude: the valid region is a top-left prefix and all DP flows are
# monotone (left->right, top->bottom), so padded cells never feed valid
# ones — only the (explicitly masked) end-cell selection sees them.
PAD_SCORE = -20000


@functools.partial(jax.jit, static_argnames=("go", "ge"))
def nw_forward_bits(
    S: jnp.ndarray,    # (B, L1, L2) int16/int32 quantized scores (pad = PAD_SCORE)
    l1: jnp.ndarray,   # (B,) int32 true row counts
    l2: jnp.ndarray,   # (B,) int32 true col counts
    go: int,
    ge: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Free-end-gap (semi-global) affine NW forward pass.

    Returns (bits (B, L1, L2) uint8, end_i (B,), end_j (B,), score (B,)).
    End cells follow ops/nw.py: best of last valid row vs last valid
    column, row preferred on ties, lowest index within each (argmax picks
    the first maximum).
    """
    B, L1, L2 = S.shape
    S = S.astype(jnp.int32)
    jge = (jnp.arange(L2 + 1, dtype=jnp.int32) * ge)[None, :]  # (1, L2+1)
    col = jnp.arange(L2 + 1, dtype=jnp.int32)[None, :]

    def cummax(x):
        return jax.lax.associative_scan(jnp.maximum, x, axis=-1)

    def row_step(carry, s_row):
        H_prev, F_prev, H_at_l1, i = carry  # i = current DP row (1-based)
        F = jnp.maximum(H_prev - go, F_prev - ge)               # (B, L2+1)
        diag = H_prev[:, :-1] + s_row                            # (B, L2)
        h0 = jnp.maximum(diag, F[:, 1:])
        # E scan from h0 (exact when go >= ge), as the reference
        G = jnp.concatenate([H_prev[:, :1] * 0, h0], axis=1)     # G[0]=H[i,0]=0
        P = cummax(G[:, :-1] + jge[:, :-1])
        Escan = P - go - jge[:, 1:] + ge
        H_in = jnp.maximum(h0, Escan)
        H = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), H_in], axis=1)
        # Gotoh-consistent E from the final row (traceback identities)
        P2 = cummax(H[:, :-1] + jge[:, :-1])
        E = P2 - go - jge[:, 1:] + ge
        bits = (
            (H_in == E).astype(jnp.uint8)
            | ((H_in == F[:, 1:]).astype(jnp.uint8) << 1)
            | ((E == H[:, :-1] - go).astype(jnp.uint8) << 2)
            | ((F[:, 1:] == H_prev[:, 1:] - go).astype(jnp.uint8) << 3)
        )
        # H[i, l2] for the last-column argmax (per-batch dynamic gather)
        h_l2 = jnp.take_along_axis(H, l2[:, None], axis=1)[:, 0]
        H_at_l1 = jnp.where((i == l1)[:, None], H, H_at_l1)
        return (H, F, H_at_l1, i + 1), (bits, h_l2)

    H0 = jnp.zeros((B, L2 + 1), jnp.int32)  # free end gaps: row 0 all 0
    F0 = jnp.full((B, L2 + 1), INT_NEG, jnp.int32)
    init = (H0, F0, H0, jnp.int32(1))
    (Hl, _, H_last_row, _), (bits, h_l2) = jax.lax.scan(
        row_step, init, jnp.swapaxes(S, 0, 1)
    )

    # ---- end cell: best of last valid row / last valid column ----
    row_vals = jnp.where(col <= l2[:, None], H_last_row, INT_NEG)  # (B, L2+1)
    last_row_j = jnp.argmax(row_vals, axis=1).astype(jnp.int32)
    best_row = jnp.max(row_vals, axis=1)

    col_vals = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.swapaxes(h_l2, 0, 1)], axis=1
    )  # (B, L1+1): H[0, l2]=0 (free ends), then rows 1..L1
    rown = jnp.arange(L1 + 1, dtype=jnp.int32)[None, :]
    col_vals = jnp.where(rown <= l1[:, None], col_vals, INT_NEG)
    last_col_i = jnp.argmax(col_vals, axis=1).astype(jnp.int32)
    best_col = jnp.max(col_vals, axis=1)

    row_wins = best_row >= best_col
    end_i = jnp.where(row_wins, l1, last_col_i)
    end_j = jnp.where(row_wins, last_row_j, l2)
    score = jnp.maximum(best_row, best_col)
    return jnp.swapaxes(bits, 0, 1), end_i, end_j, score


def decode_path(
    bits: np.ndarray, ei: int, ej: int, L1: int, L2: int
) -> List[Tuple[int, int]]:
    """Traceback from direction bits — the exact decision sequence of
    ops/nw.py nw_align (E preferred, then F, else diagonal)."""
    path: List[Tuple[int, int]] = []
    for j in range(L2 - 1, ej - 1, -1):
        path.append((-1, j))
    for i in range(L1 - 1, ei - 1, -1):
        path.append((i, -1))
    i, j = ei, ej
    state = "H"
    while i > 0 and j > 0:
        b = bits[i - 1, j - 1]
        if state == "H":
            if b & 1:
                state = "E"
                continue
            if b & 2:
                state = "F"
                continue
            path.append((i - 1, j - 1))
            i -= 1
            j -= 1
        elif state == "E":
            path.append((-1, j - 1))
            if b & 4:
                state = "H"
            j -= 1
        else:
            path.append((i - 1, -1))
            if b & 8:
                state = "H"
            i -= 1
    for jj in range(j - 1, -1, -1):
        path.append((-1, jj))
    for ii in range(i - 1, -1, -1):
        path.append((ii, -1))
    path.reverse()
    return path


def _bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("maxP",))
def _nw_decode_device(bits, ei, ej, l1, l2, maxP: int):
    """Device traceback walk — the exact decision sequence of
    decode_path's core loop (E preferred, then F, else diagonal),
    emitted BACKWARD into a fixed (B, maxP, 2) buffer.

    Returns (buf, count, i_stop, j_stop): buf[b, maxP-count:] holds the
    core path entries in forward order; the host prepends/appends the
    deterministic end-gap runs (decode_path's pre/post loops).  Replaces
    the O(cells) direction-bits download with an O(path) one — on a
    remote-tunnel device the bits transfer dominated the whole MSA
    stage."""
    B, L1, L2 = bits.shape
    bits_flat = bits.reshape(B, L1 * L2)

    def cond(st):
        i, j, state, pos, done = st[0], st[1], st[2], st[3], st[5]
        return jnp.logical_not(jnp.all(done))

    def body(st):
        i, j, state, pos, buf, done = st
        cell = jnp.take_along_axis(
            bits_flat, (jnp.maximum(i - 1, 0) * L2 + jnp.maximum(j - 1, 0))[:, None],
            axis=1,
        )[:, 0].astype(jnp.int32)
        in_h = state == 0
        in_e = state == 1
        in_f = state == 2
        to_e = in_h & ((cell & 1) != 0)
        to_f = in_h & ~to_e & ((cell & 2) != 0)
        diag = in_h & ~to_e & ~to_f
        # emits: diagonal (i-1, j-1); E: (-1, j-1); F: (i-1, -1)
        emit_i = jnp.where(diag | in_f, i - 1, -1)
        emit_j = jnp.where(diag | in_e, j - 1, -1)
        do_emit = ~done & (diag | in_e | in_f)
        pos_new = jnp.where(do_emit, pos - 1, pos)
        slot = jnp.maximum(pos_new, 0)
        rows = jnp.arange(B)
        old_i = buf[rows, slot, 0]
        old_j = buf[rows, slot, 1]
        buf = buf.at[rows, slot, 0].set(
            jnp.where(do_emit, emit_i, old_i).astype(jnp.int16))
        buf = buf.at[rows, slot, 1].set(
            jnp.where(do_emit, emit_j, old_j).astype(jnp.int16))
        # moves: diag: i-1, j-1; E: j-1; F: i-1; transitions: none
        i_new = jnp.where(~done & (diag | in_f), i - 1, i)
        j_new = jnp.where(~done & (diag | in_e), j - 1, j)
        state_new = jnp.where(
            to_e, 1, jnp.where(
                to_f, 2, jnp.where(
                    in_e, jnp.where((cell & 4) != 0, 0, 1),
                    jnp.where(in_f, jnp.where((cell & 8) != 0, 0, 2), 0))))
        state_new = jnp.where(done, state, state_new).astype(jnp.int32)
        done_new = done | (i_new <= 0) | (j_new <= 0)
        return (i_new, j_new, state_new, pos_new, buf, done_new)

    # ei/ej are 1-based DP coordinates (nw_forward_bits end cells) — the
    # walk starts AT them, exactly like decode_path
    i0 = ei
    j0 = ej
    done0 = (i0 <= 0) | (j0 <= 0)
    buf0 = jnp.full((B, maxP, 2), -2, jnp.int16)
    st = (i0.astype(jnp.int32), j0.astype(jnp.int32),
          jnp.zeros(B, jnp.int32), jnp.full(B, maxP, jnp.int32), buf0, done0)
    i, j, state, pos, buf, done = jax.lax.while_loop(cond, body, st)
    return buf, (jnp.full(B, maxP, jnp.int32) - pos), i, j


def nw_forward_bits_sharded(Sp, l1, l2, go: int, ge: int, mesh):
    """Run the NW forward data-parallel over `mesh`'s first axis.

    The merge batch is embarrassingly parallel across pairs; each device
    runs the same jitted scan on its shard, so results stay bit-identical
    to the single-device call (tree.rs:166-231 hot loop, VERDICT r3 #2:
    the MSA stage must not run at 1/N of a multi-chip machine).
    B must be a multiple of the device count (nw_align_batch pads)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map as _sm
        _sm_kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
        _sm_kw = {"check_rep": False}

    axis = mesh.axis_names[0]

    def local(S, a, b):
        return nw_forward_bits(S, a, b, go, ge)

    fn = _sm(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        **_sm_kw,
    )
    sh = NamedSharding(mesh, P(axis))
    args = [jax.device_put(jnp.asarray(x), sh) for x in (Sp, l1, l2)]
    return jax.jit(fn)(*args)


QUANT_INT = 256  # == ops/nw.py QUANT (integer formulation)


@functools.partial(jax.jit, static_argnames=("go", "ge", "wA", "wS", "maxP"))
def _nw_counts_impl(
    c1a, c2a, c1s, c2s,      # (B, L, 32) int16 count profiles (zero-pad)
    n1, n2, l1, l2,          # (B,) int32
    saa, s3d,                # (32, 32) f32 integer matrices
    go: int, ge: int, wA: int, wS: int, maxP: int,
):
    """Fused device MSA merge: profile->score on the MXU, integer
    quantization, NW forward bits, and the traceback walk — one dispatch
    per batch.  Exactness: counts and matrices are small integers, the
    two-stage matmul runs at Precision.HIGHEST (f32; every intermediate
    < 2^24 for n1*n2 <= 16384, asserted host-side), and the quantization
    is pure integer arithmetic — bit-identical to the host reference
    (ops/nw.py nw_align on the same integer formula)."""
    B, L, _ = c1a.shape
    hi = jax.lax.Precision.HIGHEST
    A = jnp.einsum("bik,kl,bjl->bij", c1a.astype(jnp.float32), saa,
                   c2a.astype(jnp.float32), precision=hi)
    Bm = jnp.einsum("bik,kl,bjl->bij", c1s.astype(jnp.float32), s3d,
                    c2s.astype(jnp.float32), precision=hi)
    # all-int32 arithmetic (TPU has no int64): numerator bounded by
    # QUANT*(wA*11+wS*17)*n1*n2 + 5*n1*n2 < 2^31 for n1*n2 <= 8192
    # (asserted host-side); larger merges take the host path
    N = QUANT_INT * (wA * A.astype(jnp.int32) + wS * Bm.astype(jnp.int32))
    n1n2 = (n1 * n2)[:, None, None]
    D = 10 * n1n2
    Sq = jnp.floor_divide(N + 5 * n1n2, D).astype(jnp.int32)
    ri = jnp.arange(L, dtype=jnp.int32)
    valid = (ri[None, :, None] < l1[:, None, None]) & \
            (ri[None, None, :] < l2[:, None, None])
    Sq = jnp.where(valid, Sq, PAD_SCORE)
    bits, ei, ej, score = nw_forward_bits(Sq, l1, l2, go, ge)
    buf, cnt, i_stop, j_stop = _nw_decode_device(bits, ei, ej, l1, l2, maxP)
    return buf, cnt, i_stop, j_stop, ei, ej, score


def nw_counts_exact_bound(saa: np.ndarray, s3d: np.ndarray,
                          wA: int, wS: int) -> int:
    """Largest n1*n2 for which the fused device merge is exact, computed
    from the ACTUAL matrices and weights (a hardcoded 8192 assumed the
    default wA=14/wS=21 — kernel-unit weights like 40/60 overflow int32
    at n1*n2=8192 and silently wrap, producing wrong merge paths).  Two
    constraints: (a) every f32 matmul intermediate < 2^24, (b) the int32
    numerator QUANT*(wA*A + wS*B) + 5*n1*n2 < 2^31."""
    ma = float(np.abs(np.asarray(saa)[:21, :21]).max())
    ms = float(np.abs(np.asarray(s3d)[:21, :21]).max())
    f32_bound = int((1 << 24) / max(ma, ms, 1.0))
    i32_bound = int(((1 << 31) - 1) / (QUANT_INT * (wA * ma + wS * ms) + 5))
    return min(8192, f32_bound, i32_bound)


def nw_align_batch_counts(
    entries: List[tuple], go: int, ge: int,
    saa: np.ndarray, s3d: np.ndarray, wA: int, wS: int,
    batch_size: int = 64,
) -> List[Tuple[List[Tuple[int, int]], float]]:
    """Device-complete MSA merges from integer COUNT profiles.

    `entries`: per merge (C1a (L1,21) int, C1s or None, C2a (L2,21),
    C2s or None, n1, n2).  Score construction, quantization, NW forward
    and traceback all run on the device in ONE dispatch per batch;
    only (path, score) transfers back — O(path), not O(cells).  The
    tunnel-bound bits download and the host profile-matmul were 94% of
    the MSA stage wall (BENCH_NOTES round 4).

    Quantization: Sq = round_half_up(QUANT * (wA*A + wS*B) / (10*n1*n2))
    in pure integer arithmetic, where A/B are integer count-profile
    matmuls — the HOST reference (msa/progressive.py::_score_matrix)
    computes the identical formula, so device and host paths stay
    bit-identical including every tie decision."""
    pipe = CountsMergePipeline(go, ge, saa, s3d, wA, wS, batch_size=batch_size)
    out: List = [None] * len(entries)
    for k, r in pipe.submit(list(enumerate(entries))):
        out[k] = r
    while True:
        done = pipe.collect_one()
        if done is None:
            break
        for k, r in done:
            out[k] = r
    return out


class CountsMergePipeline:
    """Two-phase (dispatch / collect) device MSA-merge pipeline.

    `submit` packs + dispatches count-profile merge batches (pow2 length
    buckets — the shape-class rule) and returns immediately (degenerate
    empty-profile merges resolve inline); `collect_one` blocks on the
    OLDEST in-flight batch and decodes it.  A caller interleaving the
    two overlaps its host-side work (path application, count-profile
    building for the next merge generation) with device compute — the
    merge-round barrier was the MSA stage floor at config-4 scale
    (~250 ms/dispatch x tree-depth sequential rounds, VERDICT r4 #6;
    msa/progressive.py::align_many is that caller).
    """

    def __init__(self, go: int, ge: int, saa, s3d, wA: int, wS: int,
                 batch_size: int = 64):
        self.go, self.ge, self.wA, self.wS = int(go), int(ge), int(wA), int(wS)
        self.batch_size = batch_size
        self.n1n2_max = nw_counts_exact_bound(saa, s3d, wA, wS)
        self.saa_p = np.zeros((32, 32), np.float32)
        self.saa_p[:21, :21] = saa[:21, :21]
        self.s3d_p = np.zeros((32, 32), np.float32)
        self.s3d_p[:21, :21] = s3d[:21, :21]
        self._inflight: deque = deque()

    def pending(self) -> int:
        return len(self._inflight)

    def submit(self, keyed_entries: List[tuple]) -> List[tuple]:
        """keyed_entries: [(key, entry)] with entry as in
        nw_align_batch_counts.  Dispatches device batches; returns the
        inline-resolved degenerate results as [(key, (path, score))]."""
        resolved: List[tuple] = []
        buckets: dict = {}
        by_key = {}
        for key, e in keyed_entries:
            L1 = e[0].shape[0]
            L2 = e[2].shape[0]
            assert int(e[4]) * int(e[5]) <= self.n1n2_max, \
                "n1*n2 too large for exact int32 quantization (host path required)"
            if L1 == 0 or L2 == 0:
                path = [(-1, j) for j in range(L2)] + [(i, -1) for i in range(L1)]
                resolved.append((key, (path, 0.0)))
                continue
            by_key[key] = e
            buckets.setdefault(_bucket(max(L1, L2)), []).append(key)
        for Lb, idxs in sorted(buckets.items()):
            bsz = max(1, min(self.batch_size, (64 << 20) // (Lb * Lb)))
            for s0 in range(0, len(idxs), bsz):
                chunk = idxs[s0 : s0 + bsz]
                B = bsz if len(idxs) > bsz else min(
                    bsz, max(4, 1 << (len(chunk) - 1).bit_length())
                )
                # int16 counts: n <= 8192 bound keeps every count in
                # range; halves the host packing + tunnel upload
                c1a = np.zeros((B, Lb, 32), np.int16)
                c2a = np.zeros((B, Lb, 32), np.int16)
                c1s = np.zeros((B, Lb, 32), np.int16)
                c2s = np.zeros((B, Lb, 32), np.int16)
                n1 = np.ones(B, np.int32)
                n2 = np.ones(B, np.int32)
                l1 = np.ones(B, np.int32)
                l2 = np.ones(B, np.int32)
                dims = []
                for row, key in enumerate(chunk):
                    e1a, e1s, e2a, e2s, en1, en2 = by_key[key]
                    a, b = e1a.shape[0], e2a.shape[0]
                    c1a[row, :a, :21] = e1a
                    c2a[row, :b, :21] = e2a
                    if e1s is not None:
                        c1s[row, :a, :21] = e1s
                        c2s[row, :b, :21] = e2s
                    n1[row], n2[row] = en1, en2
                    l1[row], l2[row] = a, b
                    dims.append((a, b))
                res = _nw_counts_impl(
                    jnp.asarray(c1a), jnp.asarray(c2a), jnp.asarray(c1s),
                    jnp.asarray(c2s), jnp.asarray(n1), jnp.asarray(n2),
                    jnp.asarray(l1), jnp.asarray(l2),
                    jnp.asarray(self.saa_p), jnp.asarray(self.s3d_p),
                    self.go, self.ge, self.wA, self.wS, 2 * Lb,
                )
                self._inflight.append((chunk, dims, res))
        return resolved

    def collect_one(self):
        """Decode the oldest in-flight batch -> [(key, (path, score))],
        or None when nothing is in flight."""
        if not self._inflight:
            return None
        chunk, dims, (buf, cnt, i_stop, j_stop, ei, ej, score) = \
            self._inflight.popleft()
        buf = np.asarray(buf)
        cnt, i_stop, j_stop = np.asarray(cnt), np.asarray(i_stop), np.asarray(j_stop)
        ei, ej, score = np.asarray(ei), np.asarray(ej), np.asarray(score)
        maxP = buf.shape[1]
        out = []
        for row, key in enumerate(chunk):
            L1, L2 = dims[row]
            # assemble exactly like decode_path: trailing end-gaps, core
            # (already forward-ordered in buf), then leading end-gaps
            core = buf[row, maxP - cnt[row]:]
            i_s, j_s = int(i_stop[row]), int(j_stop[row])
            # decode_path's backward emit order, reversed: leading
            # query-gaps (rows 0..i_stop-1) then target-gaps
            # (cols 0..j_stop-1), the core, then trailing gaps for the
            # unaligned tails (rows ei.., cols ej.. — ei/ej are 1-based
            # DP end coords, i.e. the first unaligned 0-based index)
            lead = ([(ii, -1) for ii in range(i_s)]
                    + [(-1, jj) for jj in range(j_s)])
            trail = ([(ii, -1) for ii in range(int(ei[row]), L1)]
                     + [(-1, jj) for jj in range(int(ej[row]), L2)])
            path = lead + [(int(a), int(b)) for a, b in core] + trail
            out.append((key, (path, float(score[row]))))
        return out


def nw_align_batch(
    S_list: List[np.ndarray], go: int, ge: int, batch_size: int = 64,
) -> List[Tuple[List[Tuple[int, int]], float]]:
    """Batched device counterpart of [ops/nw.py nw_align] over many score
    matrices (quantized int32).  Returns [(path, score), ...] in order.

    Matrices are bucketed to square power-of-two shapes (bounded compile
    count), batched, and dispatched before any decode (device compute
    overlaps host traceback decoding).
    """
    out: List = [None] * len(S_list)
    buckets = {}
    for k, S in enumerate(S_list):
        L1, L2 = S.shape
        if L1 == 0 or L2 == 0:  # degenerate: all-gap path, no DP needed
            path = [(-1, j) for j in range(L2)] + [(i, -1) for i in range(L1)]
            out[k] = (path, 0.0)
            continue
        buckets.setdefault(_bucket(max(L1, L2)), []).append(k)

    inflight = []
    for Lb, idxs in sorted(buckets.items()):
        # cap per-dispatch score transfer at ~64 MB (int16)
        bsz = max(1, min(batch_size, (64 << 20) // (Lb * Lb * 2)))
        for s0 in range(0, len(idxs), bsz):
            chunk = idxs[s0 : s0 + bsz]
            # pad the batch to a power of two (capped at bsz): merge
            # rounds shrink geometrically, and an exact-size batch would
            # be a NEW compiled shape per round — pow2 classes bound the
            # compile count and get reused across rounds and genes
            B = bsz if len(idxs) > bsz else min(
                bsz, max(8, 1 << (len(chunk) - 1).bit_length())
            )
            Sp = np.full((B, Lb, Lb), PAD_SCORE, dtype=np.int16)
            l1 = np.ones(B, dtype=np.int32)
            l2 = np.ones(B, dtype=np.int32)
            for row, k in enumerate(chunk):
                a, b = S_list[k].shape
                Sk = S_list[k]
                assert abs(int(Sk.max(initial=0))) < abs(PAD_SCORE) and \
                    int(Sk.min(initial=0)) > PAD_SCORE, "score exceeds int16 budget"
                Sp[row, :a, :b] = Sk
                l1[row], l2[row] = a, b
            devs = jax.devices()
            if len(devs) > 1 and devs[0].platform in ("tpu", "axon"):
                # multi-chip: shard the merge batch over every local
                # device (pad rows replicate the degenerate 1x1 DP and
                # are dropped at decode)
                from jax.sharding import Mesh
                nd = len(devs)
                Bd = ((B + nd - 1) // nd) * nd
                if Bd != B:
                    Sp = np.concatenate(
                        [Sp, np.full((Bd - B, Lb, Lb), PAD_SCORE, np.int16)])
                    l1 = np.concatenate([l1, np.ones(Bd - B, np.int32)])
                    l2 = np.concatenate([l2, np.ones(Bd - B, np.int32)])
                res = nw_forward_bits_sharded(
                    Sp, l1, l2, int(go), int(ge), Mesh(np.asarray(devs), ("dp",))
                )
            else:
                res = nw_forward_bits(
                    jnp.asarray(Sp), jnp.asarray(l1), jnp.asarray(l2), int(go), int(ge)
                )
            inflight.append((chunk, res))
    for chunk, (bits, ei, ej, score) in inflight:
        bits = np.asarray(bits)
        ei, ej, score = np.asarray(ei), np.asarray(ej), np.asarray(score)
        for row, k in enumerate(chunk):
            L1, L2 = S_list[k].shape
            path = decode_path(bits[row], int(ei[row]), int(ej[row]), L1, L2)
            out[k] = (path, float(score[row]))
    return out
