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
