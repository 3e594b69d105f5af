"""Banded Smith-Waterman for long pairs — band-coordinate prefix-scan.

Full-matrix SW is O(Lq*Lt) per pair; for long proteins (the buckets above
`long_threshold` in align/engine.py) the optimal alignment hugs a single
diagonal, so we restrict the DP to a band of width W around a seed
diagonal and compute O(Lq*W) instead — the TPU analog of the banded
alignment stage that follows the k-mer diagonal match in the reference's
foldseek pipeline (cluster.rs:43-55 contract: k-mer match -> diagonal ->
gapped alignment around it).

Seed diagonal: `vote_diagonal` reproduces foldseek's double-k-mer-match
idea on the host — exact combined AA+3Di 6-mers of query and target are
matched and each match votes for its diagonal (t_pos - q_pos); the
smoothed histogram argmax is the band center.  O(Lq + Lt) per pair.

Band coordinates: cell (i, k) is matrix cell (i, j) with
j = i + d0 + k - W/2.  The affine recurrence transforms to

    diag (i-1, j-1) -> (i-1, k)      same column!
    up   (i-1, j)   -> (i-1, k+1)    shift left
    left (i,   j-1) -> (i,   k-1)    in-row, same prefix-max scan

so the row scan is the same Kogge-Stone prefix max as ops/sw.py, the
tie-breaking stays row-major in the ORIGINAL (i, j) coordinates (lowest k
= lowest j within a row), and the result is bit-identical to full SW
whenever the optimal alignment stays inside the band (asserted on planted
homologies in tests/test_banded.py).

The scan is pure jax.lax — it runs identically on TPU and CPU (the same
backend-byte-identity contract as gap_window), and the O(Lq*W) tensors
are small enough that XLA's fused scan is already memory-bound-optimal;
the Pallas kernel stays reserved for the short-bucket bulk.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unicore_tpu.ops.sw import NEG, _prefix_max

KMER_K = 6
_ALPHA2 = 441  # combined (aa, 3di) symbol alphabet: 21 * 21


def _combined_kmers(aa: np.ndarray, ss: np.ndarray, k: int = KMER_K) -> np.ndarray:
    """Exact integer k-mers over the combined AA+3Di alphabet.

    441^6 = 7.4e15 < 2^63, so the rolling product is exact in int64 —
    no hashing, no collisions."""
    c = aa.astype(np.int64) * 21 + ss.astype(np.int64)
    n = len(c) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    v = np.zeros(n, dtype=np.int64)
    for i in range(k):
        v = v * _ALPHA2 + c[i : i + n]
    return v


def vote_diagonal(
    q_aa: np.ndarray, q_ss: np.ndarray, t_aa: np.ndarray, t_ss: np.ndarray,
    k: int = KMER_K, max_occ: int = 16, smooth: int = 8,
) -> Optional[int]:
    """Seed diagonal d0 = t_pos - q_pos from exact k-mer matches.

    Every (query k-mer == target k-mer) occurrence votes for its
    diagonal; k-mers occurring > max_occ times in the target are skipped
    (low-complexity guard).  Votes are smoothed over +-smooth diagonals
    (small indels shift the trace between nearby diagonals).  Returns
    None when not a single k-mer matches — for 6-mers over the combined
    441-letter alphabet that means the pair is unalignable junk."""
    qk = _combined_kmers(q_aa, q_ss, k)
    tk = _combined_kmers(t_aa, t_ss, k)
    return _vote_hist(qk, tk, len(q_aa), len(t_aa), max_occ, smooth)


def _vote_hist(
    qk: np.ndarray, tk: np.ndarray, Lq: int, Lt: int, max_occ: int, smooth: int,
    min_votes: int = 1,
) -> Optional[int]:
    """Diagonal histogram vote over exact integer k-mer matches.

    `min_votes`: the winning smoothed window must collect at least this
    many matches — a single chance match over a small alphabet must not
    seed a band (the sensitive fallback alphabets have non-negligible
    random match rates)."""
    if len(qk) == 0 or len(tk) == 0:
        return None
    order = np.argsort(tk, kind="stable")
    tks = tk[order]
    lo = np.searchsorted(tks, qk, "left")
    hi = np.searchsorted(tks, qk, "right")
    cnt = hi - lo
    sel = np.nonzero((cnt > 0) & (cnt <= max_occ))[0]
    if len(sel) == 0:
        return None
    tpos = np.concatenate([order[lo[i] : hi[i]] for i in sel])
    qpos = np.repeat(sel, cnt[sel])
    hist = np.zeros(Lq + Lt, dtype=np.int64)
    np.add.at(hist, tpos - qpos + Lq, 1)
    win = 2 * smooth + 1
    sm = np.convolve(hist, np.ones(win, dtype=np.int64), mode="same")
    arg = int(np.argmax(sm))
    if sm[arg] < min_votes:
        return None
    return arg - Lq


# Murphy-style 10-group reduced AA alphabet (+X): conservative
# substitutions (I/L/V/M, K/R, D/E/N/Q, F/Y/W, S/T) map to the same
# group, so distant homologs that share no exact 6-mer still share
# reduced k-mers.  Indexed by AA_FULL code order "ARNDCQEGHILKMFPSTWYV"+X.
REDUCED_AA_GROUPS = np.array(
    [2, 8, 7, 7, 1, 7, 7, 3, 9, 0, 0, 8, 0, 6, 5, 4, 4, 6, 6, 0, 10],
    dtype=np.int64,
)
_NGROUPS = 11


def _plain_kmers(sym: np.ndarray, alpha: int, k: int) -> np.ndarray:
    """Exact integer k-mers over a single small alphabet."""
    c = sym.astype(np.int64)
    n = len(c) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    v = np.zeros(n, dtype=np.int64)
    for i in range(k):
        v = v * alpha + c[i : i + n]
    return v


def vote_diagonal_sensitive(
    q_aa: np.ndarray, q_ss: np.ndarray, t_aa: np.ndarray, t_ss: np.ndarray,
    smooth: int = 8,
) -> Optional[int]:
    """Fallback seed vote for pairs with no exact combined 6-mer
    (round-2 VERDICT: the recall cliff at zero votes).

    Two progressively wider nets, in order:
      1. 3Di-only exact 6-mers — structure is conserved far below the
         twilight zone of sequence identity (foldseek's core premise),
         so a distant structural homolog usually still shares 3Di words
         even when AA+3Di combined words are all broken.
      2. Reduced-alphabet AA 7-mers (Murphy 10 groups) — conservative
         substitutions stop breaking words.
    Higher max_occ guards compensate the smaller alphabets' higher
    random match rates; the smoothed histogram argmax drowns the extra
    noise votes.  Returns None only when both nets come up empty — the
    engine then routes the pair to full (unbanded) SW.
    """
    Lq, Lt = len(q_aa), len(t_aa)
    d0 = _vote_hist(
        _plain_kmers(np.asarray(q_ss), 21, 6), _plain_kmers(np.asarray(t_ss), 21, 6),
        Lq, Lt, max_occ=64, smooth=smooth, min_votes=3,
    )
    if d0 is not None:
        return d0
    qr = REDUCED_AA_GROUPS[np.asarray(q_aa, dtype=np.int64)]
    tr = REDUCED_AA_GROUPS[np.asarray(t_aa, dtype=np.int64)]
    return _vote_hist(
        _plain_kmers(qr, _NGROUPS, 7), _plain_kmers(tr, _NGROUPS, 7),
        Lq, Lt, max_occ=64, smooth=smooth, min_votes=3,
    )


def _channel_match_excess(qk: np.ndarray, tk: np.ndarray, alpha_pow: float,
                          max_occ: int = 64) -> bool:
    """True iff the number of exact k-mer matches exceeds the chance
    expectation for two random sequences by > 3 sigma (+2 floor)."""
    if len(qk) == 0 or len(tk) == 0:
        return False
    order = np.argsort(tk, kind="stable")
    cnt = np.searchsorted(tk[order], qk, "right") - np.searchsorted(tk[order], qk, "left")
    obs = int(np.minimum(cnt, max_occ).sum())
    exp = len(qk) * len(tk) / alpha_pow
    return obs > exp + 3.0 * np.sqrt(exp) + 2.0


def has_seed_evidence(
    q_aa: np.ndarray, q_ss: np.ndarray, t_aa: np.ndarray, t_ss: np.ndarray,
) -> bool:
    """Chance-corrected homology evidence for pairs whose diagonal votes
    all failed: do the 3Di or reduced-AA channels share significantly
    more k-mers than two random sequences would?  Gates the full-SW last
    resort — without it, every chance-level long candidate pair (hashed
    bag prefilters pass many at scale) would cost a full O(Lq*Lt) DP.
    Foldseek's prefilter drops such pairs too."""
    if _channel_match_excess(
        _plain_kmers(np.asarray(q_ss), 21, 6), _plain_kmers(np.asarray(t_ss), 21, 6),
        float(21) ** 6,
    ):
        return True
    qr = REDUCED_AA_GROUPS[np.asarray(q_aa, dtype=np.int64)]
    tr = REDUCED_AA_GROUPS[np.asarray(t_aa, dtype=np.int64)]
    return _channel_match_excess(
        _plain_kmers(qr, _NGROUPS, 7), _plain_kmers(tr, _NGROUPS, 7),
        float(_NGROUPS) ** 7,
    )


@functools.partial(
    jax.jit,
    static_argnames=("W", "go", "ge", "w_aa", "w_3di", "gap_window", "ungapped"),
)
def sw_forward_banded(
    qa: jnp.ndarray,    # (B, Lq) int32 AA codes (pad with X=20)
    qs: jnp.ndarray,    # (B, Lq) int32 3Di codes
    ta: jnp.ndarray,    # (B, Lt) int32
    ts: jnp.ndarray,    # (B, Lt) int32
    qlen: jnp.ndarray,  # (B,) int32
    tlen: jnp.ndarray,  # (B,) int32
    d0: jnp.ndarray,    # (B,) int32 seed diagonal (t_pos - q_pos)
    saa: jnp.ndarray,   # (21, 21) f32
    s3d: jnp.ndarray,   # (21, 21) f32
    W: int = 256,
    go: float = 100.0,
    ge: float = 10.0,
    w_aa: float = 4.0,
    w_3di: float = 6.0,
    gap_window: int = 0,
    ungapped: bool = False,
    qc: jnp.ndarray = None,  # (B, Lq) int32 per-query-row score correction
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(best, qend, tend) per pair over the band j in [i+d0-W/2, i+d0+W/2).

    Identical scoring/tie semantics to sw_forward_xla restricted to the
    band; exact vs full SW whenever the optimum stays inside it."""
    B, Lq = qa.shape
    Lt = ta.shape[1]
    W2 = W // 2

    i_idx = jnp.arange(Lq, dtype=jnp.int32)[None, :, None]       # (1, Lq, 1)
    k_idx = jnp.arange(W, dtype=jnp.int32)[None, None, :]        # (1, 1, W)
    J = i_idx + d0[:, None, None] + k_idx - W2                   # (B, Lq, W)
    valid = (J >= 0) & (J < tlen[:, None, None]) & (i_idx < qlen[:, None, None])
    Jc = jnp.clip(J, 0, Lt - 1)
    ta_g = jnp.take_along_axis(ta[:, None, :], Jc.reshape(B, 1, -1), axis=2)
    ts_g = jnp.take_along_axis(ts[:, None, :], Jc.reshape(B, 1, -1), axis=2)
    ta_g = ta_g.reshape(B, Lq, W)
    ts_g = ts_g.reshape(B, Lq, W)
    s = (
        w_aa * saa[qa[:, :, None], ta_g]
        + w_3di * s3d[qs[:, :, None], ts_g]
    ).astype(jnp.float32)
    if qc is not None:
        s = s + qc[:, :, None].astype(jnp.float32)
    s = jnp.where(valid, s, NEG)

    jge = (jnp.arange(W, dtype=jnp.float32) * ge)[None, :]  # (1, W)

    def row_step(carry, s_row):
        H_prev, F_prev, best, bi, bk, i = carry
        if ungapped:
            # per-diagonal Kadane chain: in band coords a diagonal IS a
            # column, so the whole rescore is one add+max per row
            H = jnp.maximum(0.0, H_prev + s_row)
            F = F_prev
        else:
            # up-predecessor shifts LEFT in band coords (see module doc)
            H_up = jnp.pad(H_prev[:, 1:], ((0, 0), (0, 1)), constant_values=NEG)
            F_up = jnp.pad(F_prev[:, 1:], ((0, 0), (0, 1)), constant_values=NEG)
            F = jnp.maximum(H_up - go, F_up - ge)
            H0 = jnp.maximum(0.0, jnp.maximum(H_prev + s_row, F))
            P = _prefix_max(H0 + jge, window=gap_window)
            Pexc = jnp.pad(P[:, :-1], ((0, 0), (1, 0)), constant_values=NEG)
            E = Pexc - go + ge - jge
            H = jnp.maximum(H0, E)
        row_max = jnp.max(H, axis=1)
        # first max = lowest k = lowest j: row-major ties in (i, j)
        row_arg = jnp.argmax(H, axis=1).astype(jnp.int32)
        upd = row_max > best
        best = jnp.where(upd, row_max, best)
        bi = jnp.where(upd, i, bi)
        bk = jnp.where(upd, row_arg, bk)
        return (H, F, best, bi, bk, i + 1), None

    init = (
        jnp.zeros((B, W), jnp.float32),
        jnp.full((B, W), NEG, jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.int32(0),
    )
    (_, _, best, bi, bk, _), _ = jax.lax.scan(row_step, init, jnp.swapaxes(s, 0, 1))
    tend = jnp.clip(bi + d0 + bk - W2, 0, Lt - 1)
    return best, bi, tend


def sw_forward_banded_sharded(
    qa, qs, ta, ts, qlen, tlen, d0, saa, s3d,
    mesh,
    W: int = 256,
    go: float = 100.0,
    ge: float = 10.0,
    w_aa: float = 4.0,
    w_3di: float = 6.0,
    gap_window: int = 0,
    ungapped: bool = False,
    qc=None,
):
    """Banded forward data-parallel over `mesh` (the long-pair analog of
    ops/sw.py::sw_forward_sharded): the pair batch is sharded over the
    mesh's first axis, every device runs the band scan on its shard.
    B must be divisible by the device count (align/engine.py pads)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map as _sm
        _sm_kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
        _sm_kw = {"check_rep": False}

    axis = mesh.axis_names[0]
    use_bias = qc is not None

    def local(qa, qs, ta, ts, ql, tl, d0, *rest):
        lqc = rest[0] if use_bias else None
        saa, s3d = rest[-2:]
        return sw_forward_banded(
            qa, qs, ta, ts, ql, tl, d0, saa, s3d,
            W=W, go=go, ge=ge, w_aa=w_aa, w_3di=w_3di,
            gap_window=gap_window, ungapped=ungapped, qc=lqc,
        )

    fn = _sm(
        local,
        mesh=mesh,
        in_specs=(P(axis),) * (7 + (1 if use_bias else 0)) + (P(), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        **_sm_kw,
    )
    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    args = [jax.device_put(jnp.asarray(x), sh)
            for x in (qa, qs, ta, ts, qlen, tlen, d0)]
    if use_bias:
        args.append(jax.device_put(jnp.asarray(qc, jnp.int32), sh))
    args += [jax.device_put(jnp.asarray(saa, jnp.float32), rep),
             jax.device_put(jnp.asarray(s3d, jnp.float32), rep)]
    return jax.jit(fn)(*args)


def band_scores_ref(
    q_aa: np.ndarray, q_ss: np.ndarray, t_aa: np.ndarray, t_ss: np.ndarray,
    d0: int, W: int,
    saa: np.ndarray, s3d: np.ndarray, w_aa: float, w_3di: float,
    qc: np.ndarray = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side banded score matrix (Lq, W) + the J index map."""
    Lq, Lt = len(q_aa), len(t_aa)
    W2 = W // 2
    J = np.arange(Lq)[:, None] + d0 + np.arange(W)[None, :] - W2
    valid = (J >= 0) & (J < Lt)
    Jc = np.clip(J, 0, Lt - 1)
    s = (
        w_aa * saa[q_aa[:, None], t_aa[Jc]]
        + w_3di * s3d[q_ss[:, None], t_ss[Jc]]
    ).astype(np.float64)
    if qc is not None:
        s = s + np.asarray(qc)[:, None]
    s[~valid] = NEG
    return s, J


def sw_traceback_banded_ref(
    s_band: np.ndarray,  # (Lq, W) banded scores (invalid cells ~NEG)
    d0: int,
    go: float, ge: float,
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Banded Gotoh with traceback.

    Returns (score, q_idx, t_idx) in ORIGINAL coordinates — the same
    interface as sw_traceback_ref (-1 marks gap positions) — but with
    O(Lq*W) memory instead of O(Lq*Lt).  Cell (i, k) of the band is
    matrix cell (i, i + d0 + k - W/2)."""
    Lq, W = s_band.shape
    W2 = W // 2
    H = np.zeros((Lq + 1, W))
    E = np.full((Lq + 1, W), NEG)
    F = np.full((Lq + 1, W), NEG)
    jge = ge * np.arange(W)
    for i in range(1, Lq + 1):
        # up-predecessor is (i-1, k+1) in band coords
        H_up = np.concatenate([H[i - 1, 1:], [NEG]])
        F_up = np.concatenate([F[i - 1, 1:], [NEG]])
        F[i] = np.maximum(H_up - go, F_up - ge)
        h0 = np.maximum(0.0, np.maximum(H[i - 1] + s_band[i - 1], F[i]))
        # in-row prefix scan for E, then rebuild the Gotoh-consistent E
        # from the final row (same trick as sw_traceback_ref)
        P = np.maximum.accumulate(h0 + jge)
        Pexc = np.concatenate([[NEG], P[:-1]])
        H[i] = np.maximum(h0, Pexc - go + ge - jge)
        P2 = np.maximum.accumulate(H[i] + jge)
        P2exc = np.concatenate([[NEG], P2[:-1]])
        E[i] = P2exc - go + ge - jge
    flat = np.argmax(H)
    bi, bk = np.unravel_index(flat, H.shape)
    score = H[bi, bk]

    qi, kk = int(bi), int(bk)
    q_idx, t_idx = [], []
    state = "H"
    while qi > 0:
        j = (qi - 1) + d0 + kk - W2  # 0-based target index of cell (qi, kk)
        if j < 0:
            break
        h = H[qi, kk]
        if h == 0 and state == "H":
            break
        if state == "H":
            if h == E[qi, kk]:
                state = "E"
                continue
            if h == F[qi, kk]:
                state = "F"
                continue
            q_idx.append(qi - 1)
            t_idx.append(j)
            qi -= 1  # diag: same k
        elif state == "E":  # gap consuming target: left in band coords
            q_idx.append(-1)
            t_idx.append(j)
            if kk == 0:
                break
            if E[qi, kk] == H[qi, kk - 1] - go:
                state = "H"
            kk -= 1
        else:  # F: gap consuming query: up-right in band coords
            q_idx.append(qi - 1)
            t_idx.append(-1)
            if kk + 1 >= W:
                break
            if F[qi, kk] == H[qi - 1, kk + 1] - go:
                state = "H"
            qi -= 1
            kk += 1
    q_idx.reverse()
    t_idx.reverse()
    return float(score), np.array(q_idx, dtype=np.int32), np.array(t_idx, dtype=np.int32)
