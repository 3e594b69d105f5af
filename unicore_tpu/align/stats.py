"""Alignment score statistics (Karlin-Altschul E-values).

The reference delegates E-value computation to Foldseek.  Here we compute
ungapped Karlin-Altschul lambda for the *actual* combined substitution
matrix by solving  sum_ij p_i p_j exp(lambda * s_ij) = 1  (Newton), with
uniform background frequencies per channel, and use the BLAST-style
gapped approximation K = 0.041.  E = K * m * n * exp(-lambda * S),
bits = (lambda * S - ln K) / ln 2.

This is an approximation (gapped parameters would need simulation);
downstream it only gates cluster/search edges, where the coverage
criterion dominates.
"""

from __future__ import annotations

import functools
import math

import numpy as np

K_DEFAULT = 0.041


@functools.lru_cache(maxsize=8)
def _lambda_cached(key) -> float:
    S, p, q = key
    S = np.array(S)
    p = np.array(p)
    q = np.array(q)

    def f(lam: float) -> float:
        with np.errstate(over="ignore"):
            return float(p @ np.exp(np.minimum(lam * S, 700.0)) @ q) - 1.0

    if float(p @ S @ q) >= 0:
        # positive expected score: KA theory inapplicable; weak fallback
        return 1e-3
    hi = 0.5
    while f(hi) < 0 and hi < 64:
        hi *= 2
    lo = 1e-6
    for _ in range(80):
        mid = (lo + hi) / 2
        if f(mid) < 0:
            lo = mid
        else:
            hi = mid
    return float((lo + hi) / 2)


def karlin_lambda(S: np.ndarray, p: np.ndarray | None = None, q: np.ndarray | None = None) -> float:
    """Solve sum p_i q_j exp(lambda s_ij) = 1 for lambda > 0."""
    n, m = S.shape
    if p is None:
        p = np.full(n, 1.0 / n)
    if q is None:
        q = np.full(m, 1.0 / m)
    key = (
        tuple(map(tuple, np.round(S, 6))),
        tuple(np.round(p, 9)),
        tuple(np.round(q, 9)),
    )
    return _lambda_cached(key)


def combined_lambda(saa: np.ndarray, s3d: np.ndarray, w_aa: float, w_3di: float) -> float:
    """Lambda for the combined independent-channel score w_aa*Saa + w_3di*S3d.

    Under channel independence the MGF factorizes, so we solve on the
    (small) joint 21x21 x 21x21 outer sum via the 441-state joint matrix.
    """
    n = saa.shape[0]
    joint = (
        w_aa * np.repeat(np.repeat(saa, n, 0), n, 1)
        + w_3di * np.tile(np.tile(s3d, (n, 1)), (1, n))
    )
    # exclude X states from the background (they never occur in real data)
    keep = [i * n + j for i in range(n - 1) for j in range(n - 1)]
    joint = joint[np.ix_(keep, keep)]
    return karlin_lambda(joint)


def evalue(score: np.ndarray, m: float, n: float, lam: float, K: float = K_DEFAULT) -> np.ndarray:
    return K * m * n * np.exp(-lam * np.asarray(score, dtype=np.float64))


def bitscore(score: np.ndarray, lam: float, K: float = K_DEFAULT) -> np.ndarray:
    return (lam * np.asarray(score, dtype=np.float64) - math.log(K)) / math.log(2.0)


# ---------------------------------------------------------------------------
# Gapped (lambda, K) by direct simulation with the production kernel
# ---------------------------------------------------------------------------

_EULER = 0.5772156649015329


def fit_gumbel(scores: np.ndarray, m: float, n: float) -> tuple:
    """Method-of-moments Gumbel fit of local-alignment max scores.

    Karlin-Altschul: S_max over an (m, n) random comparison is Gumbel
    with scale 1/lambda and location ln(K m n)/lambda, so
        lambda = pi / (std * sqrt(6)),   K = exp(lambda * mu) / (m n).
    """
    s = np.asarray(scores, dtype=np.float64)
    std = float(s.std())
    if std <= 0:
        return 1e-3, K_DEFAULT
    lam = math.pi / (std * math.sqrt(6.0))
    mu = float(s.mean()) - _EULER / lam
    K = math.exp(lam * mu) / (m * n)
    return lam, K


def _cache_path(key: str) -> str:
    import os
    d = os.path.join(os.path.expanduser("~"), ".cache", "unicore_tpu", "stats")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"gapped_{key}.json")


def _simulate_scores(score_fn, B: int, L: int, seed: int) -> np.ndarray:
    """Null-model pair scores: AA uniform over the 20 letters, 3Di from
    the PUBLISHED state background (matrices.get_3di_background).  The
    3Di background is heavily skewed (one state is ~22%) and mat3di is
    log-odds against it — a uniform 3Di null puts the scoring system in
    the linear phase (chance scores grow linearly with length) and makes
    every fitted E-value meaningless."""
    from unicore_tpu.matrices import get_3di_background

    rng = np.random.RandomState(seed)
    bg3 = get_3di_background()
    qa = rng.randint(0, 20, (B, L)).astype(np.int32)
    qs = rng.choice(20, size=(B, L), p=bg3).astype(np.int32)
    ta = rng.randint(0, 20, (B, L)).astype(np.int32)
    ts = rng.choice(20, size=(B, L), p=bg3).astype(np.int32)
    ln = np.full(B, L, np.int32)
    return np.asarray(score_fn(qa, qs, ta, ts, ln, ln), dtype=np.float64)


def calibrate_gapped(
    score_fn, key: str, B: int = 512, L: int = 128, seed: int = 17,
) -> tuple:
    """Single-length (lambda, K) for GAPPED alignment scores, fitted on
    scores of random uniform-background pairs computed by the production
    kernel itself (`score_fn(qa, qs, ta, ts, qlen, tlen) -> (B,) best`).

    The engine uses the length-aware `calibrate_gapped_lengths` below;
    this single-point variant remains as the primitive/fallback.
    Results are cached on disk per (matrix, weights, gap, window) key —
    the kernel is bit-exact across backends, so the cache is portable.
    """
    import json
    import os

    path = _cache_path(key)
    if os.path.exists(path):
        d = json.load(open(path))
        return d["lambda"], d["K"]
    best = _simulate_scores(score_fn, B, L, seed)
    lam, K = fit_gumbel(best, L, L)
    with open(path, "w") as f:
        json.dump({"lambda": lam, "K": K, "B": B, "L": L, "seed": seed}, f)
    return lam, K


class GappedStats:
    """Length-aware gapped Karlin-Altschul statistics.

    Gapped score distributions converge to their asymptotic Gumbel slowly
    — both the fitted lambda and K drift with sequence length at realistic
    protein lengths (the finite-size effect).  Rather than forcing a
    single (lambda, K) plus a one-parameter edge correction onto data it
    demonstrably misfits, we keep the per-length Gumbel fits
    {L_i: (lambda_i, K_i)} and interpolate both parameters linearly in
    ln(L), clamped at the calibration range ends.  The pair-scale used
    for lookup is the geometric mean of the query length and the mean
    target length, x = sqrt(m * n/n_seqs), so m-vs-database E-values use
    the statistics of comparably-sized comparisons:

        E(S; m, n) = K(x) * m * n * exp(-lambda(x) * S)
    """

    def __init__(self, lengths, lams, Ks):
        order = np.argsort(lengths)
        self.lengths = np.asarray(lengths, dtype=np.float64)[order]
        self.lams = np.asarray(lams, dtype=np.float64)[order]
        self.Ks = np.asarray(Ks, dtype=np.float64)[order]
        self._ln_l = np.log(self.lengths)

    # backward-compatible (lam, K) unpacking: the asymptotic (longest
    # calibrated length) parameters
    def __iter__(self):
        return iter((float(self.lams[-1]), float(self.Ks[-1])))

    @property
    def lam(self) -> float:
        return float(self.lams[-1])

    @property
    def K(self) -> float:
        return float(self.Ks[-1])

    def params_at(self, x: float) -> tuple:
        """(lambda, K) at pair scale x, ln-length interpolated/clamped."""
        lx = math.log(min(max(x, self.lengths[0]), self.lengths[-1]))
        lam = float(np.interp(lx, self._ln_l, self.lams))
        K = math.exp(float(np.interp(lx, self._ln_l, np.log(self.Ks))))
        return lam, K

    def evalue(self, score, m: float, n: float, n_seqs: int = 1) -> np.ndarray:
        x = math.sqrt(max(m, 1.0) * max(n / max(n_seqs, 1), 1.0))
        lam, K = self.params_at(x)
        return K * m * n * np.exp(-lam * np.asarray(score, dtype=np.float64))

    def bits(self, score) -> np.ndarray:
        lam, K = float(self.lams[-1]), float(self.Ks[-1])
        return (lam * np.asarray(score, dtype=np.float64) - math.log(K)) / math.log(2.0)


def fit_gapped_model(samples: dict) -> GappedStats:
    """Per-length Gumbel fits from score samples {L: scores}."""
    lengths, lams, Ks = [], [], []
    for L in sorted(samples):
        lam, K = fit_gumbel(np.asarray(samples[L], dtype=np.float64), L, L)
        lengths.append(float(L))
        lams.append(lam)
        Ks.append(K)
    return GappedStats(lengths, lams, Ks)


def calibrate_gapped_lengths(
    score_fn,
    key: str,
    lengths: tuple = (128, 512, 2048),
    n_samples: tuple = (512, 192, 48),
    seed: int = 17,
) -> GappedStats:
    """Length-aware gapped statistics fitted by simulating the actual
    kernel at several lengths (disk-cached per scoring config; the kernel
    is bit-exact across backends so the cache — and therefore every
    E-value-dependent gate — is backend-independent)."""
    import json
    import os

    path = _cache_path("len3_" + key)
    if os.path.exists(path):
        d = json.load(open(path))
        return GappedStats(d["lengths"], d["lambdas"], d["Ks"])
    samples = {
        L: _simulate_scores(score_fn, B, L, seed + i)
        for i, (L, B) in enumerate(zip(lengths, n_samples))
    }
    gs = fit_gapped_model(samples)
    with open(path, "w") as f:
        json.dump({
            "lengths": gs.lengths.tolist(), "lambdas": gs.lams.tolist(),
            "Ks": gs.Ks.tolist(), "n_samples": list(n_samples),
            "seed": seed,
        }, f)
    return gs


# ---------------------------------------------------------------------------
# empirical pair-score null (fitted on an observed chance-dominated batch)
# ---------------------------------------------------------------------------

class EmpiricalPairNull:
    """Per-length-bin Gumbel null fitted on OBSERVED pairwise scores.

    The simulated null (calibrate_gapped_lengths) samples sequences from
    the model background; whenever the real score population's chance
    distribution deviates from that background — measured config-4: the
    mock 3Di's chance pairs score a median of ~400 where the simulated
    null predicts E~1e-3 at ~half that, i.e. the model tail is optimistic
    by >10 orders of magnitude — model E-values pass chance edges at any
    practical threshold.  This is the round-4 canopy lesson (empirically
    calibrated nulls, cascade._robust_null) applied to gapped SW scores.

    Fit: pairs are binned by ln(sqrt(m*n)) into quantile bins; per bin a
    Gumbel (loc, scale) comes from the 50/75% score quantiles — robust
    to a minority of true homolog pairs (config-4 rep round: 0.8%) since
    both quantiles sit deep inside the chance bulk.  pair_logE returns
    ln P(chance score >= s) ~ -(s - loc)/scale with (loc, scale)
    ln-length interpolated.
    """

    def __init__(self, centers, locs, scales, n_fit):
        self.centers = np.asarray(centers, np.float64)
        self.locs = np.asarray(locs, np.float64)
        self.scales = np.asarray(scales, np.float64)
        self.n_fit = int(n_fit)

    def pair_logE(self, score, qlen, tlen) -> np.ndarray:
        lx = 0.5 * (np.log(np.maximum(qlen, 1.0))
                    + np.log(np.maximum(tlen, 1.0)))
        loc = np.interp(lx, self.centers, self.locs)
        sc = np.interp(lx, self.centers, self.scales)
        return -(np.asarray(score, np.float64) - loc) / sc


def fit_empirical_pair_null(
    scores, qlens, tlens, nbins: int = 12, min_sample: int = 5000,
):
    """Fit an EmpiricalPairNull on a chance-dominated score batch, or
    None when the batch is too small to bin robustly (small fixtures
    fall back to the simulated-model gate alone)."""
    scores = np.asarray(scores, np.float64)
    qlens = np.asarray(qlens, np.float64)
    tlens = np.asarray(tlens, np.float64)
    if scores.size < min_sample:
        return None
    lx = 0.5 * (np.log(np.maximum(qlens, 1.0)) + np.log(np.maximum(tlens, 1.0)))
    nb = max(4, min(nbins, scores.size // 2000))
    edges = np.quantile(lx, np.linspace(0.0, 1.0, nb + 1))
    centers, locs, scales = [], [], []
    for b in range(nb):
        m = (lx >= edges[b]) & ((lx < edges[b + 1]) if b < nb - 1 else (lx <= edges[b + 1]))
        if m.sum() < 200:
            continue
        q50, q75 = np.quantile(scores[m], [0.5, 0.75])
        sc = max((q75 - q50) / 0.8793, 1e-6)   # Gumbel IQR->scale
        locs.append(q50 - 0.3665 * sc)          # median = loc + 0.3665*scale
        scales.append(sc)
        centers.append(0.5 * (edges[b] + edges[b + 1]))
    if len(centers) < 2:
        return None
    return EmpiricalPairNull(centers, locs, scales, scores.size)
