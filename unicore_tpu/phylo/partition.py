"""Partitioned-model likelihood (IQ-TREE `-p partitions` equivalent).

The reference emits a RAxML-style partition file next to the supermatrix
(combine_fasta.rs:93, README.md:214-230 documents `iqtree -p` usage).
This engine implements the edge-linked partition model: all partitions
share the tree topology and branch lengths, while each partition gets
its own empirical AA frequencies (and therefore its own rate matrix /
eigenbasis) and gamma/invariant mixture built from a shared alpha.

TPU-native formulation: per-partition tensors are padded to a common
pattern count and STACKED, and the single-alignment likelihood core
(`_loglik_core`) is `vmap`-ed over the partition axis inside a
`lax.map` over fixed-size partition chunks (bounding CLV memory to
chunk_size x (2n-1, C, Pmax, 20)).  Branch-length optimization autodiffs
through the whole stack in one jit.

Duck-types LikelihoodEngine (loglik / loglik_batch / optimize_blens /
site_loglik / set_model / names / weights), so TreeSearch and the RELL
bootstrap work unchanged.
"""

from __future__ import annotations

import functools
import re
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unicore_tpu.phylo.likelihood import (
    _loglik_core,
    compress_patterns,
    empirical_frequencies,
    msa_to_codes,
)
from unicore_tpu.phylo.models import ModelSpec, SubstModel


def parse_partition_file(path: str) -> List[Tuple[str, int, int]]:
    """RAxML-style lines: "MODEL, name = start-end" (1-based inclusive)."""
    parts: List[Tuple[str, int, int]] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            m = re.match(r"[^,]+,\s*(\S+)\s*=\s*(\d+)\s*-\s*(\d+)", line)
            if m:
                parts.append((m.group(1), int(m.group(2)), int(m.group(3))))
    return parts


PART_CHUNK = 8  # partitions evaluated concurrently (CLV memory bound)


def _pad_chunks(n: int, chunk: int) -> int:
    return ((n + chunk - 1) // chunk) * chunk


@functools.partial(jax.jit, static_argnames=("n_taxa",))
def _part_loglik_impl(
    children, blens, tips_s, w_s, eig_s, U_s, Uinv_s, pi_s, rates_s, props_s, n_taxa
):
    """Sum of per-partition log-likelihoods; leading dim = partition chunks."""

    def chunk_ll(args):
        tips, w, eig, U, Uinv, pi, rates, props = args
        f = jax.vmap(
            lambda t, wt, e, u, ui, p, r, pr: _loglik_core(
                children, blens, t, wt, e, u, ui, p, r, pr, n_taxa
            )
        )
        return jnp.sum(f(tips, w, eig, U, Uinv, pi, rates, props))

    per_chunk = jax.lax.map(chunk_ll, (tips_s, w_s, eig_s, U_s, Uinv_s, pi_s, rates_s, props_s))
    return jnp.sum(per_chunk)


@functools.partial(jax.jit, static_argnames=("n_taxa", "steps"))
def _part_optimize_seg(
    children, carry, tips_s, w_s, eig_s, U_s, Uinv_s, pi_s, rates_s, props_s,
    n_taxa, steps, lr=0.05,
):
    """One bounded SEGMENT of the partitioned adam loop (split exactly
    like likelihood._optimize_blens_seg — a single whole-loop execution
    at supermatrix scale exceeded the dev-tunnel worker's per-execution
    walltime and crashed it; splitting a scan at step boundaries is
    mathematically identical)."""
    import optax

    def negll(xx):
        return -_part_loglik_impl(
            children, jnp.exp(xx), tips_s, w_s, eig_s, U_s, Uinv_s, pi_s,
            rates_s, props_s, n_taxa,
        )

    opt = optax.adam(lr)

    def step(carry, _):
        x, state, best_x, best_v = carry
        v, g = jax.value_and_grad(negll)(x)
        better = v < best_v
        best_x = jnp.where(better, x, best_x)
        best_v = jnp.where(better, v, best_v)
        updates, state = opt.update(g, state)
        x = optax.apply_updates(x, updates)
        return (x, state, best_x, best_v), None

    carry, _ = jax.lax.scan(step, carry, None, length=steps)
    return carry


@functools.partial(jax.jit, static_argnames=("n_taxa",))
def _part_optimize_finish(
    children, carry, tips_s, w_s, eig_s, U_s, Uinv_s, pi_s, rates_s, props_s,
    n_taxa,
):
    def negll(xx):
        return -_part_loglik_impl(
            children, jnp.exp(xx), tips_s, w_s, eig_s, U_s, Uinv_s, pi_s,
            rates_s, props_s, n_taxa,
        )

    x, _, best_x, best_v = carry
    v_final = negll(x)
    better = v_final < best_v
    best_x = jnp.where(better, x, best_x)
    best_v = jnp.where(better, v_final, best_v)
    return jnp.exp(best_x), -best_v


def _part_optimize_impl(
    children, blens0, tips_s, w_s, eig_s, U_s, Uinv_s, pi_s, rates_s, props_s,
    n_taxa, steps, lr=0.05,
):
    import os

    import optax

    from unicore_tpu.phylo.likelihood import BLEN_SEG_STEPS

    x0 = jnp.log(jnp.clip(blens0, 1e-7, None))
    carry = (x0, optax.adam(lr).init(x0), x0,
             jnp.asarray(jnp.inf, jnp.float32))
    seg = int(os.environ.get("UNICORE_TPU_BLEN_SEG", BLEN_SEG_STEPS))
    args = (tips_s, w_s, eig_s, U_s, Uinv_s, pi_s, rates_s, props_s)
    done = 0
    while done < steps:
        k = min(seg, steps - done)
        carry = _part_optimize_seg(
            children, carry, *args, n_taxa=n_taxa, steps=k, lr=lr)
        done += k
    return _part_optimize_finish(children, carry, *args, n_taxa=n_taxa)


class PartitionedLikelihoodEngine:
    """Edge-linked partitioned likelihood over a shared topology."""

    def __init__(
        self,
        names: List[str],
        seqs: List[str],
        partitions: Sequence[Tuple[str, int, int]],
        spec: Optional[ModelSpec] = None,
        alpha: float = 1.0,
        p_inv: float = 0.0,
    ):
        self.names = list(names)
        self.n = len(names)
        self.spec = spec or ModelSpec.parse("JTT+F+G")
        codes_full = msa_to_codes(names, seqs)
        self.L = codes_full.shape[1]

        self._parts = []
        for (pname, start, end) in partitions:
            codes = codes_full[:, start - 1 : end]
            patterns, weights = compress_patterns(codes)
            freqs = empirical_frequencies(codes)
            self._parts.append(
                {"name": pname, "patterns": patterns, "weights": weights, "freqs": freqs}
            )
        self.G = len(self._parts)
        self.Pmax = max(p["patterns"].shape[1] for p in self._parts)

        # stacked, padded tips/weights (padding weight 0 => no contribution)
        G_pad = _pad_chunks(self.G, PART_CHUNK)
        tips = np.zeros((G_pad, self.n, self.Pmax, 20), np.float32)
        tips[:, :, :, :] = 1.0  # padded patterns behave as all-gap columns
        w = np.zeros((G_pad, self.Pmax), np.float32)
        for g, part in enumerate(self._parts):
            P = part["patterns"].shape[1]
            t = np.zeros((self.n, P, 20), np.float32)
            for i in range(self.n):
                col = part["patterns"][i]
                known = col < 20
                t[i, known, col[known]] = 1.0
                t[i, ~known, :] = 1.0
            tips[g, :, :P, :] = t
            w[g, :P] = part["weights"]
        n_chunks = G_pad // PART_CHUNK
        self._tips = jnp.asarray(tips.reshape(n_chunks, PART_CHUNK, self.n, self.Pmax, 20))
        self._w = jnp.asarray(w.reshape(n_chunks, PART_CHUNK, self.Pmax))
        self._G_pad = G_pad

        # concatenated weights over real partitions (for the bootstrap)
        self.weights = np.concatenate([p["weights"] for p in self._parts])
        self.alpha = alpha
        self.p_inv = p_inv
        self._build_models(alpha, p_inv)

    # ------------------------------------------------------------------
    def _build_models(self, alpha: float, p_inv: float) -> None:
        self.alpha, self.p_inv = alpha, p_inv
        eigs, Us, Uinvs, pis, rates_l, props_l = [], [], [], [], [], []
        for part in self._parts:
            m = SubstModel.build(
                self.spec, empirical_freqs=part["freqs"], alpha=alpha, p_inv=p_inv
            )
            r, pr = m.rates_and_props()
            eigs.append(m.eigvals)
            Us.append(m.U)
            Uinvs.append(m.Uinv)
            pis.append(m.pi)
            rates_l.append(r)
            props_l.append(pr)
        # pad to G_pad with copies of the first (weight-0 patterns anyway)
        while len(eigs) < self._G_pad:
            eigs.append(eigs[0]); Us.append(Us[0]); Uinvs.append(Uinvs[0])
            pis.append(pis[0]); rates_l.append(rates_l[0]); props_l.append(props_l[0])
        n_chunks = self._G_pad // PART_CHUNK

        def stack(xs):
            a = np.stack(xs).astype(np.float32)
            return jnp.asarray(a.reshape((n_chunks, PART_CHUNK) + a.shape[1:]))

        self._mp = dict(
            eig_s=stack(eigs), U_s=stack(Us), Uinv_s=stack(Uinvs),
            pi_s=stack(pis), rates_s=stack(rates_l), props_s=stack(props_l),
        )
        # model handle for TreeEngine._optimize_model compatibility
        self.model = SubstModel.build(
            self.spec, empirical_freqs=self._parts[0]["freqs"], alpha=alpha, p_inv=p_inv
        )

    def set_model(self, model: SubstModel) -> None:
        """Shared-parameter update (alpha / p_inv) across partitions."""
        self._build_models(model.alpha, model.p_inv)

    # ------------------------------------------------------------------
    def loglik(self, children: np.ndarray, blens: np.ndarray) -> float:
        return float(
            _part_loglik_impl(
                jnp.asarray(children), jnp.asarray(blens, jnp.float32),
                self._tips, self._w, n_taxa=self.n, **self._mp,
            )
        )

    def loglik_batch(self, children_batch, blens_batch, chunk: int = 4) -> np.ndarray:
        out = []
        for c, b in zip(children_batch, blens_batch):
            out.append(self.loglik(c, b))
        return np.asarray(out)

    def optimize_blens(self, children, blens, steps: int = 150, lr: float = 0.05):
        b_opt, ll = _part_optimize_impl(
            jnp.asarray(children), jnp.asarray(blens, jnp.float32),
            self._tips, self._w, n_taxa=self.n, steps=steps, **self._mp,
        )
        out = np.asarray(b_opt, dtype=np.float64)
        out[2 * self.n - 2] = 0.0
        return out, float(ll)

    def site_loglik(self, children, blens) -> np.ndarray:
        """Concatenated per-pattern log-likelihoods over real partitions."""
        from unicore_tpu.phylo.likelihood import _site_loglik

        outs = []
        for g, part in enumerate(self._parts):
            ci, cj = divmod(g, PART_CHUNK)
            P = part["patterns"].shape[1]
            # evaluate at the padded width (one compiled shape), slice after
            sl = _site_loglik(
                jnp.asarray(children), jnp.asarray(blens, jnp.float32),
                self._tips[ci, cj],
                eigvals=self._mp["eig_s"][ci, cj],
                U=self._mp["U_s"][ci, cj],
                Uinv=self._mp["Uinv_s"][ci, cj],
                pi=self._mp["pi_s"][ci, cj],
                rates=self._mp["rates_s"][ci, cj],
                props=self._mp["props_s"][ci, cj],
                n_taxa=self.n,
            )
            outs.append(np.asarray(sl)[:P])
        return np.concatenate(outs)
