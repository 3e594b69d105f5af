"""RELL / UFBoot-style bootstrap supports on the MXU.

IQ-TREE's ultrafast bootstrap evaluates a candidate tree set on
bootstrap-resampled site likelihoods.  TPU-native formulation: with
per-pattern log-likelihood vectors for T candidate trees stacked as
(T, P) and R multinomial weight columns (P, R), per-replicate tree
scores are ONE matmul (T, P) @ (P, R); the per-replicate winner is an
argmax down the T axis.  Support of a bipartition in the ML tree =
fraction of replicates won by a tree containing it.

Contract: `-B 1000` (iqtree), `-boot 1000` (fasttree), `--all`
(raxml-ng) — tree.rs:143-146.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from unicore_tpu.phylo.newick import Node, bipartitions


def bootstrap_weights(
    pattern_weights: np.ndarray, n_reps: int, seed: int = 12345
) -> np.ndarray:
    """(P, R) multinomial resample counts with n = total sites."""
    rng = np.random.RandomState(seed)
    L = int(round(pattern_weights.sum()))
    probs = pattern_weights / pattern_weights.sum()
    out = rng.multinomial(L, probs, size=n_reps).T.astype(np.float32)  # (P, R)
    return out


def rell_supports(
    final_tree: Node,
    candidate_trees: Sequence[Node],
    site_logliks: np.ndarray,  # (T, P)
    pattern_weights: np.ndarray,  # (P,)
    n_reps: int = 1000,
    seed: int = 12345,
) -> Node:
    """Annotate the final tree's internal nodes with bootstrap supports."""
    import jax.numpy as jnp

    T, P = site_logliks.shape
    W = bootstrap_weights(pattern_weights, n_reps, seed)  # (P, R)
    scores = np.asarray(jnp.asarray(site_logliks, jnp.float32) @ jnp.asarray(W))  # (T, R)
    winners = np.argmax(scores, axis=0)  # (R,)

    cand_biparts = [set(bipartitions(t).keys()) for t in candidate_trees]
    final_bp = bipartitions(final_tree)
    for bp, node in final_bp.items():
        present = np.array([bp in cand_biparts[t] for t in range(T)])
        support = 100.0 * present[winners].mean()
        node.support = support
    return final_tree
