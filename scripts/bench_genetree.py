#!/usr/bin/env python
"""Gene-tree batching benchmark: wall-clock vs gene count, batched
(TreeEngine.infer_batched: shared compiles + lockstep NNI) against the
solo per-gene loop (one infer per gene, the genetree.rs:113-143 shape).

Usage: python scripts/bench_genetree.py [n_genes ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", os.environ.get("BENCH_PLATFORM", "cpu"))

import numpy as np  # noqa: E402

from unicore_tpu.phylo.engine import TreeEngine  # noqa: E402


def gene_msa(rng, n_taxa, L, mut=0.25):
    letters = np.array(list("ARNDCQEGHILKMFPSTWYV"))
    msa = {}
    prev = rng.choice(letters, L)
    for t in range(n_taxa):
        s = prev.copy()
        m = rng.rand(L) < mut
        s[m] = rng.choice(letters, int(m.sum()))
        msa[f"sp{t}"] = "".join(s)
        prev = s
    return msa


def make_genes(n_genes, seed=0):
    rng = np.random.RandomState(seed)
    genes = []
    for g in range(n_genes):
        n_taxa = int(rng.choice([5, 6, 8, 10]))
        L = int(rng.choice([60, 90, 120, 180]))
        genes.append(gene_msa(rng, n_taxa, L))
    return genes


def main():
    counts = [int(a) for a in sys.argv[1:]] or [10, 25, 50]
    eng = TreeEngine("fasttree")
    opts = "-gamma"
    print(f"platform={jax.devices()[0].platform}")
    for n in counts:
        genes = make_genes(n)
        t0 = time.time()
        eng.infer_batched(genes, options=opts)
        tb = time.time() - t0
        t0 = time.time()
        for msa in genes:
            eng.infer(msa, options=opts)
        ts = time.time() - t0
        print(f"n_genes={n:4d}  batched={tb:7.1f}s  solo={ts:7.1f}s  "
              f"speedup={ts / tb:5.2f}x  batched_per_gene={tb / n:6.2f}s")


if __name__ == "__main__":
    main()
