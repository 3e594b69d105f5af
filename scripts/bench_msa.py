"""MSA throughput: progressive 3Di+AA alignment, batched across genes.

Measures align_many on a synthetic gene set (the tree stage's hot loop,
tree.rs:166-231): merge-round NW cells/sec plus the wall split between
guide stage, merges, and refinement.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_msa.py \
         [n_genes n_taxa L refine_iters]
CPU:  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python -u scripts/bench_msa.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_genes = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_taxa = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    refine = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    import jax
    from unicore_tpu.msa.progressive import ProgressiveMSA
    from unicore_tpu.runtime import profiling

    rng = np.random.RandomState(1)
    AA = np.array(list("ARNDCQEGHILKMFPSTWYV"))
    TDI = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    genes = []
    for g in range(n_genes):
        base_a = rng.choice(AA, L)
        base_s = rng.choice(TDI, L)
        names, seqs, sss = [], [], []
        for t in range(n_taxa):
            a, s = base_a.copy(), base_s.copy()
            m = rng.rand(L) < 0.2
            a[m] = rng.choice(AA, int(m.sum()))
            s[m] = rng.choice(TDI, int(m.sum()))
            names.append(f"t{t}")
            seqs.append("".join(a))
            sss.append("".join(s))
        genes.append((names, seqs, sss))

    eng = ProgressiveMSA(mode="3di+aa", refine_iters=refine)
    # warm (compiles)
    eng.align_many(genes[:2])
    c0 = dict(profiling.get_counters())
    t0 = time.time()
    out = eng.align_many(genes)
    wall = time.time() - t0
    c1 = profiling.get_counters()
    cells = c1.get("msa.cells", 0) - c0.get("msa.cells", 0)
    print(f"platform={jax.devices()[0].platform} genes={n_genes} "
          f"taxa={n_taxa} L={L} refine={refine}")
    print(f"wall={wall:.2f}s  NW cells={cells / 1e6:.1f}M  "
          f"cells/s={cells / wall / 1e6:.1f}M/s  "
          f"genes/s={n_genes / wall:.2f}")
    assert all(len(o) == n_taxa for o in out)


if __name__ == "__main__":
    main()
