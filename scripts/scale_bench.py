"""Large-N clustering scale proof (VERDICT #5 / BASELINE config 3).

Generates a synthetic database of F families x M members (mutated from
family bases, with indels), runs the production clustering path
(cascade above 5,000 seqs: canopy matmul -> ungapped rescore -> SW
verify -> representative round), and reports wall-clock, throughput,
peak RSS, cell counters, and cluster purity vs the known families.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/scale_bench.py [n_seqs]
"""

from __future__ import annotations

import json
import resource
import sys
import time

import numpy as np


def synth_db(n_seqs: int, members: int = 10, seed: int = 13):
    from unicore_tpu.io.seqdb import SeqDB

    rng = np.random.RandomState(seed)
    AA = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    TDI = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    names, aa, ss, fam_of = [], [], [], []
    fam = 0
    while len(names) < n_seqs:
        # ~2% long families (1.2k-3k residues) exercise the banded SW
        # path (ops/banded.py) at scale; the rest are typical lengths
        if rng.rand() < 0.02:
            L = int(rng.randint(1200, 3000))
        else:
            L = int(rng.randint(80, 350))
        base_aa = rng.choice(AA, L)
        base_ss = rng.choice(TDI, L)
        for m in range(members):
            if len(names) >= n_seqs:
                break
            a, s = base_aa.copy(), base_ss.copy()
            nmut = max(1, int(0.08 * L))
            pos = rng.randint(0, L, nmut)
            a[pos] = rng.choice(AA, nmut)
            s[pos[: nmut // 2]] = rng.choice(TDI, nmut // 2)
            if m % 3 == 1:  # small indel
                cut = rng.randint(0, L - 5)
                a = np.delete(a, slice(cut, cut + 3))
                s = np.delete(s, slice(cut, cut + 3))
            names.append(f"f{fam}_m{m}")
            fam_of.append(fam)
            aa.append(a.tobytes().decode())
            ss.append(s.tobytes().decode())
        fam += 1
    return SeqDB(names=names, aa_seqs=aa, ss_seqs=ss), np.array(fam_of)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    from unicore_tpu.align.engine import AlignParams
    from unicore_tpu.modules.cluster import cluster_db
    from unicore_tpu.runtime import profiling

    t0 = time.time()
    db, fam_of = synth_db(n)
    gen_s = time.time() - t0
    print(f"generated {len(db)} seqs ({gen_s:.1f}s)", file=sys.stderr)

    t0 = time.time()
    clusters, _ = cluster_db(db, AlignParams())
    wall = time.time() - t0

    # purity: clusters whose members all share one true family
    pure = sum(
        1 for ms in clusters.values()
        if len({fam_of[m] for m in ms}) == 1
    )
    # recall-ish: fraction of sequences co-clustered with their family rep
    nfam = int(fam_of.max()) + 1
    counters = profiling.get_counters()
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(json.dumps({
        "metric": "cluster_scale",
        "n_seqs": len(db),
        "n_families": nfam,
        "n_clusters": len(clusters),
        "purity": round(pure / max(len(clusters), 1), 4),
        "wall_s": round(wall, 1),
        "seqs_per_s": round(len(db) / wall, 1),
        "peak_rss_mb": round(peak_mb),
        "counters": {k: round(v, 1) for k, v in counters.items()},
    }))


if __name__ == "__main__":
    main()
