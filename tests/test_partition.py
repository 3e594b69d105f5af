"""Partitioned-model likelihood tests (iqtree -p equivalent)."""

import numpy as np
import pytest

from unicore_tpu.phylo.likelihood import LikelihoodEngine, tree_to_arrays
from unicore_tpu.phylo.models import ModelSpec, SubstModel
from unicore_tpu.phylo.newick import parse_newick
from unicore_tpu.phylo.partition import (
    PartitionedLikelihoodEngine,
    parse_partition_file,
)

MSA = {
    "t1": "ACDEFGHIKLMNPQRSTVWYACDEFGHIKL",
    "t2": "ACDEFGHIKLMNPQRSTVWFACDEFGHIKW",
    "t3": "ACDEYGHIKLMNPQRSTVWYACDQFGHIKL",
    "t4": "ACDEYGHIKTMNPQRSTVWYACDEFGHIRL",
}


def test_parse_partition_file(tmp_path):
    p = tmp_path / "parts"
    p.write_text("JTT+F+I+G, gene1=1-20\nJTT+F+I+G, gene2 = 21-30\n")
    assert parse_partition_file(str(p)) == [("gene1", 1, 20), ("gene2", 21, 30)]


def test_single_partition_matches_unpartitioned():
    names = list(MSA.keys())
    seqs = [MSA[n] for n in names]
    spec = ModelSpec.parse("JTT+F+G")

    from unicore_tpu.phylo.likelihood import empirical_frequencies, msa_to_codes
    codes = msa_to_codes(names, seqs)
    model = SubstModel.build(spec, empirical_freqs=empirical_frequencies(codes), alpha=0.8)
    single = LikelihoodEngine(names, seqs, model)

    part = PartitionedLikelihoodEngine(
        names, seqs, [("all", 1, len(seqs[0]))], spec=spec, alpha=0.8
    )

    t = parse_newick("((t1:0.1,t2:0.2):0.05,(t3:0.15,t4:0.1):0.07);")
    children, blens = tree_to_arrays(t, names)
    assert part.loglik(children, blens) == pytest.approx(
        single.loglik(children, blens), abs=0.02
    )


def test_two_partitions_sum():
    """lnL over two partitions == sum of per-partition single-engine lnLs."""
    names = list(MSA.keys())
    seqs = [MSA[n] for n in names]
    spec = ModelSpec.parse("JTT+F")
    L = len(seqs[0])
    half = L // 2

    part = PartitionedLikelihoodEngine(
        names, seqs, [("g1", 1, half), ("g2", half + 1, L)], spec=spec
    )
    t = parse_newick("((t1:0.1,t2:0.2):0.05,(t3:0.15,t4:0.1):0.07);")
    children, blens = tree_to_arrays(t, names)

    from unicore_tpu.phylo.likelihood import empirical_frequencies, msa_to_codes
    total = 0.0
    for s0, s1 in ((0, half), (half, L)):
        sub = [s[s0:s1] for s in seqs]
        codes = msa_to_codes(names, sub)
        m = SubstModel.build(spec, empirical_freqs=empirical_frequencies(codes))
        total += LikelihoodEngine(names, sub, m).loglik(children, blens)
    assert part.loglik(children, blens) == pytest.approx(total, abs=0.05)

    # site_loglik covers all sites' patterns
    sl = part.site_loglik(children, blens)
    assert sl.shape[0] == len(part.weights)
    assert float(np.dot(sl, part.weights)) == pytest.approx(total, abs=0.05)


def test_partitioned_optimize_improves():
    names = list(MSA.keys())
    seqs = [MSA[n] for n in names]
    part = PartitionedLikelihoodEngine(
        names, seqs, [("g1", 1, 15), ("g2", 16, 30)], spec=ModelSpec.parse("JTT+F")
    )
    t = parse_newick("((t1:0.5,t2:0.5):0.5,(t3:0.5,t4:0.5):0.5);")
    children, blens = tree_to_arrays(t, names)
    ll0 = part.loglik(children, blens)
    b1, ll1 = part.optimize_blens(children, blens, steps=80)
    assert ll1 >= ll0


def test_tree_engine_with_partition_file(tmp_path):
    from unicore_tpu.phylo.engine import TreeEngine

    pfile = tmp_path / "combined.fasta.partitions"
    pfile.write_text("JTT+F+I+G, gene1=1-15\nJTT+F+I+G, gene2=16-30\n")
    eng = TreeEngine(schedule="iqtree")
    tree, ll, info = eng.infer(
        MSA, options=f"-m JTT+F+G -p {pfile}", n_boot=10, blen_steps=60,
    )
    assert info["n_partitions"] == 2
    assert sorted(l.name for l in tree.leaves()) == sorted(MSA)
