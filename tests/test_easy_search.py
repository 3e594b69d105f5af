"""easy-search workflow on synthetic data: proteomes vs a reference
core-structure DB, m8-driven profiling, tree."""

import numpy as np

from unicore_tpu.cli import build_parser, resolve
from unicore_tpu.io.seqdb import SeqDB
from unicore_tpu.workflow import easy_search


def _family(rng, n, L=60):
    letters = "ARNDCQEGHILKMFPSTWYV"
    base = rng.choice(list(letters), L)
    out = []
    for _ in range(n):
        s = base.copy()
        for _ in range(2):
            s[rng.randint(L)] = rng.choice(list(letters))
        out.append("".join(s))
    return out


def test_easy_search_workflow(tmp_path):
    rng = np.random.RandomState(5)
    from unicore_tpu.models.mock import MockProstT5

    # three gene families, one copy per species
    fams = [_family(rng, 4) for _ in range(3)]
    species = [f"spec{i}" for i in range(4)]
    ind = tmp_path / "in"
    ind.mkdir()
    for si, sp in enumerate(species):
        with open(ind / f"{sp}.fa", "w") as f:
            for gi, fam in enumerate(fams):
                f.write(f">gene{gi}_{sp}\n{fam[si]}\n")

    # reference DB: one representative per family (the foldseek query side)
    ref_aa = [fam[0] for fam in fams]
    ref_ss = MockProstT5().predict(ref_aa)
    ref_names = [f"AF-REF{gi}-F1" for gi in range(3)]
    ref_db = tmp_path / "ref_db"
    SeqDB(names=ref_names, aa_seqs=ref_aa, ss_seqs=ref_ss).write(str(ref_db))

    out = tmp_path / "out"
    ns = build_parser().parse_args(
        [
            "easy-search", str(ind), str(ref_db), str(out), "mock", str(tmp_path / "tmp"),
            "--tree-builder", "fasttree",
            "--tree-options=-gamma -boot 10",
            "-s", "-c 0.8 -e 10",
        ]
    )
    easy_search.run(resolve(ns))

    # m8 grouped by reference gene
    m8 = (out / "search" / "search.m8").read_text().splitlines()
    assert m8
    assert all(r.split("\t")[0].startswith("AF-REF") for r in m8)

    # profile: display names come from the AFDB '-'-split (REFn)
    prof = out / "profile"
    gene_lists = sorted(p.name for p in prof.glob("*.txt"))
    assert gene_lists == ["REF0.txt", "REF1.txt", "REF2.txt"], gene_lists

    # tree over the 4 species
    from unicore_tpu.phylo.newick import parse_newick
    t = parse_newick((out / "tree" / "fasttree.nwk").read_text())
    assert sorted(l.name for l in t.leaves()) == species
