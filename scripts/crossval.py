#!/usr/bin/env python
"""Cross-validate unicore_tpu against the reference toolchain, stage by stage.

BASELINE.json config 1 asks for gene-set/topology agreement with real
unicore+foldseek on `example/data` (pipeline contract easy_core.rs:14-93).
The reference binaries and ProstT5 weights cannot exist in this offline
image, so this harness is the *ready-to-fire* comparison: the moment a
built `unicore` (with its path.cfg pointing at working foldseek/foldmason/
iqtree) and a ProstT5 checkpoint land on the machine, one command produces
the config-1 verdict:

    python scripts/crossval.py \
        --unicore-bin /path/to/unicore \
        --prostt5-weights /path/to/prostt5   # HF dir or foldseek gguf dir \
        [--data /root/reference/example/data] [--workdir /tmp/crossval] \
        [--tree-builder iqtree]

It runs BOTH pipelines end-to-end (easy-core), then diffs every
inter-stage artifact:

  * 3Di strings           — per-sequence identity, keyed by the md5-hash
                            sequence names both toolchains share
                            (createdb.rs:104-106 == modules/createdb.py)
  * clust.tsv             — pairwise co-clustering agreement (Rand index)
                            plus exact partition equality
  * copiness.tsv          — per-gene single/multi-copy percentages
  * core-gene sets        — set equality + Jaccard of profile/*.txt, and
                            per-gene single-copy species membership
  * tree topology         — Robinson-Foulds distance on the final trees

The diff logic is pure and unit-tested self-vs-self and on planted
differences (tests/test_crossval.py) so the harness itself is known-good
before any binaries appear.  `--ours-out / --ref-out` skip the pipeline
runs and diff existing output directories.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from unicore_tpu.io.seqdb import read_db  # noqa: E402
from unicore_tpu.phylo.newick import parse_newick, rf_distance  # noqa: E402


# --------------------------------------------------------------------------
# Stage diffs (pure functions; unit-tested in tests/test_crossval.py)
# --------------------------------------------------------------------------

def load_3di(db_path: str) -> dict:
    """name -> 3Di string from a foldseek-layout db triplet."""
    names = [h.split()[0] for h in read_db(db_path + "_h")]
    ss = read_db(db_path + "_ss")
    return dict(zip(names, ss))


def diff_3di(a: dict, b: dict) -> dict:
    """Per-sequence 3Di agreement over the shared name set."""
    shared = sorted(set(a) & set(b))
    ident = 0
    res_total = res_match = 0
    for n in shared:
        if a[n] == b[n]:
            ident += 1
        la, lb = a[n], b[n]
        m = sum(1 for x, y in zip(la, lb) if x == y)
        res_match += m
        res_total += max(len(la), len(lb))
    return {
        "n_shared": len(shared),
        "n_only_a": len(set(a) - set(b)),
        "n_only_b": len(set(b) - set(a)),
        "n_identical": ident,
        "frac_identical": ident / len(shared) if shared else 0.0,
        "residue_identity": res_match / res_total if res_total else 0.0,
    }


def load_clusters(tsv_path: str) -> dict:
    """rep -> set(members) from a createtsv-format clust.tsv."""
    out: dict = {}
    with open(tsv_path) as f:
        for line in f:
            if not line.strip():
                continue
            rep, mem = line.rstrip("\n").split("\t")[:2]
            out.setdefault(rep, set()).add(mem)
    return out


def diff_clusters(a: dict, b: dict) -> dict:
    """Partition agreement: exact equality of member-set partitions plus
    the Rand index (pairwise co-clustering agreement) over the shared
    element set.  Representative *choice* is allowed to differ (foldseek's
    set-cover rep selection is heuristic); only the grouping matters."""
    part_a = {frozenset(m) for m in a.values()}
    part_b = {frozenset(m) for m in b.values()}
    elems = sorted(set().union(*part_a) & set().union(*part_b)) if a and b else []
    la = {m: i for i, ms in enumerate(a.values()) for m in ms}
    lb = {m: i for i, ms in enumerate(b.values()) for m in ms}
    agree = total = 0
    for i in range(len(elems)):
        for j in range(i + 1, len(elems)):
            x, y = elems[i], elems[j]
            total += 1
            if (la[x] == la[y]) == (lb[x] == lb[y]):
                agree += 1
    return {
        "n_clusters_a": len(part_a),
        "n_clusters_b": len(part_b),
        "partitions_equal": part_a == part_b,
        "rand_index": agree / total if total else 1.0,
    }


def load_copiness(path: str) -> dict:
    """gene -> (multi_pct, single_pct) from copiness.tsv (header line
    'Query\tMultipleCopyPercent\tSingleCopyPercent', profile.rs:32-35)."""
    out = {}
    with open(path) as f:
        for i, line in enumerate(f):
            cols = line.rstrip("\n").split("\t")
            if i == 0 and not _is_float(cols[1] if len(cols) > 1 else ""):
                continue  # header
            if len(cols) >= 3:
                out[cols[0]] = (float(cols[1]), float(cols[2]))
    return out


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def diff_copiness(a: dict, b: dict, tol: float = 1e-9) -> dict:
    shared = set(a) & set(b)
    mismatched = sorted(
        g for g in shared
        if abs(a[g][0] - b[g][0]) > tol or abs(a[g][1] - b[g][1]) > tol
    )
    return {
        "n_shared": len(shared),
        "n_only_a": len(set(a) - set(b)),
        "n_only_b": len(set(b) - set(a)),
        "n_value_mismatch": len(mismatched),
        "value_mismatch_genes": mismatched[:20],
    }


def load_core_genes(profile_dir: str) -> dict:
    """gene display name -> set of (member_gene, species) from profile/*.txt
    (profile.rs:135-144 single-copy members only)."""
    out = {}
    for p in sorted(glob.glob(os.path.join(profile_dir, "*.txt"))):
        name = os.path.splitext(os.path.basename(p))[0]
        members = set()
        with open(p) as f:
            for line in f:
                cols = line.rstrip("\n").split("\t")
                if len(cols) >= 2:
                    members.add((cols[0], cols[1]))
        out[name] = members
    return out


def diff_core_sets(a: dict, b: dict) -> dict:
    sa, sb = set(a), set(b)
    inter, union = sa & sb, sa | sb
    member_mismatch = sorted(g for g in inter if a[g] != b[g])
    return {
        "n_core_a": len(sa),
        "n_core_b": len(sb),
        "set_equal": sa == sb,
        "jaccard": len(inter) / len(union) if union else 1.0,
        "only_a": sorted(sa - sb)[:20],
        "only_b": sorted(sb - sa)[:20],
        "n_member_mismatch": len(member_mismatch),
        "member_mismatch_genes": member_mismatch[:20],
    }


def find_treefile(tree_dir: str) -> str | None:
    for pat in ("iqtree.treefile", "fasttree.nwk", "*.raxml.bestTree",
                "*.treefile", "*.nwk", "*.bestTree"):
        hits = sorted(glob.glob(os.path.join(tree_dir, pat)))
        if hits:
            return hits[0]
    return None


def diff_trees(newick_a: str, newick_b: str) -> dict:
    ta = parse_newick(open(newick_a).read().strip())
    tb = parse_newick(open(newick_b).read().strip())
    leaves_a = sorted(n.name for n in ta.leaves())
    leaves_b = sorted(n.name for n in tb.leaves())
    rf = rf_distance(ta, tb) if leaves_a == leaves_b else None
    n = len(leaves_a)
    max_rf = 2 * max(n - 3, 0)
    return {
        "leaf_sets_equal": leaves_a == leaves_b,
        "n_leaves": n,
        "rf_distance": rf,
        "normalized_rf": (rf / max_rf) if (rf is not None and max_rf) else
                         (0.0 if rf == 0 else None),
        "topology_identical": rf == 0,
    }


# --------------------------------------------------------------------------
# Full-output-directory diff
# --------------------------------------------------------------------------

def diff_outputs(out_a: str, out_b: str) -> dict:
    """Diff two easy-core output directories ({out}/proteome, cluster,
    profile, tree — the layout both toolchains share, easy_core.rs:14-93)."""
    report: dict = {}
    db_a = os.path.join(out_a, "proteome", "proteome_db")
    db_b = os.path.join(out_b, "proteome", "proteome_db")
    if os.path.isfile(db_a + "_ss") and os.path.isfile(db_b + "_ss"):
        report["3di"] = diff_3di(load_3di(db_a), load_3di(db_b))
    tsv_a = os.path.join(out_a, "cluster", "clust.tsv")
    tsv_b = os.path.join(out_b, "cluster", "clust.tsv")
    if os.path.isfile(tsv_a) and os.path.isfile(tsv_b):
        report["clusters"] = diff_clusters(load_clusters(tsv_a), load_clusters(tsv_b))
    cop_a = os.path.join(out_a, "profile", "copiness.tsv")
    cop_b = os.path.join(out_b, "profile", "copiness.tsv")
    if os.path.isfile(cop_a) and os.path.isfile(cop_b):
        report["copiness"] = diff_copiness(load_copiness(cop_a), load_copiness(cop_b))
    if os.path.isdir(os.path.join(out_a, "profile")) and os.path.isdir(os.path.join(out_b, "profile")):
        report["core_genes"] = diff_core_sets(
            load_core_genes(os.path.join(out_a, "profile")),
            load_core_genes(os.path.join(out_b, "profile")),
        )
    ta = find_treefile(os.path.join(out_a, "tree"))
    tb = find_treefile(os.path.join(out_b, "tree"))
    if ta and tb:
        report["tree"] = diff_trees(ta, tb)
    report["verdict"] = {
        "core_gene_sets_identical": report.get("core_genes", {}).get("set_equal"),
        "topology_identical": report.get("tree", {}).get("topology_identical"),
        "config1_pass": bool(
            report.get("core_genes", {}).get("set_equal")
            and report.get("tree", {}).get("topology_identical")
        ),
    }
    return report


# --------------------------------------------------------------------------
# Pipeline runners
# --------------------------------------------------------------------------

def run_reference(unicore_bin: str, data: str, out: str, weights: str,
                  tmp: str, tree_builder: str) -> None:
    cmd = [unicore_bin, "easy-core", data, out, weights, tmp,
           "--tree-builder", tree_builder]
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)


def run_ours(data: str, out: str, model: str, tmp: str, tree_builder: str) -> None:
    cmd = [sys.executable, "-m", "unicore_tpu", "easy-core", data, out, model,
           tmp, "--tree-builder", tree_builder]
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, env=env)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--unicore-bin", default=os.environ.get("UNICORE_BIN"),
                    help="built reference `unicore` binary (path.cfg must "
                         "point at working foldseek/foldmason/iqtree)")
    ap.add_argument("--prostt5-weights", default=os.environ.get("PROSTT5_WEIGHTS"),
                    help="ProstT5 weights for BOTH toolchains (reference "
                         "model dir; ours loads HF/gguf checkpoints from it)")
    ap.add_argument("--data", default="/root/reference/example/data")
    ap.add_argument("--workdir", default="/tmp/crossval")
    ap.add_argument("--tree-builder", default="iqtree")
    ap.add_argument("--ours-model", default=None,
                    help="model arg for our pipeline (defaults to "
                         "--prostt5-weights; 'mock' for format-only runs)")
    ap.add_argument("--ref-out", default=None,
                    help="existing reference output dir (skip running it)")
    ap.add_argument("--ours-out", default=None,
                    help="existing unicore_tpu output dir (skip running it)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    ref_out = args.ref_out
    ours_out = args.ours_out
    os.makedirs(args.workdir, exist_ok=True)

    if ref_out is None:
        if not args.unicore_bin or not os.path.isfile(args.unicore_bin):
            print("crossval: no reference output dir and no --unicore-bin; "
                  "provide one of them (binaries not present in this image)",
                  file=sys.stderr)
            return 2
        ref_out = os.path.join(args.workdir, "ref_out")
        run_reference(args.unicore_bin, args.data, ref_out,
                      args.prostt5_weights or "", os.path.join(args.workdir, "ref_tmp"),
                      args.tree_builder)
    if ours_out is None:
        ours_out = os.path.join(args.workdir, "ours_out")
        model = args.ours_model or args.prostt5_weights or "mock"
        run_ours(args.data, ours_out, model, os.path.join(args.workdir, "ours_tmp"),
                 args.tree_builder)

    report = diff_outputs(ref_out, ours_out)
    text = json.dumps(report, indent=2)
    print(text)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(text + "\n")
    return 0 if report["verdict"]["config1_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
