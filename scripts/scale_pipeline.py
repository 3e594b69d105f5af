"""Config-4 full-pipeline scale proof (BASELINE config 4), resumable.

Generates a ~100-proteome synthetic dataset evolved along a KNOWN
random species tree (so the final topology is checkable), then drives
the COMPLETE pipeline — createdb -> cluster -> profile -> tree
(easy_core.rs:14-93 shape) — in checkpointed phases, each in its OWN
subprocess (the dev-tunnel RSS-recycling pattern of scale_bench.py):

    gen -> createdb (CLI) -> canopy -> verify 0..K -> reps (clust.tsv)
        -> profile (CLI) -> tree (CLI) -> report

Every phase is skipped on rerun when its output exists, so an
interrupted run resumes.  The report validates:
  * cluster purity against the generating families
  * core-gene count (single-copy >= 80% species contract)
  * Robinson-Foulds distance of the inferred species tree vs the TRUE
    generating tree (the end-to-end correctness signal config 4 exists
    for)
and records per-phase wall / peak RSS.

Run:  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/scale_pipeline.py [--species 100] [--families 380] \
          [--workdir /tmp/scale_pipe]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

VERIFY_CHUNK = 6000


def _peak_mb() -> int:
    return int(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)


# ---------------------------------------------------------------------------
# dataset: species tree + families evolved along it
# ---------------------------------------------------------------------------

def _random_species_tree(n: int, rng) -> tuple:
    """Random coalescent-ish tree: ((newick, leaves), node list)."""
    nodes = [(f"s{i:03d}", 0.0, None, None) for i in range(n)]  # name, h, l, r
    active = list(range(n))
    store = list(nodes)
    h = 0.0
    while len(active) > 1:
        # coalescent-rate waiting times keep the TOTAL tree height at
        # ~0.7 expected substitutions/site regardless of n (a naive
        # fixed-rate join schedule grows the height ~ln(n) and saturates
        # every family into unalignability at 100 species)
        k = len(active)
        h += rng.exponential(0.35 * 2.0 / (k * (k - 1)))
        i = active.pop(rng.randint(len(active)))
        j = active.pop(rng.randint(len(active)))
        store.append((None, h, i, j))
        active.append(len(store) - 1)
    return store, active[0]


def _tree_to_newick(store, root) -> str:
    def rec(k, parent_h):
        name, hh, l, r = store[k]
        bl = max(parent_h - hh, 1e-4) if parent_h is not None else 0.0
        if l is None:
            return f"{name}:{bl:.5f}"
        return f"({rec(l, hh)},{rec(r, hh)}):{bl:.5f}"
    name, hh, l, r = store[root]
    return f"({rec(l, hh)},{rec(r, hh)});"


def phase_gen(work: str, n_species: int, n_families: int, seed: int = 7) -> None:
    from unicore_tpu.matrices import BLOSUM62

    rng = np.random.RandomState(seed)
    AA = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    LUT = np.zeros(256, np.int64)
    for _c, _b in enumerate(AA):
        LUT[_b] = _c
    # BLOSUM-conditioned substitution kernel (conservative mutations)
    Bm = BLOSUM62[:20, :20].astype(float)
    P = np.exp(Bm / 2.0)
    np.fill_diagonal(P, 0)
    P /= P.sum(1, keepdims=True)
    cum = np.cumsum(P, axis=1)

    store, root = _random_species_tree(n_species, rng)
    with open(os.path.join(work, "true_tree.nwk"), "w") as f:
        f.write(_tree_to_newick(store, root))

    # per-species sequence dict
    per_species = {f"s{i:03d}": [] for i in range(n_species)}

    def evolve(seq, t):
        """Mutate along a branch of length t (expected t subs/site)."""
        p = 1.0 - np.exp(-t)
        m = rng.rand(len(seq)) < p
        idx = np.nonzero(m)[0]
        if len(idx):
            codes = LUT[seq[idx]]
            r = rng.rand(len(idx), 1)
            new = (r < cum[codes]).argmax(axis=1)
            seq = seq.copy()
            seq[idx] = AA[new]
        # occasional small indel
        if len(seq) > 40 and rng.rand() < min(0.5, t * 3):
            cut = rng.randint(0, len(seq) - 6)
            ln = rng.randint(1, 6)
            if rng.rand() < 0.5:
                seq = np.delete(seq, slice(cut, cut + ln))
            else:
                seq = np.insert(seq, cut, rng.choice(AA, ln))
        return seq

    for fam in range(n_families):
        L = int(np.clip(rng.lognormal(5.4, 0.45), 80, 1800))
        rate = rng.uniform(0.5, 1.4)  # family-specific rate multiplier
        root_seq = rng.choice(AA, L)
        # DFS down the species tree
        stack = [(root, root_seq, store[root][1])]
        while stack:
            k, seq, parent_h = stack.pop()
            name, hh, l, r = store[k]
            if l is None:
                u = rng.rand()
                if u < 0.05:
                    continue  # gene loss in this species
                per_species[name].append((fam, seq))
                if u > 0.97:  # duplication -> multi-copy (excluded from core)
                    per_species[name].append((fam, evolve(seq, 0.1 * rate)))
                continue
            for child in (l, r):
                bl = max(parent_h - store[child][1], 1e-4)
                stack.append((child, evolve(seq, bl * rate), store[child][1]))

    ind = os.path.join(work, "in")
    os.makedirs(ind, exist_ok=True)
    n_seqs = 0
    for sp, genes in per_species.items():
        with open(os.path.join(ind, f"{sp}.fa"), "w") as f:
            for k, (fam, seq) in enumerate(genes):
                f.write(f">fam{fam:04d}_{sp}_{k}\n{seq.tobytes().decode()}\n")
                n_seqs += 1
    print(json.dumps({"phase": "gen", "n_species": n_species,
                      "n_families": n_families, "n_seqs": n_seqs,
                      "peak_rss_mb": _peak_mb()}))


# ---------------------------------------------------------------------------
# cluster phases (scale_bench pattern, operating on the createdb SeqDB)
# ---------------------------------------------------------------------------

def _load_db(work):
    from unicore_tpu.io.seqdb import SeqDB
    return SeqDB.read(os.path.join(work, "out", "proteome", "proteome_db"))


def phase_canopy(work: str) -> None:
    from unicore_tpu.align.cascade import build_verify_pairs, canopy_assign
    from unicore_tpu.align.engine import AlignParams

    db = _load_db(work)
    t0 = time.time()
    reps, cand = canopy_assign(db.aa_seqs, db.ss_seqs,
                               coverage=AlignParams().coverage)
    pairs = build_verify_pairs(cand)
    with open(os.path.join(work, "canopy.json"), "w") as f:
        json.dump({"reps": reps,
                   "cand": {str(k): v for k, v in cand.items()},
                   "n_pairs": len(pairs)}, f)
    print(json.dumps({"phase": "canopy", "n_reps": len(reps),
                      "n_pairs": len(pairs),
                      "wall_s": round(time.time() - t0, 1),
                      "peak_rss_mb": _peak_mb()}))


def phase_verify(work: str, chunk_id: int) -> None:
    from unicore_tpu.align.cascade import build_verify_pairs, verify_chunk
    from unicore_tpu.align.engine import AlignParams

    db = _load_db(work)
    c = json.load(open(os.path.join(work, "canopy.json")))
    cand = {int(k): v for k, v in c["cand"].items()}
    pairs = build_verify_pairs(cand)
    t0 = time.time()
    sl = pairs[chunk_id * VERIFY_CHUNK : (chunk_id + 1) * VERIFY_CHUNK]
    kept = verify_chunk(db, sl, AlignParams()) if sl else []
    final = os.path.join(work, f"verify_{chunk_id}.npy")
    tmp = final + ".tmp.npy"
    np.save(tmp, np.asarray(kept, dtype=np.int64).reshape(-1, 2))
    os.replace(tmp, final)
    print(json.dumps({"phase": "verify", "chunk": chunk_id,
                      "n_pairs": len(sl), "n_kept": len(kept),
                      "wall_s": round(time.time() - t0, 1),
                      "peak_rss_mb": _peak_mb()}))


def phase_reps(work: str) -> None:
    """Representative round + write clust.tsv/cluster.chk into the
    easy-core layout so the CLI profile/tree stages continue from it."""
    from unicore_tpu.align.cascade import apply_verification, representative_round
    from unicore_tpu.align.clustering import write_cluster_tsv
    from unicore_tpu.align.engine import AlignParams

    db = _load_db(work)
    c = json.load(open(os.path.join(work, "canopy.json")))
    reps = list(c["reps"])
    cand = {int(k): v for k, v in c["cand"].items()}
    n_chunks = -(-int(c["n_pairs"]) // VERIFY_CHUNK)
    kept = set()
    for i in range(n_chunks):
        path = os.path.join(work, f"verify_{i}.npy")
        if not os.path.exists(path):
            raise SystemExit(f"missing {path}; run verify phases first")
        kept.update((int(a), int(b)) for a, b in np.load(path))
    t0 = time.time()
    verified = apply_verification(reps, cand, kept)
    clusters, _ = representative_round(db, reps, verified, AlignParams())
    cdir = os.path.join(work, "out", "cluster")
    os.makedirs(cdir, exist_ok=True)
    write_cluster_tsv(os.path.join(cdir, "clust.tsv"), clusters, db.names)
    with open(os.path.join(cdir, "cluster.chk"), "w") as f:
        f.write("1")
    print(json.dumps({"phase": "reps", "n_clusters": len(clusters),
                      "wall_s": round(time.time() - t0, 1),
                      "peak_rss_mb": _peak_mb()}))


# ---------------------------------------------------------------------------
# report: purity + core genes + RF distance vs the true tree
# ---------------------------------------------------------------------------

def _rf_distance(nwk_a: str, nwk_b: str) -> tuple:
    from unicore_tpu.phylo.newick import bipartitions, parse_newick
    ta = parse_newick(nwk_a)
    tb = parse_newick(nwk_b)
    ba = set(bipartitions(ta).keys())
    bb = set(bipartitions(tb).keys())
    return len(ba ^ bb), len(ba), len(bb)


def phase_refdb(work: str) -> None:
    """Export one representative sequence per core gene as a reference
    DB (the easy-search TARGET; search.rs:44-46 reversed query/target)."""
    from unicore_tpu.io.seqdb import SeqDB

    db = _load_db(work)
    idx = db.name_to_idx()
    profile_dir = os.path.join(work, "out", "profile")
    genes = sorted(f[:-4] for f in os.listdir(profile_dir) if f.endswith(".txt"))
    names, aa, ss = [], [], []
    for g in genes:
        i = idx[g]
        names.append(g)
        aa.append(db.aa_seqs[i])
        ss.append(db.ss_seqs[i])
    ref = SeqDB(names=names, aa_seqs=aa, ss_seqs=ss)
    rdir = os.path.join(work, "refdb")
    os.makedirs(rdir, exist_ok=True)
    ref.write(os.path.join(rdir, "core_db"))
    # .map so profile can map ref genes (not needed for targets; the
    # proteome .map is what profile uses) — skip
    print(json.dumps({"phase": "refdb", "n_core": len(names),
                      "peak_rss_mb": _peak_mb()}))


def _gene_tree_paths(tree_dir: str):
    fasta_dir = os.path.join(tree_dir, "fasta")
    out = []
    for g in sorted(os.listdir(fasta_dir)):
        gd = os.path.join(fasta_dir, g)
        if not os.path.isdir(gd):
            continue
        for cand in ("iqtree.treefile", "fasttree.nwk", "raxml.bestTree"):
            p = os.path.join(gd, cand)
            if os.path.exists(p):
                out.append((g, p))
                break
    return out


def phase_genetree_report(work: str) -> None:
    """Per-gene RF-to-species-tree distribution (the biological sanity
    signal: most single-copy core genes should roughly recapitulate the
    species tree; genetree.rs:113-143 is the per-gene loop)."""
    from unicore_tpu.phylo.newick import bipartitions, parse_newick

    true_nwk = open(os.path.join(work, "true_tree.nwk")).read().strip()
    t_true = parse_newick(true_nwk)
    true_leaves = {l.name for l in t_true.leaves()}
    rfs = []
    for g, path in _gene_tree_paths(os.path.join(work, "out", "tree")):
        tg = parse_newick(open(path).read().strip())
        leaves = {l.name for l in tg.leaves()}
        shared = leaves & true_leaves
        if len(shared) < 4:
            continue
        bg = {k for k in bipartitions(tg, restrict=shared)}
        bt = {k for k in bipartitions(t_true, restrict=shared)}
        denom = max(len(bg) + len(bt), 1)
        rfs.append(len(bg ^ bt) / denom)
    rfs = np.asarray(rfs)
    print(json.dumps({
        "phase": "genetree_report", "n_gene_trees": int(rfs.size),
        "norm_rf_mean": round(float(rfs.mean()), 4) if rfs.size else None,
        "norm_rf_median": round(float(np.median(rfs)), 4) if rfs.size else None,
        "norm_rf_q90": round(float(np.quantile(rfs, 0.9)), 4) if rfs.size else None,
        "frac_rf_le_0.2": round(float((rfs <= 0.2).mean()), 4) if rfs.size else None,
        "peak_rss_mb": _peak_mb()}))


def phase_iqtree_report(work: str) -> None:
    """Reference-default-schedule validation: RF vs the true tree plus
    UFBoot support statistics on true vs spurious splits (tree.rs:143
    `-m JTT+F+I+G -B 1000`)."""
    from unicore_tpu.phylo.newick import bipartitions, parse_newick

    path = os.path.join(work, "out", "tree_iqtree", "iqtree.treefile")
    t_inf = parse_newick(open(path).read().strip())
    t_true = parse_newick(
        open(os.path.join(work, "true_tree.nwk")).read().strip())
    b_inf = bipartitions(t_inf)
    b_true = set(bipartitions(t_true).keys())
    sup_true, sup_false = [], []
    for key, node in b_inf.items():
        s = getattr(node, "support", None)
        if s is None:
            continue
        (sup_true if key in b_true else sup_false).append(float(s))
    d = len(set(b_inf.keys()) ^ b_true)
    print(json.dumps({
        "phase": "iqtree_report",
        "rf": d,
        "norm_rf": round(d / max(len(b_inf) + len(b_true), 1), 4),
        "true_splits_recovered": len(set(b_inf.keys()) & b_true),
        "support_true_mean": round(float(np.mean(sup_true)), 1) if sup_true else None,
        "support_true_min": round(float(np.min(sup_true)), 1) if sup_true else None,
        "support_false_mean": round(float(np.mean(sup_false)), 1) if sup_false else None,
        "n_false_splits": len(sup_false),
        "peak_rss_mb": _peak_mb()}))


def phase_search_report(work: str) -> None:
    """Search-mode (easy-search analog) validation: core-gene set found
    via search+profile vs the cluster-mode core-gene set."""
    cluster_core = {f[:-4] for f in os.listdir(os.path.join(work, "out", "profile"))
                    if f.endswith(".txt")}
    sdir = os.path.join(work, "search_out", "profile")
    search_core = {f[:-4] for f in os.listdir(sdir) if f.endswith(".txt")}
    inter = cluster_core & search_core
    print(json.dumps({
        "phase": "search_report",
        "cluster_core": len(cluster_core), "search_core": len(search_core),
        "overlap": len(inter),
        "jaccard": round(len(inter) / max(len(cluster_core | search_core), 1), 4),
        "peak_rss_mb": _peak_mb()}))


def phase_report(work: str) -> None:
    import collections

    # cluster purity vs generating families (via the .map originals)
    fam_of = {}
    for ln in open(os.path.join(work, "out", "proteome", "proteome_db.map")):
        parts = ln.rstrip("\n").split("\t")
        fam_of[parts[0]] = parts[2].split("_")[0]
    cl = collections.defaultdict(list)
    for ln in open(os.path.join(work, "out", "cluster", "clust.tsv")):
        r, m = ln.split()
        cl[r].append(m)
    pure = sum(1 for ms in cl.values() if len({fam_of[m] for m in ms}) == 1)
    core = [f for f in os.listdir(os.path.join(work, "out", "profile"))
            if f.endswith(".txt")]
    tree_dir = os.path.join(work, "out", "tree")
    nwk = None
    for cand in ("fasttree.nwk", "iqtree.treefile", "raxml.bestTree"):
        p = os.path.join(tree_dir, cand)
        if os.path.exists(p):
            nwk = open(p).read().strip()
            break
    rf = None
    if nwk:
        true_nwk = open(os.path.join(work, "true_tree.nwk")).read().strip()
        d, na, nb = _rf_distance(true_nwk, nwk)
        rf = {"rf": d, "splits_true": na, "splits_inferred": nb,
              "norm_rf": round(d / max(na + nb, 1), 4)}
    print(json.dumps({"phase": "report", "n_clusters": len(cl),
                      "purity": round(pure / max(len(cl), 1), 4),
                      "n_core_genes": len(core), "rf": rf}))


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _record_wall(work: str, key: str, wall: float) -> None:
    """Accumulate per-phase walls in {work}/phase_walls.json across
    (resumed) runs — the source for the pipeline-level benchmark
    (proteomes/hr single-chip, bench.py).  Chunked phases (verify)
    sum; re-run phases overwrite with the latest measurement."""
    path = os.path.join(work, "phase_walls.json")
    try:
        d = json.load(open(path))
    except (OSError, ValueError):
        d = {}
    if key.startswith("verify"):
        d["verify"] = round(d.get("verify", 0.0) + wall, 1)
    else:
        d[key] = round(wall, 1)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(d, f, indent=1)
    os.replace(tmp, path)


def _run_phase(args_list, log, work=None):
    t0 = time.time()
    r = subprocess.run([sys.executable, os.path.abspath(__file__)] + args_list,
                       capture_output=True, text=True)
    wall = time.time() - t0
    out = (r.stdout or "").strip().splitlines()
    tail = out[-1] if out else ""
    print(f"[{wall:7.1f}s] {' '.join(args_list)}: {tail}", flush=True)
    log.append({"args": args_list, "wall_s": round(wall, 1), "result": tail})
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:] if r.stderr else "")
        raise SystemExit(f"phase failed: {args_list}")
    if work:
        key = args_list[args_list.index("--phase") + 1]
        if key == "verify":
            key = "verify_" + args_list[args_list.index("--chunk") + 1]
        _record_wall(work, key, wall)
    return tail


def _run_cli(work, module_args, log, wall_key=None):
    t0 = time.time()
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "-m", "unicore_tpu"] + module_args,
                       capture_output=True, text=True, env=env)
    wall = time.time() - t0
    print(f"[{wall:7.1f}s] CLI {' '.join(module_args[:2])}: rc={r.returncode}",
          flush=True)
    log.append({"cli": module_args[:2], "wall_s": round(wall, 1),
                "rc": r.returncode})
    if r.returncode != 0:
        sys.stderr.write((r.stderr or "")[-4000:])
        raise SystemExit(f"CLI phase failed: {module_args[:2]}")
    _record_wall(work, wall_key or module_args[0], wall)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--species", type=int, default=100)
    ap.add_argument("--families", type=int, default=380)
    ap.add_argument("--workdir", default="/tmp/scale_pipe")
    ap.add_argument("--phase")
    ap.add_argument("--chunk", type=int, default=0)
    args = ap.parse_args()
    work = args.workdir
    os.makedirs(work, exist_ok=True)

    if args.phase:  # worker entry
        if args.phase == "gen":
            phase_gen(work, args.species, args.families)
        elif args.phase == "canopy":
            phase_canopy(work)
        elif args.phase == "verify":
            phase_verify(work, args.chunk)
        elif args.phase == "reps":
            phase_reps(work)
        elif args.phase == "report":
            phase_report(work)
        elif args.phase == "refdb":
            phase_refdb(work)
        elif args.phase == "genetree_report":
            phase_genetree_report(work)
        elif args.phase == "iqtree_report":
            phase_iqtree_report(work)
        elif args.phase == "search_report":
            phase_search_report(work)
        return

    def chk_done(path: str) -> bool:
        # reference .chk semantics: "0" written at stage entry, "1" at
        # completion — existence alone marks a CRASHED stage as done
        try:
            return open(path).read().strip() == "1"
        except OSError:
            return False

    log = []
    t_start = time.time()
    out = os.path.join(work, "out")
    tmp = os.path.join(work, "tmp")
    base = ["--workdir", work, "--species", str(args.species),
            "--families", str(args.families)]

    if not os.path.exists(os.path.join(work, "true_tree.nwk")):
        _run_phase(base + ["--phase", "gen"], log, work=work)
    else:
        print("gen: exists, skipping", flush=True)
    # bench.py reads n_species for the proteomes/hr metric
    with open(os.path.join(work, "pipeline_meta.json"), "w") as f:
        json.dump({"n_species": args.species,
                   "n_families": args.families}, f)

    if not chk_done(os.path.join(out, "proteome", "createdb.chk")):
        _run_cli(work, ["createdb", os.path.join(work, "in"),
                        os.path.join(out, "proteome", "proteome_db"),
                        "mock", "-v", "1"], log)
    else:
        print("createdb: exists, skipping", flush=True)

    if not os.path.exists(os.path.join(work, "canopy.json")):
        _run_phase(base + ["--phase", "canopy"], log, work=work)
    else:
        print("canopy: exists, skipping", flush=True)

    n_pairs = json.load(open(os.path.join(work, "canopy.json")))["n_pairs"]
    n_chunks = max(1, -(-n_pairs // VERIFY_CHUNK))
    for i in range(n_chunks):
        if os.path.exists(os.path.join(work, f"verify_{i}.npy")):
            continue
        _run_phase(base + ["--phase", "verify", "--chunk", str(i)], log, work=work)

    if not chk_done(os.path.join(out, "cluster", "cluster.chk")):
        _run_phase(base + ["--phase", "reps"], log, work=work)
    else:
        print("reps: exists, skipping", flush=True)

    if not chk_done(os.path.join(out, "profile", "profile.chk")):
        _run_cli(work, ["profile", os.path.join(out, "proteome", "proteome_db"),
                        os.path.join(out, "cluster", "clust.tsv"),
                        os.path.join(out, "profile"), "-v", "1"], log)
    else:
        print("profile: exists, skipping", flush=True)

    if not chk_done(os.path.join(out, "tree", "tree.chk")):
        _run_cli(work, ["tree", os.path.join(out, "proteome", "proteome_db"),
                        os.path.join(out, "profile"), os.path.join(out, "tree"),
                        "--aligner", "foldmason",
                        "--tree-builder", "fasttree",
                        "--tree-options", "-gamma -boot 100", "-v", "2"], log)
    else:
        print("tree: exists, skipping", flush=True)

    _run_phase(base + ["--phase", "report"], log)

    # ---- round-5 phases: reference-DEFAULT tree schedule (iqtree
    # `-m JTT+F+I+G -B 1000`, tree.rs:143) at supermatrix scale,
    # reusing the MSA via the skip-alignment fast path (tree.rs:55-57)
    ti = os.path.join(out, "tree_iqtree")
    if not chk_done(os.path.join(ti, "tree.chk")):
        os.makedirs(ti, exist_ok=True)
        for f in ("combined.fasta", "combined.fasta.partitions"):
            src = os.path.join(out, "tree", f)
            dst = os.path.join(ti, f)
            if os.path.exists(src) and not os.path.exists(dst):
                import shutil
                shutil.copy(src, dst)
        _run_cli(work, ["tree", os.path.join(out, "proteome", "proteome_db"),
                        os.path.join(out, "profile"), ti,
                        "--aligner", "foldmason",
                        "--tree-builder", "iqtree", "-v", "2"], log,
                 wall_key="tree_iqtree")
    else:
        print("tree_iqtree: exists, skipping", flush=True)
    _run_phase(base + ["--phase", "iqtree_report"], log)

    # ---- round-5 phases: per-gene trees + search-mode analog ----
    gt_marker = os.path.join(out, "tree", "genetree.done")
    if not os.path.exists(gt_marker):
        _run_cli(work, ["gene-tree", os.path.join(out, "tree"),
                        "-T", "iqtree", "-v", "1"], log)
        with open(gt_marker, "w") as f:
            f.write("1")
    else:
        print("gene-tree: exists, skipping", flush=True)
    _run_phase(base + ["--phase", "genetree_report"], log)

    refdb = os.path.join(work, "refdb", "core_db")
    if not os.path.exists(refdb):
        _run_phase(base + ["--phase", "refdb"], log, work=work)
    else:
        print("refdb: exists, skipping", flush=True)
    sout = os.path.join(work, "search_out")
    if not chk_done(os.path.join(sout, "search", "search.chk")):
        os.makedirs(os.path.join(sout, "search"), exist_ok=True)
        _run_cli(work, ["search", os.path.join(out, "proteome", "proteome_db"),
                        refdb, os.path.join(sout, "search", "search"),
                        os.path.join(work, "tmp"), "-v", "1"], log)
    else:
        print("search: exists, skipping", flush=True)
    if not chk_done(os.path.join(sout, "profile", "profile.chk")):
        _run_cli(work, ["profile", os.path.join(out, "proteome", "proteome_db"),
                        os.path.join(sout, "search", "search.m8"),
                        os.path.join(sout, "profile"), "-v", "1"], log,
                 wall_key="profile_search")
    else:
        print("search-profile: exists, skipping", flush=True)
    _run_phase(base + ["--phase", "search_report"], log)

    log.append({"total_wall_s": round(time.time() - t_start, 1)})
    with open(os.path.join(work, "pipeline_log.json"), "w") as f:
        json.dump(log, f, indent=1)
    print(f"TOTAL {time.time() - t_start:.1f}s", flush=True)


if __name__ == "__main__":
    main()
