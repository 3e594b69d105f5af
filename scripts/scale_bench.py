"""Large-N clustering scale proof (BASELINE config 3), resumable.

Generates a synthetic database of families (incl. ~2% long 1.2-3k
residue families exercising the banded path), then runs the production
cascade in CHECKPOINTED PHASES, each in its OWN subprocess:

    gen -> canopy -> verify chunk 0..K-1 -> reps (report)

Why subprocesses: the dev TPU tunnel's relay retains every transferred
buffer in the client's host RSS (measured round 2: >100 GB before the
50K verification finished).  Recycling the client per phase/chunk bounds
RSS at one chunk's working set; a cleanly-exiting client releases its
chip claim (unlike a killed one).  Every phase writes its result to the
workdir and is SKIPPED on rerun, so an interrupted run resumes where it
stopped.

Run:  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/scale_bench.py 50000 [--workdir /tmp/scale50k]
Worker entry (internal): --phase {gen,canopy,verify,reps} [--chunk N]
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

VERIFY_CHUNK = 6000  # (member, rep) pairs per recycled worker process


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


def _load_db(work):
    from unicore_tpu.io.seqdb import SeqDB
    return SeqDB.read(os.path.join(work, "db"))


def _peak_mb() -> int:
    return int(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)


def phase_gen(work: str, n: int) -> None:
    db, fam_of = synth_db(n)
    db.write(os.path.join(work, "db"))
    np.save(os.path.join(work, "fam_of.npy"), fam_of)
    print(json.dumps({"phase": "gen", "n_seqs": len(db), "peak_rss_mb": _peak_mb()}))


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
    # atomic publish: verify_{cid}.npy doubles as the resume-skip marker,
    # so a worker killed mid-np.save must not leave a truncated file that
    # marks the chunk complete
    final = os.path.join(work, f"verify_{chunk_id}.npy")
    tmp = final + ".tmp.npy"
    np.save(tmp, np.asarray(kept, dtype=np.int64).reshape(-1, 2))
    os.replace(tmp, final)
    print(json.dumps({"phase": "verify", "chunk": chunk_id,
                      "n_pairs": len(sl), "n_kept": len(kept),
                      "wall_s": round(time.time() - t0, 1),
                      "peak_rss_mb": _peak_mb()}))


def phase_reps(work: str) -> None:
    from unicore_tpu.align.cascade import (
        apply_verification, representative_round,
    )
    from unicore_tpu.align.engine import AlignParams
    from unicore_tpu.runtime import profiling

    db = _load_db(work)
    fam_of = np.load(os.path.join(work, "fam_of.npy"))
    c = json.load(open(os.path.join(work, "canopy.json")))
    reps = list(c["reps"])
    cand = {int(k): v for k, v in c["cand"].items()}
    kept = set()
    # the expected chunk count is derived from the canopy phase's pair
    # count — stopping at the first missing file would silently treat
    # every later chunk's pairs as unverified singletons
    n_chunks = -(-int(c["n_pairs"]) // VERIFY_CHUNK)
    for i in range(n_chunks):
        path = os.path.join(work, f"verify_{i}.npy")
        if not os.path.exists(path):
            raise SystemExit(
                f"phase_reps: missing {path} ({n_chunks} verify chunks "
                f"expected for {c['n_pairs']} pairs) — run phase_verify "
                f"for every chunk first"
            )
        arr = np.load(path)
        kept.update((int(a), int(b)) for a, b in arr)
    t0 = time.time()
    verified = apply_verification(reps, cand, kept)
    clusters, _ = representative_round(db, reps, verified, AlignParams())
    wall = time.time() - t0

    pure = sum(1 for ms in clusters.values()
               if len({fam_of[m] for m in ms}) == 1)
    counters = profiling.get_counters()
    with open(os.path.join(work, "clusters.json"), "w") as f:
        json.dump({str(k): v for k, v in clusters.items()}, f)
    print(json.dumps({"phase": "reps", "n_clusters": len(clusters),
                      "n_families": int(fam_of.max()) + 1,
                      "purity": round(pure / max(len(clusters), 1), 4),
                      "wall_s": round(wall, 1),
                      "counters": {k: round(v, 1) for k, v in counters.items()},
                      "peak_rss_mb": _peak_mb()}))


def orchestrate(n: int, work: str) -> int:
    """Run every phase in its own recycled subprocess, resumably."""
    os.makedirs(work, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    me = os.path.abspath(__file__)
    t_all = time.time()
    phase_stats = []

    def run_phase(args, marker):
        if os.path.exists(os.path.join(work, marker)):
            print(f"skip (exists): {marker}", file=sys.stderr)
            return
        t0 = time.time()
        r = subprocess.run([sys.executable, "-u", me, str(n), "--workdir", work] + args,
                           env=env, capture_output=True, text=True)
        sys.stderr.write(r.stderr[-2000:])
        if r.returncode != 0:
            print(f"phase {args} failed rc={r.returncode}", file=sys.stderr)
            sys.exit(1)
        json_lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not json_lines:
            print(f"phase {args} produced no JSON result line; stdout:\n"
                  f"{r.stdout[-1000:]}", file=sys.stderr)
            sys.exit(1)
        line = json_lines[-1]
        rec = json.loads(line)
        rec["subprocess_wall_s"] = round(time.time() - t0, 1)
        phase_stats.append(rec)
        print(line)

    # fam_of.npy is gen's LAST write: a gen interrupted mid-phase is
    # re-run rather than half-skipped
    run_phase(["--phase", "gen"], "fam_of.npy")
    run_phase(["--phase", "canopy"], "canopy.json")
    n_pairs = json.load(open(os.path.join(work, "canopy.json")))["n_pairs"]
    n_chunks = max(1, -(-n_pairs // VERIFY_CHUNK))
    for cid in range(n_chunks):
        run_phase(["--phase", "verify", "--chunk", str(cid)], f"verify_{cid}.npy")
    run_phase(["--phase", "reps"], "clusters.json")

    wall = time.time() - t_all
    summary = {
        "metric": "cluster_scale_resumable",
        "n_seqs": n,
        "n_verify_chunks": n_chunks,
        "recycled_processes": 3 + n_chunks,
        "total_wall_s": round(wall, 1),
        "seqs_per_s": round(n / wall, 1),
        "max_worker_rss_mb": max((p.get("peak_rss_mb", 0) for p in phase_stats),
                                 default=0),
        "phases": phase_stats,
    }
    with open(os.path.join(work, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_seqs", type=int, nargs="?", default=50000)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--phase", default=None,
                    choices=["gen", "canopy", "verify", "reps"])
    ap.add_argument("--chunk", type=int, default=0)
    args = ap.parse_args()
    work = args.workdir or f"/tmp/scale{args.n_seqs}"

    if args.phase is None:
        return orchestrate(args.n_seqs, work)
    os.makedirs(work, exist_ok=True)
    if args.phase == "gen":
        phase_gen(work, args.n_seqs)
    elif args.phase == "canopy":
        phase_canopy(work)
    elif args.phase == "verify":
        phase_verify(work, args.chunk)
    elif args.phase == "reps":
        phase_reps(work)
    return 0


if __name__ == "__main__":
    sys.exit(main())
