"""Benchmark — Smith-Waterman 3Di+AA alignment throughput per chip.

Runs the Pallas prefix-scan SW kernel (the pipeline's hot inner loop,
replacing foldseek's gapped alignment stage) on the attached accelerator
and prints ONE JSON line:

    {"metric": "sw_3di_gcups_per_chip", "value": N, "unit": "GCUPS",
     "vs_baseline": N / 2.0}

Baseline note: the reference publishes no numbers (BASELINE.md); the
denominator 2.0 GCUPS is the documented stand-in for CPU-Foldseek-class
striped-SW throughput on one server core-group, per BASELINE.json's
">=50x CPU-Foldseek per chip" target framing.

Robustness: the dev TPU tunnel occasionally wedges a client at claim
time (hangs forever at 0% CPU).  The measurement therefore runs in a
watchdog subprocess with retries; the parent prints the one JSON line.
Measurements keep the iteration loop inside a single jitted program and
vary inputs per timed call (the tunnel adds ~100 ms per dispatch and
caches identical executions).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _measure() -> None:
    """Child-process entry: print one JSON result line."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
    from unicore_tpu.ops.sw import build_scores, sw_forward_pallas, sw_forward_xla

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")

    rng = np.random.RandomState(7)
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)

    if on_tpu:
        B, L, iters = 2048, 512, 20
        dsaa, ds3d = jnp.asarray(saa), jnp.asarray(s3d)
        qa = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
        qs = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
        ta = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
        ts = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
        ln = jnp.asarray(np.full(B, L, np.int32))

        def make_loop(**kw):
            @functools.partial(jax.jit, static_argnames=("n",))
            def loop(seed, n):
                def body(i, acc):
                    q2 = jnp.roll(qa, i + seed, axis=0)
                    b, _, _ = sw_forward_pallas(
                        q2, qs, ta, ts, ln, ln, dsaa, ds3d, **kw,
                    )
                    return acc + jnp.sum(b)
                return jax.lax.fori_loop(0, n, body, 0.0)
            return loop

        def timed(loop, seeds):
            jax.block_until_ready(loop(jnp.int32(0), n=iters))  # compile+warm
            times = []
            for seed in seeds:
                t0 = time.time()
                jax.block_until_ready(loop(jnp.int32(seed), n=iters))
                times.append(time.time() - t0)
            # subtract one dispatch RTT (tunnel adds ~100 ms per call)
            return max((min(times) - 0.1) / iters, 1e-6)

        # Shipping config (align/engine.py defaults): windowed gap scan +
        # auto batch tile (64).
        dt = timed(make_loop(gap_window=64), (1000, 2000))
        # Same-session A/B vs the round-1 config (full-width scan, BT=32):
        # the shared dev chip drifts ~1.8x between sessions, so the ratio —
        # not the absolute GCUPS — is the cross-round progress signal.
        dt_r1 = timed(make_loop(batch_tile=32), (3000, 4000))
    else:
        B, L, iters = 64, 128, 2
        qa = rng.randint(0, 20, (B, L)).astype(np.int32)
        qs = rng.randint(0, 20, (B, L)).astype(np.int32)
        ta = rng.randint(0, 20, (B, L)).astype(np.int32)
        ts = rng.randint(0, 20, (B, L)).astype(np.int32)
        ln = np.full(B, L, np.int32)

        def run_once():
            scores = build_scores(qa, qs, ta, ts, ln, ln, saa, s3d)
            return sw_forward_xla(scores)

        jax.block_until_ready(run_once())
        t0 = time.time()
        for _ in range(iters):
            out = run_once()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters

    gcups = B * L * L / dt / 1e9
    baseline_gcups = 2.0
    rec = {
        "metric": "sw_3di_gcups_per_chip",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / baseline_gcups, 2),
    }
    if on_tpu:
        r1 = B * L * L / dt_r1 / 1e9
        rec["r1_config_gcups"] = round(r1, 2)  # same-session chip-state ref
        rec["speedup_vs_r1_config"] = round(gcups / max(r1, 1e-9), 2)
    print(json.dumps(rec))


def _utime(pid: int) -> int:
    """Cumulative user-mode jiffies of `pid` (0 if gone)."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            return int(f.read().rsplit(") ", 1)[1].split()[11])
    except (OSError, IndexError, ValueError):
        return 0


def _run_watched(cmd, cwd, env, out_path, hard_cap=1800.0, stall_window=300.0):
    """Run `cmd`, killing it on a genuine stall or at an absolute cap.

    A wedged chip claim hangs forever at ~0% CPU with no output; a long
    remote compile is also low-CPU but still accumulates some utime and
    eventually writes output.  Kill conditions:
      * "stall": no output growth AND <0.2 s CPU over `stall_window` —
        a progressing child (long cold compile) is never stall-killed;
      * "hard_cap": absolute wall-clock bound regardless of progress
        (a busy-hung child — e.g. a client spinning on reconnects —
        must not block the bench forever).  1800 s is ~3x the worst
        observed legitimate cold-compile+measure time.
    Returns (kill_reason, wall_s) with kill_reason in
    (None, "stall", "hard_cap").
    """
    err_path = out_path + ".err"
    with open(out_path, "wb") as out, open(err_path, "wb") as err:
        p = subprocess.Popen(cmd, cwd=cwd, env=env, stdout=out, stderr=err)
    t0 = time.time()
    last_size, last_u, last_progress = 0, _utime(p.pid), t0
    kill_reason = None
    while p.poll() is None:
        time.sleep(10)
        now = time.time()
        size = os.path.getsize(out_path) + os.path.getsize(err_path)
        u = _utime(p.pid)
        if size > last_size or (u - last_u) >= 20:  # 20 jiffies = 0.2 s CPU
            last_size, last_u, last_progress = size, u, now
        if now - last_progress > stall_window or now - t0 > hard_cap:
            kill_reason = "stall" if now - last_progress > stall_window else "hard_cap"
            p.kill()
            p.wait()
            break
    return kill_reason, time.time() - t0


def _tail(path: str, n: int = 5) -> str:
    try:
        with open(path, errors="replace") as f:
            lines = f.read().strip().splitlines()
        return " | ".join(lines[-n:])
    except OSError:
        return ""


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    out_path = "/tmp/unicore_tpu_bench_child.out"
    last_line = None
    attempts = 4
    last_err = ""
    for attempt in range(attempts):
        kill_reason, wall = _run_watched(
            [sys.executable, "-u", "-c", "import bench; bench._measure()"],
            here, env, out_path,
        )
        try:
            with open(out_path) as f:
                for ln in f.read().strip().splitlines():
                    if ln.startswith("{"):
                        last_line = ln
        except OSError:
            pass
        if last_line:
            break
        last_err = _tail(out_path + ".err")
        if kill_reason:
            # A killed client leaves the chip claim wedged; measured recovery
            # needs a long cooldown (300 s worked, 60 s did not — CLAUDE.md).
            print(f"bench attempt {attempt + 1} killed ({kill_reason}) after "
                  f"{wall:.0f}s; stderr tail: {last_err or '(empty)'}",
                  file=sys.stderr)
            if attempt < attempts - 1:
                print("cooling down 300s before retry", file=sys.stderr)
                time.sleep(300)
        else:
            # child exited by itself without a result — a real failure
            # (ImportError, kernel exception), not a wedge
            print(f"bench attempt {attempt + 1} exited without result after "
                  f"{wall:.0f}s; stderr tail: {last_err or '(empty)'}",
                  file=sys.stderr)
            if attempt < attempts - 1:
                time.sleep(10)
    if last_line is None:
        # all attempts wedged/failed — report honestly with zero value
        last_line = json.dumps({
            "metric": "sw_3di_gcups_per_chip",
            "value": 0.0,
            "unit": "GCUPS",
            "vs_baseline": 0.0,
            "error": f"device unavailable after {attempts} attempts; "
                     f"last stderr: {last_err[:400]}",
        })
    last_line = _augment_pipeline(last_line)
    print(last_line)
    return 0


def _augment_pipeline(last_line: str) -> str:
    """Fold the pipeline-level benchmark into the result record.

    The SW kernel sits at its design's local optimum (BENCH_NOTES round
    3/4 postmortems), so the end-to-end number — proteomes/hr single
    chip through the COMPLETE config-4 pipeline (createdb -> canopy ->
    verify -> reps -> profile -> tree; scripts/scale_pipeline.py) — is
    the honest headline perf story.  Phase walls accumulate in the
    workdir's phase_walls.json; this run's pipeline numbers are picked
    up from UNICORE_TPU_PIPELINE_WALLS or the default scale workdirs."""
    candidates = [os.environ.get("UNICORE_TPU_PIPELINE_WALLS") or "",
                  "/tmp/scale_r5/phase_walls.json",
                  "/tmp/scale_pipe5/phase_walls.json",
                  # committed snapshot of the most recent completed run —
                  # /tmp workdirs do not survive session recycling
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "artifacts", "phase_walls.json")]
    walls = None
    used = None
    for path in candidates:
        if path and os.path.exists(path):
            try:
                with open(path) as f:
                    walls = json.load(f)
                used = path
                break
            except (OSError, ValueError):
                continue
    if not walls:
        return last_line
    try:
        rec = json.loads(last_line)
    except ValueError:
        return last_line
    # end-to-end = the easy-core-equivalent stages only.  gen is dataset
    # synthesis; refdb/search/profile_search/gene-tree/tree_iqtree are
    # validation extras or a SECOND tree schedule — summing them would
    # double-count tree inference and inflate the pipeline wall.
    core_exact = {"createdb", "canopy", "verify", "reps", "profile", "tree"}
    core_keys = [k for k in walls
                 if k in core_exact or k.startswith("verify_")]
    total = sum(walls[k] for k in core_keys)
    meta_path = os.path.join(os.path.dirname(used), "pipeline_meta.json")
    n_species = 100
    try:
        with open(meta_path) as f:
            n_species = int(json.load(f).get("n_species", 100))
    except (OSError, ValueError):
        pass
    if total > 0:
        rec["pipeline_proteomes_per_hr"] = round(n_species / (total / 3600.0), 1)
        rec["pipeline_wall_s"] = round(total, 1)
        rec["pipeline_walls"] = {k: walls[k] for k in sorted(walls)}
        rec["pipeline_source"] = used
    return json.dumps(rec)


if __name__ == "__main__":
    sys.exit(main())
