"""Worker process for the 2-process jax.distributed test.

Launched (twice) by tests/test_distributed.py.  Exercises the REAL
multi-host code path that single-host tests cannot: per-process
`jax.distributed.initialize` through `initialize_distributed()`
(parallel/mesh.py:30-37), a global mesh spanning both processes, a
sharded SW forward where each process holds only ITS shard of the pair
batch (the query-shard layout of SURVEY §2c), a cross-process psum of
hit counts (the edge-count aggregation pattern), and an all-gather of
the per-pair results (the cross-host edge-list merge).  Results are
checked inside each worker against a locally computed full reference,
and an OK file is written for the parent to assert on.
"""

import os
import sys


def main() -> int:
    coordinator, nprocs, pid, outdir = sys.argv[1:5]

    import jax
    # the axon sitecustomize force-sets jax_platforms at startup; the
    # config update (not the env var) is what actually forces CPU
    jax.config.update("jax_platforms", "cpu")

    os.environ["UNICORE_TPU_COORDINATOR"] = coordinator
    os.environ["UNICORE_TPU_NUM_PROCS"] = nprocs
    os.environ["UNICORE_TPU_PROC_ID"] = pid

    from unicore_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed()
    assert jax.process_count() == int(nprocs), jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
    from unicore_tpu.ops.sw import build_scores, sw_forward_xla

    n_global = jax.device_count()
    n_local = len(jax.local_devices())
    assert n_global == n_local * int(nprocs), (n_global, n_local)

    mesh = make_mesh(dp=n_global, tp=1)

    # Full deterministic problem, identical in every process; each
    # process only MATERIALIZES its own shard of the batch.
    B, L = 16, 64
    rng = np.random.RandomState(0)
    qa = rng.randint(0, 20, (B, L)).astype(np.int32)
    qs = rng.randint(0, 20, (B, L)).astype(np.int32)
    ta = rng.randint(0, 20, (B, L)).astype(np.int32)
    ts = rng.randint(0, 20, (B, L)).astype(np.int32)
    ln = np.full(B, L, np.int32)
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    scores = build_scores(qa, qs, ta, ts, ln, ln, saa, s3d)

    sh = NamedSharding(mesh, P("dp"))
    per_proc = B // int(nprocs)
    lo = int(pid) * per_proc
    local_scores = scores[lo : lo + per_proc]
    g_scores = jax.make_array_from_process_local_data(sh, local_scores)

    try:
        from jax import shard_map as _sm
        _sm_kw = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm
        _sm_kw = {"check_rep": False}

    def local_fn(s):
        best, bi, bj = sw_forward_xla(s)
        # cross-process psum: total number of pairs scoring above a gate
        n_hits = jax.lax.psum(jnp.sum(best > 50.0), "dp")
        return best, bi, bj, n_hits

    fn = _sm(local_fn, mesh=mesh, in_specs=(P("dp"),),
             out_specs=(P("dp"), P("dp"), P("dp"), P()), **_sm_kw)
    best, bi, bj, n_hits = jax.jit(fn)(g_scores)

    # all-gather the sharded per-pair results to every process (the
    # cross-host edge-list merge)
    best_all = multihost_utils.process_allgather(best, tiled=True)
    bi_all = multihost_utils.process_allgather(bi, tiled=True)

    # verify against the full single-process reference
    ref_best, ref_bi, ref_bj = map(np.asarray, sw_forward_xla(jnp.asarray(scores)))
    np.testing.assert_array_equal(best_all, ref_best)
    np.testing.assert_array_equal(bi_all, ref_bi)
    assert int(n_hits) == int((ref_best > 50.0).sum())

    with open(os.path.join(outdir, f"ok.{pid}"), "w") as f:
        f.write(f"OK procs={jax.process_count()} devices={n_global} "
                f"hits={int(n_hits)}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
