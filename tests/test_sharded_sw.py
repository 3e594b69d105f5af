"""Data-parallel SW over the 8-device virtual mesh must equal single-device."""

import numpy as np

from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
from unicore_tpu.ops.sw import build_scores, sw_forward_sharded, sw_forward_xla


def test_sharded_xla_matches_single():
    import jax
    from unicore_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(3)
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    B, L = 32, 128
    qa = rng.randint(0, 20, (B, L)).astype(np.int32)
    qs = rng.randint(0, 20, (B, L)).astype(np.int32)
    ta = rng.randint(0, 20, (B, L)).astype(np.int32)
    ts = rng.randint(0, 20, (B, L)).astype(np.int32)
    ln = np.full(B, L, np.int32)
    for b in range(0, B, 2):
        ta[b, :50] = qa[b, :50]
        ts[b, :50] = qs[b, :50]

    scores = build_scores(qa, qs, ta, ts, ln, ln, saa, s3d)
    ref_best, ref_bi, ref_bj = (np.asarray(x) for x in sw_forward_xla(scores))

    mesh = make_mesh(dp=8, tp=1)
    mesh1d = jax.sharding.Mesh(np.asarray(jax.devices()), ("dp",))
    best, bi, bj = (
        np.asarray(x)
        for x in sw_forward_sharded(
            qa, qs, ta, ts, ln, ln, saa, s3d, mesh1d, backend="xla"
        )
    )
    assert np.allclose(best, ref_best)
    assert (bi == ref_bi).all() and (bj == ref_bj).all()
