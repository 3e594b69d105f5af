"""Phylogeny engine tests: likelihood vs numpy reference, NJ, NNI search,
Newick roundtrip, bootstrap plumbing."""

import numpy as np
import pytest

from unicore_tpu.phylo.likelihood import (
    LikelihoodEngine,
    arrays_to_tree,
    compress_patterns,
    empirical_frequencies,
    make_root_binary,
    msa_to_codes,
    tree_to_arrays,
    unroot,
)
from unicore_tpu.phylo.models import ModelSpec, SubstModel, gamma_rates
from unicore_tpu.phylo.newick import Node, bipartitions, parse_newick, rf_distance
from unicore_tpu.phylo.nj import neighbor_joining, protein_distances
from unicore_tpu.phylo.search import TreeSearch, nni_neighbors


def _np_prune_loglik(root_node, msa, model):
    """Independent numpy Felsenstein pruning (recursive, per site)."""
    names = list(msa.keys())
    codes = msa_to_codes(names, [msa[n] for n in names])
    idx = {n: i for i, n in enumerate(names)}
    rates, props = model.rates_and_props()
    L = codes.shape[1]
    total = 0.0
    for site in range(L):
        site_lik = 0.0
        for c, (r, p) in enumerate(zip(rates, props)):
            def clv(node):
                if node.is_leaf:
                    v = np.ones(20)
                    code = codes[idx[node.name], site]
                    if code < 20:
                        v = np.zeros(20)
                        v[code] = 1.0
                    return v
                out = np.ones(20)
                for ch in node.children:
                    P = model.transition_matrices(np.array(max(ch.length, 1e-8) * r))
                    out = out * (P @ clv(ch))
                return out
            site_lik += p * float(model.pi @ clv(root_node))
        total += np.log(site_lik)
    return total


@pytest.fixture
def small_msa():
    return {
        "t1": "ACDEFGHIKLMNPQRSTVWY",
        "t2": "ACDEFGHIKLMNPQRSTVWF",
        "t3": "ACDEYGHIKLMNPQRSTVWY",
        "t4": "ACDEYGHIKTMNPQRSTVWY",
    }


def test_newick_roundtrip():
    t = parse_newick("((A:0.1,B:0.2)90:0.05,(C:0.3,D:0.4)85:0.06,E:0.5);")
    assert sorted(l.name for l in t.leaves()) == ["A", "B", "C", "D", "E"]
    s = t.to_newick()
    t2 = parse_newick(s)
    assert rf_distance(t, t2) == 0
    # supports preserved
    bps = bipartitions(t2)
    sups = sorted(n.support for n in bps.values())
    assert sups == [85.0, 90.0]


def test_compress_patterns():
    codes = np.array([[0, 1, 0, 2], [3, 1, 3, 2]])
    pat, w = compress_patterns(codes)
    assert pat.shape[1] == 3
    assert sorted(w.tolist()) == [1.0, 1.0, 2.0]
    assert w.sum() == 4


def test_gamma_rates_mean_one():
    for alpha in (0.3, 1.0, 3.0):
        r = gamma_rates(alpha, 4)
        assert r.mean() == pytest.approx(1.0, abs=1e-6)
        assert (np.diff(r) > 0).all()


def test_subst_model_rows_sum():
    spec = ModelSpec.parse("JTT+F+G")
    assert spec.plus_f and spec.plus_g and not spec.plus_i
    m = SubstModel.build(spec, empirical_freqs=np.full(20, 0.05), alpha=0.8)
    P = m.transition_matrices(np.array([0.1, 1.0]))
    assert P.shape == (2, 20, 20)
    assert np.allclose(P.sum(axis=-1), 1.0, atol=1e-6)
    assert (P >= -1e-9).all()
    # P(0) = I
    P0 = m.transition_matrices(np.array(0.0))
    assert np.allclose(P0, np.eye(20), atol=1e-6)
    # stationarity: pi P = pi
    assert np.allclose(m.pi @ P[1], m.pi, atol=1e-6)


def test_loglik_matches_numpy_reference(small_msa):
    names = list(small_msa.keys())
    spec = ModelSpec.parse("JTT")
    model = SubstModel.build(spec)
    engine = LikelihoodEngine(names, [small_msa[n] for n in names], model)

    t = parse_newick("((t1:0.1,t2:0.2):0.05,(t3:0.15,t4:0.1):0.07);")
    children, blens = tree_to_arrays(t, names)
    ll = engine.loglik(children, blens)
    ref = _np_prune_loglik(t, small_msa, model)
    assert ll == pytest.approx(ref, abs=0.02)


def test_loglik_gamma_inv_matches_numpy(small_msa):
    names = list(small_msa.keys())
    codes = msa_to_codes(names, [small_msa[n] for n in names])
    spec = ModelSpec.parse("JTT+F+I+G")
    model = SubstModel.build(
        spec, empirical_freqs=empirical_frequencies(codes), alpha=0.7, p_inv=0.1
    )
    engine = LikelihoodEngine(names, [small_msa[n] for n in names], model)
    t = parse_newick("((t1:0.1,t2:0.2):0.05,(t3:0.15,t4:0.1):0.07);")
    children, blens = tree_to_arrays(t, names)
    ll = engine.loglik(children, blens)
    ref = _np_prune_loglik(t, small_msa, model)
    assert ll == pytest.approx(ref, abs=0.05)


def test_tree_array_roundtrip():
    t = parse_newick("((t1:0.1,t2:0.2):0.05,(t3:0.15,t4:0.1):0.07);")
    names = ["t1", "t2", "t3", "t4"]
    children, blens = tree_to_arrays(t, names)
    back = arrays_to_tree(children, blens, names)
    assert rf_distance(t, back) == 0


def test_nj_recovers_clades():
    # two clearly separated pairs
    msa = {
        "a1": "AAAAAAAAAACCCCCCCCCC",
        "a2": "AAAAAAAAAACCCCCCCCCD",
        "b1": "WWWWWWWWWWYYYYYYYYYY",
        "b2": "WWWWWWWWWWYYYYYYYYYF",
    }
    D = protein_distances(list(msa), list(msa.values()))
    tree = neighbor_joining(D, list(msa))
    bps = bipartitions(tree)
    assert frozenset({"a1", "a2"}) in bps or frozenset({"b1", "b2"}) in bps


def test_nni_neighbors_count():
    t = make_root_binary(
        parse_newick("((t1:0.1,t2:0.2):0.05,(t3:0.15,t4:0.1):0.07,t5:0.3);")
    )
    cands = nni_neighbors(t)
    # every candidate is a valid binary tree on the same taxa
    for c in cands:
        assert sorted(l.name for l in c.leaves()) == ["t1", "t2", "t3", "t4", "t5"]
    assert len(cands) >= 4


def test_search_recovers_true_topology():
    # simulate: clades (a1,a2) and (b1,b2) with distinct halves
    msa = {
        "a1": "ACDEFGHIKLACDEFGHIKLMNPQRSTVWY",
        "a2": "ACDEFGHIKLACDEFGHIKLMNPQRSTVWF",
        "b1": "ACDEFGHIKLWYWYWYWYWYMNPQRSTVWY",
        "b2": "ACDEFGHIKLWYWYWYWYWYMNPQRSTVWW",
        "c1": "ACDEFGHIKLKKKKKKKKKKMNPQRSTVWY",
    }
    names = list(msa.keys())
    spec = ModelSpec.parse("JTT+F")
    codes = msa_to_codes(names, [msa[n] for n in names])
    model = SubstModel.build(spec, empirical_freqs=empirical_frequencies(codes))
    engine = LikelihoodEngine(names, [msa[n] for n in names], model)

    # deliberately wrong starting topology
    start = parse_newick("((a1:0.1,b1:0.1):0.1,(a2:0.1,b2:0.1):0.1,c1:0.1);")
    search = TreeSearch(engine)
    best, ll = search.optimize(start, max_rounds=10, blen_steps=80)
    bps = set(bipartitions(unroot(best)).keys())
    assert frozenset({"a1", "a2"}) in bps
    assert frozenset({"b1", "b2"}) in bps


def test_polish_edges_fixes_low_support_split():
    """polish_edges: full-data NNI restricted to low-support splits
    repairs a deliberately perturbed topology (the supermatrix
    subsample-search stop-short pattern, config-4 round 5) and improves
    the likelihood; an already-correct tree is left unchanged."""
    msa = {
        "a1": "ACDEFGHIKLACDEFGHIKLMNPQRSTVWY",
        "a2": "ACDEFGHIKLACDEFGHIKLMNPQRSTVWF",
        "b1": "ACDEFGHIKLWYWYWYWYWYMNPQRSTVWY",
        "b2": "ACDEFGHIKLWYWYWYWYWYMNPQRSTVWW",
        "c1": "ACDEFGHIKLKKKKKKKKKKMNPQRSTVWY",
    }
    names = list(msa.keys())
    spec = ModelSpec.parse("JTT+F")
    codes = msa_to_codes(names, [msa[n] for n in names])
    model = SubstModel.build(spec, empirical_freqs=empirical_frequencies(codes))
    engine = LikelihoodEngine(names, [msa[n] for n in names], model)
    search = TreeSearch(engine)

    wrong = parse_newick("((a1:0.1,b1:0.1):0.1,(a2:0.1,b2:0.1):0.1,c1:0.1);")
    wrong_keys = list(bipartitions(make_root_binary(wrong)).keys())
    fixed, ll, moved = search.polish_edges(wrong, engine, wrong_keys,
                                           blen_steps=60, max_rounds=6)
    assert moved
    bps = set(bipartitions(unroot(fixed)).keys())
    assert frozenset({"a1", "a2"}) in bps
    assert frozenset({"b1", "b2"}) in bps

    # correct tree + its splits as "low": no improving move, unchanged
    good = parse_newick("((a1:0.1,a2:0.1):0.1,(b1:0.1,b2:0.1):0.1,c1:0.1);")
    good_keys = list(bipartitions(make_root_binary(good)).keys())
    same, ll2, moved2 = search.polish_edges(good, engine, good_keys,
                                            blen_steps=60, max_rounds=3)
    assert not moved2
    assert set(bipartitions(unroot(same)).keys()) == \
        set(bipartitions(unroot(good)).keys())


def test_bootstrap_supports_not_saturated():
    """Weak-signal splits must NOT all get 100% support: the enriched
    RELL candidate set (random NNI walks) lets trivial splits lose
    replicates (VERDICT round-1 weak #7)."""
    from unicore_tpu.phylo.engine import TreeEngine

    rng = np.random.RandomState(3)
    letters = "ARNDCQEGHILKMFPSTWYV"
    base = rng.choice(list(letters), 90)
    msa = {}
    for i in range(8):
        s = base.copy()
        # tiny, mostly-conflicting signal: a few random substitutions
        for _ in range(6):
            s[rng.randint(90)] = rng.choice(list(letters))
        msa[f"t{i}"] = "".join(s)
    eng = TreeEngine("iqtree")
    tree, _, _ = eng.infer(msa, n_boot=200, model_str="JTT+F")
    supports = [
        n.support for n in _all_nodes(tree)
        if n.children and n.support is not None
    ]
    assert supports, "no internal supports annotated"
    assert min(supports) < 95.0, supports


def _all_nodes(node):
    out = [node]
    for c in node.children:
        out.extend(_all_nodes(c))
    return out


def test_incremental_nni_matches_full_eval():
    """loglik_nni_moves (partial-CLV chains, stable ids) == full
    re-evaluation of the canonicalized swapped tree, for EVERY move."""
    from unicore_tpu.phylo.likelihood import arrays_to_tree, tree_to_arrays
    from unicore_tpu.phylo.search import apply_nni_move, nni_moves_arrays

    rng = np.random.RandomState(8)
    letters = "ARNDCQEGHILKMFPSTWYV"
    names = [f"t{i}" for i in range(10)]
    base = rng.choice(list(letters), 60)
    seqs = []
    for _ in names:
        s = base.copy()
        for _ in range(8):
            s[rng.randint(60)] = rng.choice(list(letters))
        seqs.append("".join(s))
    spec = ModelSpec.parse("JTT+F+G")
    codes = msa_to_codes(names, seqs)
    model = SubstModel.build(spec, empirical_freqs=empirical_frequencies(codes), alpha=0.8)
    eng = LikelihoodEngine(names, seqs, model)

    from unicore_tpu.phylo.nj import neighbor_joining, protein_distances
    from unicore_tpu.phylo.likelihood import make_root_binary
    t = make_root_binary(neighbor_joining(protein_distances(names, seqs), names))
    children, blens = tree_to_arrays(t, names)
    blens = np.maximum(blens, 0.02)

    moves = nni_moves_arrays(children, eng.n)
    # 2 per internal non-root node, + 2 root-edge rearrangements when
    # both root children are internal
    L, R = children[eng.n - 2]
    root_extra = 2 if (L >= eng.n and R >= eng.n) else 0
    assert len(moves) == 2 * (eng.n - 2) + root_extra
    inc = eng.loglik_nni_moves(children, blens, moves)
    for m, ll_inc in zip(moves, inc):
        cand = apply_nni_move(children, m)
        # canonicalize (renumber) and evaluate with the full pass
        t2 = arrays_to_tree(cand, blens, names)
        c2, b2 = tree_to_arrays(t2, names)
        ll_full = eng.loglik(c2, b2)
        assert abs(ll_inc - ll_full) < 0.05, (m, ll_inc, ll_full)


def test_search_uses_incremental_path_large_tree():
    """optimize() switches to the chain evaluator at >=48 taxa and still
    improves the likelihood."""
    rng = np.random.RandomState(21)
    letters = "ARNDCQEGHILKMFPSTWYV"
    names = [f"t{i}" for i in range(48)]
    base = rng.choice(list(letters), 50)
    seqs = []
    for _ in names:
        s = base.copy()
        for _ in range(5):
            s[rng.randint(50)] = rng.choice(list(letters))
        seqs.append("".join(s))
    spec = ModelSpec.parse("JTT+F")
    codes = msa_to_codes(names, seqs)
    model = SubstModel.build(spec, empirical_freqs=empirical_frequencies(codes))
    eng = LikelihoodEngine(names, seqs, model)
    from unicore_tpu.phylo.nj import neighbor_joining, protein_distances
    start = neighbor_joining(protein_distances(names, seqs), names)
    search = TreeSearch(eng)
    best, ll = search.optimize(start, max_rounds=2, blen_steps=40)
    assert np.isfinite(ll)
    assert sorted(l.name for l in best.leaves()) == sorted(names)


def test_ufboot_per_replicate_semantics():
    """Round-2 VERDICT #5 'done' criteria for the per-replicate bootstrap:
    supports differ measurably from the fixed-pool RELL values, respond
    to -B, and deep splits can lose replicates."""
    from unicore_tpu.phylo.bootstrap import rell_supports, ufboot_supports
    from unicore_tpu.phylo.engine import TreeEngine
    from unicore_tpu.phylo.likelihood import (
        LikelihoodEngine, make_root_binary, tree_to_arrays,
    )
    from unicore_tpu.phylo.models import ModelSpec, SubstModel
    from unicore_tpu.phylo.likelihood import empirical_frequencies, msa_to_codes
    from unicore_tpu.phylo.newick import bipartitions
    from unicore_tpu.phylo.search import TreeSearch, copy_tree

    rng = np.random.RandomState(9)
    letters = "ARNDCQEGHILKMFPSTWYV"
    base = rng.choice(list(letters), 80)
    msa = {}
    for i in range(7):
        s = base.copy()
        for _ in range(8):  # weak, partly conflicting signal
            s[rng.randint(80)] = rng.choice(list(letters))
        msa[f"t{i}"] = "".join(s)

    names = list(msa)
    seqs = [msa[n] for n in names]
    codes = msa_to_codes(names, seqs)
    spec = ModelSpec.parse("JTT+F")
    model = SubstModel.build(spec, empirical_freqs=empirical_frequencies(codes))
    engine = LikelihoodEngine(names, seqs, model)
    search = TreeSearch(engine)
    from unicore_tpu.phylo.nj import neighbor_joining, protein_distances
    best, _ = search.optimize(neighbor_joining(protein_distances(names, seqs), names))

    def sup_map(tree):
        return {bp: n.support for bp, n in bipartitions(tree).items()
                if n.support is not None}

    uf = sup_map(ufboot_supports(engine, copy_tree(best), n_boot=300, seed=1))
    assert uf, "no supports annotated"
    # deep splits can lose: at least one support strictly below 100
    assert min(uf.values()) < 100.0, uf

    # responds to -B: different replicate counts give different estimates
    uf_small = sup_map(ufboot_supports(engine, copy_tree(best), n_boot=20, seed=7))
    assert any(abs(uf[k] - uf_small[k]) > 1e-9 for k in uf), (uf, uf_small)

    # differs measurably from the fixed-pool RELL values on the same tree
    rooted = make_root_binary(copy_tree(best))
    cb, bb = tree_to_arrays(rooted, engine.names)
    import numpy as _np
    pool_c = [v[0] for v in search.visited[-8:]] + [cb]
    pool_b = [v[1] for v in search.visited[-8:]] + [bb]
    from unicore_tpu.phylo.likelihood import arrays_to_tree
    cands = [arrays_to_tree(c, b, engine.names) for c, b in zip(pool_c, pool_b)]
    sl = engine.site_loglik_batch(_np.stack(pool_c), _np.stack(pool_b))
    pooled = sup_map(rell_supports(
        copy_tree(best), cands, sl, _np.asarray(engine.weights, dtype=_np.float64),
        n_reps=300, seed=1,
    ))
    diffs = [abs(uf[k] - pooled[k]) for k in uf if k in pooled]
    assert diffs and max(diffs) > 1.0, (uf, pooled)


def test_pattern_chunked_likelihood_matches_unchunked():
    """Supermatrix-scale memory safety (config-4 OOM, round 4): the
    pattern-chunked likelihood/blens/site paths must match the
    unchunked computation to float tolerance."""
    import functools

    import jax.numpy as jnp
    import numpy as np

    from unicore_tpu.phylo.likelihood import (
        LikelihoodEngine, _loglik_batch_impl, _optimize_blens_impl,
        _pad_patterns, _site_loglik_batch_impl, make_root_binary,
        tree_to_arrays, pattern_chunk_for,
    )
    from unicore_tpu.phylo.models import ModelSpec, SubstModel
    from unicore_tpu.phylo.newick import Node

    rng = np.random.RandomState(6)
    AA = "ARNDCQEGHILKMFPSTWYV"
    base = rng.choice(list(AA), 700)
    seqs = []
    for _ in range(7):
        s = base.copy()
        pos = rng.choice(700, 150, replace=False)
        s[pos] = rng.choice(list(AA), len(pos))
        seqs.append("".join(s))
    eng = LikelihoodEngine([f"t{i}" for i in range(7)], seqs,
                           SubstModel.build(ModelSpec.parse("JTT+G")))
    nodes = [Node(name=f"t{i}") for i in range(7)]
    rng.shuffle(nodes)
    while len(nodes) > 1:
        a = nodes.pop(); b = nodes.pop()
        p = Node(); p.add(a); p.add(b)
        a.length = b.length = 0.12
        nodes.append(p)
    cb, bb = tree_to_arrays(make_root_binary(nodes[0]), eng.names)

    chunk = 128  # force chunking (P ~ several hundred patterns)
    tips_p, w_p = _pad_patterns(eng.tips, eng.w, chunk)
    P = int(eng.tips.shape[1])

    full = np.asarray(_loglik_batch_impl(
        jnp.asarray(cb)[None], jnp.asarray(bb, jnp.float32)[None],
        eng.tips, eng.w, n_taxa=eng.n, **eng._mp))
    chunked = np.asarray(_loglik_batch_impl(
        jnp.asarray(cb)[None], jnp.asarray(bb, jnp.float32)[None],
        tips_p, w_p, n_taxa=eng.n, pattern_chunk=chunk, **eng._mp))
    assert np.allclose(full, chunked, rtol=1e-5, atol=1e-2)

    sfull = np.asarray(_site_loglik_batch_impl(
        jnp.asarray(cb)[None], jnp.asarray(bb, jnp.float32)[None],
        eng.tips, n_taxa=eng.n, **eng._mp))
    tips_only, _ = _pad_patterns(eng.tips, eng.w, chunk)
    schunk = np.asarray(_site_loglik_batch_impl(
        jnp.asarray(cb)[None], jnp.asarray(bb, jnp.float32)[None],
        tips_only, n_taxa=eng.n, pattern_chunk=chunk, **eng._mp))[:, :P]
    assert np.allclose(sfull, schunk, rtol=1e-5, atol=1e-3)

    bfull, llfull = _optimize_blens_impl(
        jnp.asarray(cb), jnp.asarray(bb, jnp.float32),
        eng.tips, eng.w, n_taxa=eng.n, steps=40, **eng._mp)
    bch, llch = _optimize_blens_impl(
        jnp.asarray(cb), jnp.asarray(bb, jnp.float32),
        tips_p, w_p, n_taxa=eng.n, steps=40, pattern_chunk=chunk, **eng._mp)
    assert abs(float(llfull) - float(llch)) < 0.05
    assert np.allclose(np.asarray(bfull), np.asarray(bch), rtol=2e-3, atol=2e-4)

    # auto-selection kicks in for huge pattern counts
    assert pattern_chunk_for(100, 4, 85000) > 0
    assert pattern_chunk_for(8, 4, 500) == 0
