"""Felsenstein pruning as batched matmuls (the IQ-TREE/RAxML/FastTree
likelihood core, re-designed for TPU).

Topology is encoded as arrays so that a single jitted function evaluates
ANY topology of the same size — and `jax.vmap` over the topology arrays
evaluates whole batches of NNI candidates in one device program:

  * nodes 0..n-1 are leaves, n..2n-2 internal, root = 2n-2
  * children[(i - n)] = (left, right) node ids, ordered so children < i
  * blens[e] = branch length of the edge above node e (root entry unused)

Per internal node the conditional likelihood vector (CLV) update is

    clv[i] = (clv[l] @ P(t_l)^T) * (clv[r] @ P(t_r)^T)

over (rate-categories, site-patterns, 20) tensors — two MXU matmuls and
one VPU multiply per node, scanned over the postorder.  Per-category
log-scaling vectors prevent underflow.  Everything is differentiable wrt
branch lengths (transition matrices go through the model's fixed
eigenbasis), so branch-length optimization is jax.grad + optax.

Site columns are compressed to unique patterns with multiplicities
before upload (classic aliasing), typically a 2-10x site reduction.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unicore_tpu.alphabets import encode_aa
from unicore_tpu.phylo.models import SubstModel
from unicore_tpu.phylo.newick import Node


# ---------------------------------------------------------------------------
# alignment -> patterns
# ---------------------------------------------------------------------------

def compress_patterns(msa_codes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(n_taxa, L) int codes -> (patterns (n_taxa, P), weights (P,))."""
    cols = np.ascontiguousarray(msa_codes.T)
    uniq, counts = np.unique(cols, axis=0, return_counts=True)
    return uniq.T.copy(), counts.astype(np.float64)


def msa_to_codes(names: List[str], seqs: List[str]) -> np.ndarray:
    """Aligned AA strings -> (n, L) int codes with 20 for gaps/unknown."""
    arr = np.stack([encode_aa(s) for s in seqs]).astype(np.int32)
    return arr


def empirical_frequencies(codes: np.ndarray) -> np.ndarray:
    counts = np.bincount(codes[codes < 20].ravel(), minlength=20).astype(np.float64)
    counts += 1.0  # pseudocount
    return counts / counts.sum()


# ---------------------------------------------------------------------------
# tree <-> arrays
# ---------------------------------------------------------------------------

def tree_to_arrays(root: Node, taxon_order: List[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Binary rooted tree -> (children (n-1, 2), blens (2n-1,)).

    Leaves get ids from taxon_order; internal nodes are numbered in
    postorder (guaranteeing children < parent).  The tree must be binary
    (root with 2 children); callers root unrooted trees first.
    """
    tid = {name: i for i, name in enumerate(taxon_order)}
    n = len(taxon_order)
    children = np.zeros((n - 1, 2), dtype=np.int32)
    blens = np.zeros(2 * n - 1, dtype=np.float64)
    next_internal = [n]

    def assign(node: Node) -> int:
        if node.is_leaf:
            i = tid[node.name]
            blens[i] = max(node.length, 1e-8)
            return i
        assert len(node.children) == 2, "tree must be binary"
        l = assign(node.children[0])
        r = assign(node.children[1])
        i = next_internal[0]
        next_internal[0] += 1
        children[i - n] = (l, r)
        blens[i] = max(node.length, 1e-8)
        return i

    root_id = assign(root)
    assert root_id == 2 * n - 2
    return children, blens


def arrays_to_tree(
    children: np.ndarray, blens: np.ndarray, taxon_order: List[str]
) -> Node:
    n = len(taxon_order)
    nodes = [Node(name) for name in taxon_order] + [Node() for _ in range(n - 1)]
    for i in range(n, 2 * n - 1):
        l, r = children[i - n]
        nodes[i].add(nodes[l])
        nodes[i].add(nodes[r])
    for e in range(2 * n - 2):
        nodes[e].length = float(blens[e])
    return nodes[2 * n - 2]


def make_root_binary(node: Node) -> Node:
    """Root an unrooted (trifurcating-root) tree into binary form by
    splitting the first child off; inverse of unroot()."""
    if len(node.children) == 2:
        return node
    assert len(node.children) >= 3
    first = node.children[0]
    rest = Node()
    for c in node.children[1:]:
        rest.add(c)
    rest.length = 0.0
    new_root = Node()
    new_root.add(first)
    new_root.add(rest)
    return new_root


def unroot(root: Node) -> Node:
    """Collapse a binary root into the standard trifurcation."""
    if len(root.children) != 2:
        return root
    a, b = root.children
    if b.is_leaf and not a.is_leaf:
        a, b = b, a
    if b.is_leaf:  # two-leaf tree
        return root
    merged = Node()
    merged.add(a)
    a.length = a.length + b.length
    for c in b.children:
        merged.add(c)
    merged.support = None
    return merged


# ---------------------------------------------------------------------------
# likelihood core (jax)
# ---------------------------------------------------------------------------

def _blockdiag_pmats(blens, rates, eigvals, U, Uinv):
    """(2n-1, C*20, C*20) block-diagonal transition matrices — one per
    edge, categories stacked on the diagonal (see _loglik_core)."""
    rt = blens[:, None] * rates[None, :]
    expl = jnp.exp(rt[:, :, None] * eigvals[None, None, :])
    Pmats = jnp.einsum("ij,ecj,jk->ecik", U, expl, Uinv)
    Pmats = jnp.clip(Pmats, 1e-12, None)
    E, C = Pmats.shape[0], Pmats.shape[1]
    Pblk = jnp.zeros((E, C * 20, C * 20), Pmats.dtype)
    for c in range(C):
        Pblk = Pblk.at[:, c * 20:(c + 1) * 20, c * 20:(c + 1) * 20].set(
            Pmats[:, c])
    return Pblk


def _loglik_core(
    children: jnp.ndarray,   # (n-1, 2) int32
    blens: jnp.ndarray,      # (2n-1,) float32
    tips: jnp.ndarray,       # (n, P, 20) float32 one-hot (gap = ones)
    weights: jnp.ndarray,    # (P,) float32
    eigvals: jnp.ndarray,    # (20,)
    U: jnp.ndarray,          # (20, 20)
    Uinv: jnp.ndarray,       # (20, 20)
    pi: jnp.ndarray,         # (20,)
    rates: jnp.ndarray,      # (C,)
    props: jnp.ndarray,      # (C,)
    n_taxa: int,
) -> jnp.ndarray:
    n = n_taxa
    C = rates.shape[0]
    P = tips.shape[1]

    # CLVs live as (P, C*20) with the transition matrices BLOCK-DIAGONAL
    # (C*20, C*20): the per-node update becomes one (P, 80) @ (80, 80)
    # matmul instead of C separate (P, 20) @ (20, 20) ones.  A 20-wide
    # contraction uses ~2.4% of a 128x128 MXU pass; the 80-wide
    # block-diagonal spends 4x the flops for 16x the utilization — the
    # measured win is the difference between feasible and not on
    # supermatrix NNI rounds (BENCH_NOTES round 4).  Zero blocks
    # contribute exact zeros, so values match the per-category form up
    # to f32 summation order.
    Pblk = _blockdiag_pmats(blens, rates, eigvals, U, Uinv)

    buf = jnp.zeros((2 * n - 1, P, C * 20), tips.dtype)
    buf = buf.at[:n].set(jnp.tile(tips, (1, 1, C)))
    logscale = jnp.zeros((2 * n - 1, P, C), tips.dtype)

    def body(carry, idx):
        buf, logscale = carry
        i = idx + n
        l = children[idx, 0]
        r = children[idx, 1]
        ml = buf[l] @ Pblk[l].T          # (P, C*20)
        mr = buf[r] @ Pblk[r].T
        clv = ml * mr
        # per-category scaling: max over each 20-block
        m = jnp.max(clv.reshape(P, C, 20), axis=-1)
        m = jnp.maximum(m, 1e-30)        # (P, C)
        clv = clv / jnp.repeat(m, 20, axis=1)
        ls = logscale[l] + logscale[r] + jnp.log(m)
        buf = buf.at[i].set(clv)
        logscale = logscale.at[i].set(ls)
        return (buf, logscale), None

    (buf, logscale), _ = jax.lax.scan(
        body, (buf, logscale), jnp.arange(n - 1)
    )

    root = 2 * n - 2
    site_cat = buf[root].reshape(P, C, 20) @ pi      # (P, C)
    log_site_cat = jnp.log(jnp.clip(site_cat, 1e-30, None)) + logscale[root]
    # mix categories in log space
    log_site = jax.scipy.special.logsumexp(
        log_site_cat + jnp.log(props)[None, :], axis=1
    )
    return jnp.sum(log_site * weights)


# topology SEARCH happens on at most this many patterns (see
# subsampled_engine); final branch lengths / lnL always use full data
SEARCH_PATTERN_CAP = 8192


def subsampled_engine(eng, k: int = SEARCH_PATTERN_CAP, seed: int = 12345):
    """Weighted-bootstrap pattern subsample of a LikelihoodEngine for
    topology SEARCH.

    k patterns are drawn with replacement proportional to the pattern
    weights; duplicate draws merge into counts rescaled so the total
    site count is preserved — an unbiased RELL-style estimator of the
    log-likelihood.  Rationale: on a 100-taxa concatenated supermatrix
    (~85K patterns) a full-data NNI round is ~40 TFLOP of 20-wide
    einsums (~2% MXU utilization) — hours per round — while topology
    DECISIONS are robust to site resampling (the same principle UFBoot
    rests on).  The subsample also brings the base-CLV cache back under
    memory, re-enabling the O(depth) incremental NNI path.  Search
    returns to the FULL engine for final branch lengths and lnL
    (TreeSearch.optimize)."""
    P = int(eng.patterns.shape[1])
    if P <= k:
        return eng
    rng = np.random.RandomState(seed)
    wsum = float(eng.weights.sum())
    probs = np.asarray(eng.weights, np.float64) / wsum
    draws = rng.choice(P, size=k, p=probs)
    idx, cnt = np.unique(draws, return_counts=True)
    sub = object.__new__(type(eng))
    sub.names = eng.names
    sub.n = eng.n
    sub.L = eng.L
    sub.patterns = eng.patterns[:, idx]
    sub.n_patterns_real = len(idx)
    sub.weights = (cnt * (wsum / k)).astype(np.float32)
    sub.tips = eng.tips[:, idx, :]
    sub.w = jnp.asarray(sub.weights)
    sub.model = eng.model
    sub._mp = eng._mp
    return sub


def pattern_chunk_for(n_taxa: int, n_cat: int, P: int,
                      budget_bytes: float = 8e8) -> int:
    """Pattern-chunk size bounding the CLV buffer (2n-1, C, chunk, 20)
    f32 to ~`budget_bytes` — 0 when the whole thing already fits.

    Sites are independent, so every likelihood is a SUM over pattern
    chunks; chunking (lax.map, plus jax.checkpoint where gradients flow)
    turns the O(nodes * patterns) CLV memory into O(nodes * chunk).
    Without it a 100-taxa concatenated supermatrix (85K patterns) holds
    a 5.4 GB CLV buffer — and its autodiff residuals OOMed the chip in
    branch-length optimization (config-4 run, round 4)."""
    clv_bytes = (2 * n_taxa - 1) * n_cat * P * 20 * 4
    if clv_bytes <= budget_bytes:
        return 0
    chunk = 1024
    while (2 * n_taxa - 1) * n_cat * (chunk * 2) * 20 * 4 <= budget_bytes \
            and chunk * 2 < P:
        chunk *= 2
    return chunk


def _pad_patterns(tips, weights, chunk: int):
    """Pad the pattern axis to a chunk multiple (all-ones tips with zero
    weight contribute exactly 0 to the summed log-likelihood)."""
    P = tips.shape[1]
    Pp = ((P + chunk - 1) // chunk) * chunk
    if Pp == P:
        return tips, weights
    padn = Pp - P
    tips = jnp.concatenate(
        [tips, jnp.ones((tips.shape[0], padn, 20), tips.dtype)], axis=1)
    weights = jnp.concatenate([weights, jnp.zeros(padn, weights.dtype)])
    return tips, weights


def _chunked_loglik(children, blens, tips, weights, mp, n_taxa: int,
                    chunk: int, remat: bool):
    """Sum of per-chunk _loglik_core over the pattern axis (lax.map)."""
    n = tips.shape[0]
    K = tips.shape[1] // chunk
    tipsK = jnp.moveaxis(tips.reshape(n, K, chunk, 20), 1, 0)
    wK = weights.reshape(K, chunk)

    def chunk_ll(tw):
        t_k, w_k = tw
        return _loglik_core(children, blens, t_k, w_k, n_taxa=n_taxa, **mp)

    fn = jax.checkpoint(chunk_ll) if remat else chunk_ll
    return jax.lax.map(fn, (tipsK, wK)).sum()


def _make_negll(children, tips, weights, mp, n_taxa, pattern_chunk):
    def negll(xx):
        if pattern_chunk:
            return -_chunked_loglik(children, jnp.exp(xx), tips, weights,
                                    mp, n_taxa, pattern_chunk, remat=True)
        return -_loglik_core(children, jnp.exp(xx), tips, weights,
                             n_taxa=n_taxa, **mp)
    return negll


@functools.partial(jax.jit, static_argnames=("n_taxa", "steps", "pattern_chunk"))
def _optimize_blens_seg(
    children, carry, tips, weights, eigvals, U, Uinv, pi, rates, props,
    n_taxa, steps, lr=0.05, pattern_chunk=0,
):
    """One SEGMENT of the adam loop on log-branch-lengths.

    The loop is split into bounded-step jit calls (carry = (x, adam
    state, best_x, best_v) threads through) instead of one whole-loop
    scan: splitting a scan at step boundaries is mathematically
    identical, and a single device execution of the full 150-step loop
    at supermatrix scale (C=5, ~90K patterns) exceeded the dev-tunnel
    worker's per-execution walltime limit and CRASHED the worker
    (measured round 5: 54 s executions survive, ~80 s kill it)."""
    import optax

    mp = dict(eigvals=eigvals, U=U, Uinv=Uinv, pi=pi, rates=rates, props=props)
    negll = _make_negll(children, tips, weights, mp, n_taxa, pattern_chunk)
    opt = optax.adam(lr)

    def step(carry, _):
        x, state, best_x, best_v = carry
        v, g = jax.value_and_grad(negll)(x)
        better = v < best_v
        best_x = jnp.where(better, x, best_x)
        best_v = jnp.where(better, v, best_v)
        updates, state = opt.update(g, state)
        x = optax.apply_updates(x, updates)
        return (x, state, best_x, best_v), None

    carry, _ = jax.lax.scan(step, carry, None, length=steps)
    return carry


@functools.partial(jax.jit, static_argnames=("n_taxa", "pattern_chunk"))
def _optimize_blens_finish(
    children, carry, tips, weights, eigvals, U, Uinv, pi, rates, props,
    n_taxa, pattern_chunk=0,
):
    mp = dict(eigvals=eigvals, U=U, Uinv=Uinv, pi=pi, rates=rates, props=props)
    negll = _make_negll(children, tips, weights, mp, n_taxa, pattern_chunk)
    x, _, best_x, best_v = carry
    v_final = negll(x)
    better = v_final < best_v
    best_x = jnp.where(better, x, best_x)
    best_v = jnp.where(better, v_final, best_v)
    return jnp.exp(best_x), -best_v


# steps per device execution in branch-length optimization; bounds the
# per-dispatch walltime (dev-tunnel worker limit) without changing the
# math.  Override: UNICORE_TPU_BLEN_SEG.
BLEN_SEG_STEPS = 50


def _optimize_blens_impl(
    children, blens0, tips, weights, eigvals, U, Uinv, pi, rates, props,
    n_taxa, steps, lr=0.05, pattern_chunk=0,
):
    """Segmented adam loop (see _optimize_blens_seg for why)."""
    import os

    import optax

    x0 = jnp.log(jnp.clip(blens0, 1e-7, None))
    carry = (x0, optax.adam(lr).init(x0), x0,
             jnp.asarray(jnp.inf, jnp.float32))
    seg = int(os.environ.get("UNICORE_TPU_BLEN_SEG", BLEN_SEG_STEPS))
    args = (tips, weights, eigvals, U, Uinv, pi, rates, props)
    done = 0
    while done < steps:
        k = min(seg, steps - done)
        carry = _optimize_blens_seg(
            children, carry, *args, n_taxa=n_taxa, steps=k, lr=lr,
            pattern_chunk=pattern_chunk,
        )
        done += k
    return _optimize_blens_finish(
        children, carry, *args, n_taxa=n_taxa, pattern_chunk=pattern_chunk,
    )


@functools.partial(jax.jit, static_argnames=("n_taxa", "pattern_chunk"))
def _loglik_batch_impl(
    children_b, blens_b, tips, weights, eigvals, U, Uinv, pi, rates, props,
    n_taxa, pattern_chunk=0,
):
    mp = dict(eigvals=eigvals, U=U, Uinv=Uinv, pi=pi, rates=rates, props=props)

    def one(c, b):
        if pattern_chunk:
            return _chunked_loglik(c, b, tips, weights, mp, n_taxa,
                                   pattern_chunk, remat=False)
        return _loglik_core(
            c, b, tips, weights, eigvals, U, Uinv, pi, rates, props, n_taxa
        )

    return jax.vmap(one)(children_b, blens_b)


def _auto_mesh():
    """1-D mesh over all local accelerator devices (None single-device).

    The topology batches (NNI rounds, UFBoot replicates' frontier
    evaluations) are embarrassingly parallel across candidate trees —
    on a multi-chip host they must not run at 1/N of the machine
    (tree.rs:233-257 inference stage; VERDICT r3 #2)."""
    devs = jax.devices()
    if len(devs) > 1 and devs[0].platform in ("tpu", "axon"):
        from jax.sharding import Mesh
        return Mesh(np.asarray(devs), ("dp",))
    return None


def _run_batch_sharded(impl, mesh, cb, bb, reps: tuple, n_taxa: int, mp: dict):
    """shard_map a batched topology evaluator over `mesh`'s first axis.

    cb/bb shard on the batch (topology) axis; `reps` (tips, weights, …)
    and the model tensors replicate.  Each device runs the same jitted
    vmap on its shard, so results are bit-identical to the single-device
    call.  The batch is padded (repeat of row 0) to a device-count
    multiple and sliced back."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map as _sm
        _sm_kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
        _sm_kw = {"check_rep": False}

    axis = mesh.axis_names[0]
    nd = int(mesh.devices.size)
    B = cb.shape[0]
    Bd = ((B + nd - 1) // nd) * nd
    if Bd != B:
        cb = np.concatenate([np.asarray(cb), np.repeat(np.asarray(cb[:1]), Bd - B, 0)])
        bb = np.concatenate([np.asarray(bb), np.repeat(np.asarray(bb[:1]), Bd - B, 0)])
    rep_sh = NamedSharding(mesh, P())
    reps_d = tuple(jax.device_put(r, rep_sh) for r in reps)
    mp_d = {k: jax.device_put(v, rep_sh) for k, v in mp.items()}

    def local(c, b, *r):
        return impl(c, b, *r, n_taxa=n_taxa, **mp_d)

    fn = _sm(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis)) + (P(),) * len(reps_d),
        out_specs=P(axis),
        **_sm_kw,
    )
    sh = NamedSharding(mesh, P(axis))
    args = [jax.device_put(jnp.asarray(cb), sh),
            jax.device_put(jnp.asarray(bb, jnp.float32), sh)]
    args += list(reps_d)
    return np.asarray(jax.jit(fn)(*args))[:B]


class LikelihoodEngine:
    """Holds device-resident alignment tensors + model; evaluates trees."""

    def __init__(self, names: List[str], seqs: List[str], model: SubstModel,
                 pad_patterns_to: int = 0):
        self.names = list(names)
        codes = msa_to_codes(names, seqs)
        patterns, weights = compress_patterns(codes)
        self.n_patterns_real = patterns.shape[1]
        if pad_patterns_to > patterns.shape[1]:
            # zero-weight all-unknown pad columns: identical lnL, but the
            # jitted evaluators compile once per (n_taxa, P_bucket) shape
            # and are shared across genes (batched gene-tree inference)
            padn = pad_patterns_to - patterns.shape[1]
            patterns = np.concatenate(
                [patterns, np.full((patterns.shape[0], padn), 20, patterns.dtype)],
                axis=1,
            )
            weights = np.concatenate([weights, np.zeros(padn, weights.dtype)])
        self.n = len(names)
        self.patterns = patterns
        self.weights = weights.astype(np.float32)
        self.L = codes.shape[1]
        tips = np.zeros((self.n, patterns.shape[1], 20), dtype=np.float32)
        for t in range(self.n):
            col = patterns[t]
            known = col < 20
            tips[t, known, col[known]] = 1.0
            tips[t, ~known, :] = 1.0
        self.tips = jnp.asarray(tips)
        self.w = jnp.asarray(self.weights)
        self.set_model(model)

    def set_model(self, model: SubstModel) -> None:
        self.model = model
        rates, props = model.rates_and_props()
        self._mp = dict(
            eigvals=jnp.asarray(model.eigvals, jnp.float32),
            U=jnp.asarray(model.U, jnp.float32),
            Uinv=jnp.asarray(model.Uinv, jnp.float32),
            pi=jnp.asarray(model.pi, jnp.float32),
            rates=jnp.asarray(rates, jnp.float32),
            props=jnp.asarray(props, jnp.float32),
        )

    # -- single tree (routed through the batched entry: one compile) ----
    def loglik(self, children: np.ndarray, blens: np.ndarray) -> float:
        return float(self.loglik_batch(
            np.asarray(children)[None], np.asarray(blens)[None], mesh=False)[0])

    # -- batched topologies (NNI rounds) --------------------------------
    def loglik_batch(
        self, children_batch: np.ndarray, blens_batch: np.ndarray,
        chunk: int = 0, mesh=None,
    ) -> np.ndarray:
        """Batched topology evaluation, chunked to bound CLV memory
        (each candidate carries a (2n-1, C, P, 20) buffer).  chunk=0
        picks the largest chunk keeping the CLV stack under ~4 GB.
        On a multi-device host (or with an explicit `mesh`) the
        candidate axis is sharded over the devices."""
        if mesh is None:
            mesh = _auto_mesh()
        elif mesh is False:  # explicit single-device (no auto mesh)
            mesh = None
        nd = int(mesh.devices.size) if mesh is not None else 1
        C = int(self._mp["rates"].shape[0])
        P = int(self.tips.shape[1])
        pchunk = pattern_chunk_for(self.n, C, P)
        tips, w = self.tips, self.w
        if pchunk:
            tips, w = _pad_patterns(tips, w, pchunk)
        if not chunk:
            clv_bytes = (2 * self.n - 1) * C * min(P, pchunk or P) * 20 * 4
            chunk = max(1, min(16, int(4e9 // max(clv_bytes, 1)))) * nd
        impl = functools.partial(_loglik_batch_impl, pattern_chunk=pchunk)
        B = children_batch.shape[0]
        outs = []
        for s0 in range(0, B, chunk):
            cb = children_batch[s0 : s0 + chunk]
            bb = blens_batch[s0 : s0 + chunk]
            if cb.shape[0] < chunk and B > chunk:
                pad = chunk - cb.shape[0]
                cb = np.concatenate([cb, np.repeat(cb[:1], pad, 0)])
                bb = np.concatenate([bb, np.repeat(bb[:1], pad, 0)])
            if mesh is not None:
                out = _run_batch_sharded(
                    impl, mesh, cb, bb,
                    (tips, w), self.n, self._mp,
                )
            else:
                out = impl(
                    jnp.asarray(cb), jnp.asarray(bb, jnp.float32),
                    tips, w, n_taxa=self.n, **self._mp,
                )
            outs.append(np.asarray(out))
        return np.concatenate(outs)[:B]

    # -- per-pattern site log-likelihoods (for RELL bootstrap) ----------
    def site_loglik(self, children: np.ndarray, blens: np.ndarray) -> np.ndarray:
        return self.site_loglik_batch(
            np.asarray(children)[None], np.asarray(blens)[None], mesh=False)[0]

    def site_loglik_batch(
        self, children_batch: np.ndarray, blens_batch: np.ndarray, chunk: int = 0,
        mesh=None,
    ) -> np.ndarray:
        """(B, P) per-pattern log-likelihoods for a topology batch —
        one vmapped device program per chunk (RELL/UFBoot candidate
        scoring).  Multi-device hosts shard the topology axis."""
        if mesh is None:
            mesh = _auto_mesh()
        elif mesh is False:  # explicit single-device (no auto mesh)
            mesh = None
        nd = int(mesh.devices.size) if mesh is not None else 1
        C = int(self._mp["rates"].shape[0])
        P = int(self.tips.shape[1])
        pchunk = pattern_chunk_for(self.n, C, P)
        tips = self.tips
        if pchunk:
            tips, _ = _pad_patterns(tips, self.w, pchunk)
        if not chunk:
            clv_bytes = (2 * self.n - 1) * C * min(P, pchunk or P) * 20 * 4
            chunk = max(1, min(32, int(4e9 // max(clv_bytes, 1)))) * nd
        impl = functools.partial(_site_loglik_batch_impl, pattern_chunk=pchunk)
        B = children_batch.shape[0]
        outs = []
        for s0 in range(0, B, chunk):
            cb = np.asarray(children_batch[s0 : s0 + chunk])
            bb = np.asarray(blens_batch[s0 : s0 + chunk])
            if cb.shape[0] < chunk and B > chunk:
                pad = chunk - cb.shape[0]
                cb = np.concatenate([cb, np.repeat(cb[:1], pad, 0)])
                bb = np.concatenate([bb, np.repeat(bb[:1], pad, 0)])
            if mesh is not None:
                out = _run_batch_sharded(
                    impl, mesh, cb, bb,
                    (tips,), self.n, self._mp,
                )
            else:
                out = impl(
                    jnp.asarray(cb), jnp.asarray(bb, jnp.float32),
                    tips, n_taxa=self.n, **self._mp,
                )
            outs.append(np.asarray(out))
        # pattern padding adds trailing zero-weight columns; slice back
        out_arr = np.concatenate(outs)[:B]
        return out_arr[:, :P] if out_arr.ndim == 2 else out_arr

    # -- incremental NNI evaluation (partial-CLV reuse) ------------------
    def loglik_nni_moves(
        self, children: np.ndarray, blens: np.ndarray,
        moves, chunk: int = 0,
    ) -> np.ndarray:
        """Log-likelihood of every NNI move (v, u, child_idx, sib_idx)
        applied to the base tree, recomputing only each move's
        O(depth) changed-CLV chain against a cached base-CLV pass.

        Node ids stay FIXED under the swap (no postorder renumbering):
        the chain evaluator only needs dependency order within the
        chain, and every untouched subtree's base CLV remains valid.
        """
        n = self.n
        base_buf, base_ls = _clv_cache_impl(
            jnp.asarray(children), jnp.asarray(blens, jnp.float32), self.tips,
            self._mp["eigvals"], self._mp["U"], self._mp["Uinv"],
            self._mp["rates"], n_taxa=n,
        )
        parent = np.zeros(2 * n - 1, dtype=np.int64)
        for k in range(n - 1):
            parent[children[k, 0]] = k + n
            parent[children[k, 1]] = k + n
        root = 2 * n - 2

        B = len(moves)
        chains = []
        for (v, u, child_idx, sib_idx) in moves:
            # swapped children rows for v and u
            c = int(children[v - n, child_idx])
            s = int(children[u - n, sib_idx])
            v_kids = list(children[v - n])
            v_kids[child_idx] = s
            u_kids = list(children[u - n])
            u_kids[sib_idx] = c
            # chain: v, u, then ancestors of u up to the root
            nodes = [v, u]
            a = u
            while a != root:
                a = int(parent[a])
                nodes.append(a)
            pos = {k: t for t, k in enumerate(nodes)}
            steps = []
            for t, k in enumerate(nodes):
                if k == v:
                    kids = v_kids
                elif k == u:
                    kids = u_kids
                else:
                    kids = list(children[k - n])
                l, r = int(kids[0]), int(kids[1])
                steps.append((
                    l, r, float(blens[l]), float(blens[r]),
                    pos.get(l, -1), pos.get(r, -1),
                ))
            chains.append(steps)

        D = max(len(c) for c in chains)
        arr = np.zeros((6, B, D), dtype=np.float64)
        for b, steps in enumerate(chains):
            while len(steps) < D:
                steps.append(steps[-1])  # repeat root step (idempotent)
            for t, st in enumerate(steps):
                for f in range(6):
                    arr[f, b, t] = st[f]
        cl = arr[0].astype(np.int32)
        cr = arr[1].astype(np.int32)
        lb = arr[2].astype(np.float32)
        rb = arr[3].astype(np.float32)
        lsrc = arr[4].astype(np.int32)
        rsrc = arr[5].astype(np.int32)

        if not chunk:
            C = int(self._mp["rates"].shape[0])
            per = D * C * int(self.patterns.shape[1]) * 20 * 4
            chunk = max(1, min(64, int(3e9 // max(per, 1))))
        outs = []
        for s0 in range(0, B, chunk):
            sl = slice(s0, s0 + chunk)
            pads = 0
            csl = [cl[sl], cr[sl], lb[sl], rb[sl], lsrc[sl], rsrc[sl]]
            if csl[0].shape[0] < chunk and B > chunk:
                pads = chunk - csl[0].shape[0]
                csl = [np.concatenate([x, np.repeat(x[:1], pads, 0)]) for x in csl]
            out = _loglik_incremental_impl(
                *[jnp.asarray(x) for x in csl],
                base_buf, base_ls, self.w, n_taxa=n, **self._mp,
            )
            outs.append(np.asarray(out))
        return np.concatenate(outs)[:B]

    # -- branch-length optimization (adam on log-lengths) ---------------
    def optimize_blens(
        self, children: np.ndarray, blens: np.ndarray,
        steps: int = 200, lr: float = 0.05,
    ) -> Tuple[np.ndarray, float]:
        chunk = pattern_chunk_for(self.n, int(self._mp["rates"].shape[0]),
                                  int(self.tips.shape[1]))
        tips, w = self.tips, self.w
        if chunk:
            tips, w = _pad_patterns(tips, w, chunk)
        blens_opt, ll = _optimize_blens_impl(
            jnp.asarray(children), jnp.asarray(blens, jnp.float32),
            tips, w, n_taxa=self.n, steps=steps, pattern_chunk=chunk,
            **self._mp,
        )
        out = np.asarray(blens_opt, dtype=np.float64)
        out[2 * self.n - 2] = 0.0
        return out, float(ll)


@functools.partial(jax.jit, static_argnames=("n_taxa",))
def _site_loglik(
    children, blens, tips, eigvals, U, Uinv, pi, rates, props, n_taxa
):
    """Per-pattern log-likelihood vector (P,).

    Same block-diagonal (P, C*20) formulation as _loglik_core (MXU
    utilization; see the comment there)."""
    n = n_taxa
    C = rates.shape[0]
    P = tips.shape[1]
    Pblk = _blockdiag_pmats(blens, rates, eigvals, U, Uinv)
    buf = jnp.zeros((2 * n - 1, P, C * 20), tips.dtype)
    buf = buf.at[:n].set(jnp.tile(tips, (1, 1, C)))
    logscale = jnp.zeros((2 * n - 1, P, C), tips.dtype)

    def body(carry, idx):
        buf, logscale = carry
        i = idx + n
        l = children[idx, 0]
        r = children[idx, 1]
        clv = (buf[l] @ Pblk[l].T) * (buf[r] @ Pblk[r].T)
        m = jnp.maximum(jnp.max(clv.reshape(P, C, 20), axis=-1), 1e-30)
        buf = buf.at[i].set(clv / jnp.repeat(m, 20, axis=1))
        logscale = logscale.at[i].set(logscale[l] + logscale[r] + jnp.log(m))
        return (buf, logscale), None

    (buf, logscale), _ = jax.lax.scan(body, (buf, logscale), jnp.arange(n - 1))
    root = 2 * n - 2
    site_cat = buf[root].reshape(P, C, 20) @ pi
    log_site_cat = jnp.log(jnp.clip(site_cat, 1e-30, None)) + logscale[root]
    return jax.scipy.special.logsumexp(
        log_site_cat + jnp.log(props)[None, :], axis=1
    )


# ---------------------------------------------------------------------------
# incremental NNI evaluation: base-tree CLV cache + per-candidate chains
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_taxa",))
def _clv_cache_impl(children, blens, tips, eigvals, U, Uinv, rates, n_taxa):
    """Full postorder CLV pass returning (buf, logscale) for reuse.

    Same block-diagonal (P, C*20) formulation as _loglik_core (one
    80-wide MXU matmul per child edge instead of C 20-wide einsums —
    see the utilization comment there); buf is (2n-1, P, C*20) and
    logscale (2n-1, P, C), the layout _loglik_incremental_impl reads."""
    n = n_taxa
    C = rates.shape[0]
    P = tips.shape[1]
    Pblk = _blockdiag_pmats(blens, rates, eigvals, U, Uinv)
    buf = jnp.zeros((2 * n - 1, P, C * 20), tips.dtype)
    buf = buf.at[:n].set(jnp.tile(tips, (1, 1, C)))
    logscale = jnp.zeros((2 * n - 1, P, C), tips.dtype)

    def body(carry, idx):
        buf, logscale = carry
        i = idx + n
        l = children[idx, 0]
        r = children[idx, 1]
        clv = (buf[l] @ Pblk[l].T) * (buf[r] @ Pblk[r].T)
        m = jnp.maximum(jnp.max(clv.reshape(P, C, 20), axis=-1), 1e-30)
        buf = buf.at[i].set(clv / jnp.repeat(m, 20, axis=1))
        logscale = logscale.at[i].set(logscale[l] + logscale[r] + jnp.log(m))
        return (buf, logscale), None

    (buf, logscale), _ = jax.lax.scan(body, (buf, logscale), jnp.arange(n - 1))
    return buf, logscale


@functools.partial(jax.jit, static_argnames=("n_taxa",))
def _loglik_incremental_impl(
    chain_l, chain_r, chain_lb, chain_rb, chain_lsrc, chain_rsrc,  # (B, D)
    base_buf, base_logscale,  # (2n-1, C, P, 20), (2n-1, C, P)
    weights, eigvals, U, Uinv, pi, rates, props, n_taxa,
):
    """Log-likelihood of B NNI candidates by recomputing ONLY each
    candidate's changed-node chain (the edited edge's two nodes plus
    their ancestors), reading every untouched CLV from the base cache.
    O(depth) CLV updates per candidate instead of O(n).

    Block-diagonal (P, C*20) CLVs as in _loglik_core: each chain step
    is one 80-wide MXU matmul per child edge instead of C 20-wide
    einsums, matching the base cache's layout (_clv_cache_impl)."""
    C = rates.shape[0]
    P = base_buf.shape[1]
    D = chain_l.shape[1]

    def pmat_blk(blen):
        """(C*20, C*20) block-diagonal transition matrix for one edge."""
        expl = jnp.exp(blen * rates[:, None] * eigvals[None, :])  # (C, 20)
        M = jnp.clip(jnp.einsum("ij,cj,jk->cik", U, expl, Uinv), 1e-12, None)
        blk = jnp.zeros((C * 20, C * 20), M.dtype)
        for c in range(C):
            blk = blk.at[c * 20:(c + 1) * 20, c * 20:(c + 1) * 20].set(M[c])
        return blk

    def one(ls_, rs_, lb_, rb_, lsrc_, rsrc_):
        cbuf = jnp.zeros((D, P, C * 20), base_buf.dtype)
        cls = jnp.zeros((D, P, C), base_buf.dtype)

        def step(carry, t):
            cbuf, cls = carry
            l, r = ls_[t], rs_[t]
            lsrc, rsrc = lsrc_[t], rsrc_[t]
            clv_l = jnp.where(lsrc >= 0, cbuf[jnp.maximum(lsrc, 0)], base_buf[l])
            sc_l = jnp.where(lsrc >= 0, cls[jnp.maximum(lsrc, 0)], base_logscale[l])
            clv_r = jnp.where(rsrc >= 0, cbuf[jnp.maximum(rsrc, 0)], base_buf[r])
            sc_r = jnp.where(rsrc >= 0, cls[jnp.maximum(rsrc, 0)], base_logscale[r])
            clv = (clv_l @ pmat_blk(lb_[t]).T) * (clv_r @ pmat_blk(rb_[t]).T)
            m = jnp.maximum(jnp.max(clv.reshape(P, C, 20), axis=-1), 1e-30)
            cbuf = cbuf.at[t].set(clv / jnp.repeat(m, 20, axis=1))
            cls = cls.at[t].set(sc_l + sc_r + jnp.log(m))
            return (cbuf, cls), None

        (cbuf, cls), _ = jax.lax.scan(step, (cbuf, cls), jnp.arange(D))
        site_cat = cbuf[D - 1].reshape(P, C, 20) @ pi        # (P, C)
        log_site_cat = jnp.log(jnp.clip(site_cat, 1e-30, None)) + cls[D - 1]
        log_site = jax.scipy.special.logsumexp(
            log_site_cat + jnp.log(props)[None, :], axis=1
        )
        return jnp.sum(log_site * weights)

    return jax.vmap(one)(chain_l, chain_r, chain_lb, chain_rb, chain_lsrc, chain_rsrc)


@functools.partial(jax.jit, static_argnames=("n_taxa", "pattern_chunk"))
def _site_loglik_batch_impl(
    children_b, blens_b, tips, eigvals, U, Uinv, pi, rates, props, n_taxa,
    pattern_chunk=0,
):
    def one(c, b):
        if pattern_chunk:
            n = tips.shape[0]
            K = tips.shape[1] // pattern_chunk
            tipsK = jnp.moveaxis(tips.reshape(n, K, pattern_chunk, 20), 1, 0)

            def chunk_sl(t_k):
                return _site_loglik(c, b, t_k, eigvals, U, Uinv, pi,
                                    rates, props, n_taxa)

            return jax.lax.map(chunk_sl, tipsK).reshape(-1)
        return _site_loglik(c, b, tips, eigvals, U, Uinv, pi, rates, props, n_taxa)

    return jax.vmap(one)(children_b, blens_b)
