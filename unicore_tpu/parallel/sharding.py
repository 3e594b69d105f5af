"""Sharding rules + sharded training/inference steps for ProstT5.

DP over batch, TP over d_ff / attention heads, SP (sequence sharding of
activations over the tp axis) between blocks.  The model has no MoE
layers (no "ep") and at ProstT5 depth pipeline parallelism is strictly
worse than TP on a single slice, so "pp" is intentionally not used —
dp/tp/sp are the load-bearing axes for this model family.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unicore_tpu.models.prostt5 import T5Config, cnn_head, encoder_forward


def param_pspecs(params: Dict) -> Dict:
    """PartitionSpec pytree for the ProstT5 param dict (TP over d_ff/heads)."""

    def layer_spec(layer):
        spec = {
            "ln1": P(),
            "q": P(None, "tp"),
            "k": P(None, "tp"),
            "v": P(None, "tp"),
            "o": P("tp", None),
            "ln2": P(),
            "wo": P("tp", None),
        }
        if "wi" in layer:          # original-T5 relu FFN (ProstT5)
            spec["wi"] = P(None, "tp")
        else:                      # gated-gelu variant
            spec["wi0"] = P(None, "tp")
            spec["wi1"] = P(None, "tp")
        return spec

    return {
        "embed": P(),
        "rel_bias": P(),
        "final_ln": P(),
        "layers": [layer_spec(l) for l in params["layers"]],
        "cnn": {"w1": P(), "b1": P(), "w2": P(), "b2": P()},
    }


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )


def loss_fn(params, cfg: T5Config, tokens, mask, labels):
    h = encoder_forward(params, cfg, tokens, mask)
    # SP: between encoder and head, constrain activations sharded along
    # sequence over the tp axis (Megatron sequence parallelism)
    h = jax.lax.with_sharding_constraint(h, P("dp", "tp", None))
    logits = cnn_head(params, cfg, h)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_train_step(cfg: T5Config, mesh: Mesh, lr: float = 1e-4):
    """Jitted sharded train step: (params, opt_state, batch) -> ..."""
    opt = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, tokens, mask, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, cfg, tokens, mask, labels)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init_opt(params):
        return opt.init(params)

    return step, init_opt


def make_sharded_predict(cfg: T5Config, mesh: Mesh):
    """Sharded inference: tokens (B, L) dp-sharded -> 3Di codes."""

    @jax.jit
    def predict(params, tokens, mask):
        from unicore_tpu.models.prostt5 import residue_logits
        return jnp.argmax(residue_logits(params, cfg, tokens, mask), axis=-1)

    def run(params, tokens, mask):
        ds = NamedSharding(mesh, P("dp", None))
        tokens = jax.device_put(tokens, ds)
        mask = jax.device_put(mask, ds)
        return predict(params, tokens, mask)

    return run
