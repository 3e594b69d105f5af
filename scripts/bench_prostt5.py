"""ProstT5 inference throughput — residues/sec/chip at the REAL model
size (T5-XL encoder, 1024/16384x24 + CNN head, bf16), random weights
(identical FLOP cost to trained weights).

Methodology as bench.py: iteration loop inside one jit, distinct inputs
per iteration, dispatch RTT subtracted, min of 2 runs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_prostt5.py [B] [L] [iters]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from unicore_tpu.models.prostt5 import T5Config, init_params, predict_3di_codes


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    cfg = T5Config()  # full ProstT5-XL geometry
    n_params = (
        cfg.vocab * cfg.d_model
        + cfg.n_layers * (4 * cfg.d_model * cfg.d_kv * cfg.n_heads
                          + 2 * cfg.d_model * cfg.d_ff + 2 * cfg.d_model)
        + cfg.d_model
    )
    print(f"platform={jax.devices()[0].platform} params~{n_params/1e9:.2f}B "
          f"B={B} L={L}", file=sys.stderr)
    params = init_params(cfg, seed=0)  # bf16
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32))
    mask = jnp.asarray(np.ones((B, L), bool))

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params, seed, n):
        def body(i, acc):
            t2 = jnp.roll(toks, i + seed, axis=0) % 20
            codes = predict_3di_codes(params, cfg, t2, mask)
            return acc + jnp.sum(codes)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    t0 = time.time()
    jax.block_until_ready(loop(params, jnp.int32(0), n=iters))
    print(f"compile+warm {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for seed in (100, 200):
        t0 = time.time()
        jax.block_until_ready(loop(params, jnp.int32(seed), n=iters))
        times.append(time.time() - t0)
    dt = max((min(times) - 0.1) / iters, 1e-6)
    rps = B * L / dt
    # 2 FLOPs/MAC * (attn qkvo 4*d*kv*h + ffn 2*d*ff) per token per layer
    flops_tok = 2 * cfg.n_layers * (
        4 * cfg.d_model * cfg.d_kv * cfg.n_heads + 2 * cfg.d_model * cfg.d_ff
    ) + 2 * cfg.n_layers * 2 * L * cfg.d_kv * cfg.n_heads  # + attn scores
    print(json.dumps({
        "metric": "prostt5_residues_per_sec_per_chip",
        "value": round(rps),
        "unit": "res/s",
        "ms_per_batch": round(dt * 1e3, 1),
        "model_tflops": round(rps * flops_tok / 1e12, 1),
    }))


if __name__ == "__main__":
    main()
