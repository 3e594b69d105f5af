"""Device meshes for the pipeline stages.

The reference's parallelism is thread-count pass-through to foreign C++
binaries (envs/variables.rs:154-169) plus a CUDA flag; here parallelism
is an explicit 2-D jax.sharding.Mesh:

  * "dp" — data parallel: sequence batches (ProstT5 inference, SW pair
    batches, per-gene MSAs, bootstrap replicates)
  * "tp" — tensor parallel: ProstT5 weight shards (d_ff / attention
    heads); doubles as the sequence-parallel ("sp") axis for activations
    between attention blocks (Megatron-style: same devices, different
    tensor dimension)

Multi-host: call jax.distributed.initialize() per host (initialize()
here), then the same mesh spans all hosts — DP batches ride DCN,
TP collectives stay inside the ICI domain (devices are laid out so tp
groups devices on the same host slice).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> None:
    """Bring up jax.distributed when launched multi-host (no-op otherwise)."""
    if os.environ.get("UNICORE_TPU_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["UNICORE_TPU_COORDINATOR"],
            num_processes=int(os.environ.get("UNICORE_TPU_NUM_PROCS", "1")),
            process_id=int(os.environ.get("UNICORE_TPU_PROC_ID", "0")),
        )


def factor_mesh(n: int, tp_max: int = 8) -> Tuple[int, int]:
    """Split n devices into (dp, tp): prefer the largest tp <= tp_max that
    divides n (keeps TP groups small/ICI-local, DP wide)."""
    tp = 1
    for cand in range(min(tp_max, n), 0, -1):
        if n % cand == 0:
            tp = cand
            break
    return n // tp, tp


def make_mesh(
    n_devices: Optional[int] = None, dp: Optional[int] = None, tp: Optional[int] = None
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None or tp is None:
        dp, tp = factor_mesh(n)
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
