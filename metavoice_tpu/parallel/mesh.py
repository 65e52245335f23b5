"""Device-mesh construction for pjit sharding.

The reference is a single-process, single-GPU system with no distributed
backend at all (SURVEY.md section 2.2: ddp hardcoded False at
fam/llm/config/finetune_params.py:63-68, no NCCL/process groups anywhere).
Parallelism here is designed TPU-native from scratch: a 2-D
(data, tensor) ``jax.sharding.Mesh`` over which pjit/GSPMD emits the XLA
collectives (psum for TP reductions and DP grad all-reduce) over ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TENSOR_AXIS = "tensor"


def make_mesh(
    n_devices: int | None = None,
    tensor_parallel: int = 1,
    devices=None,
) -> Mesh:
    """(data, tensor) mesh over the first n_devices devices.

    ``tensor_parallel`` must divide the device count; the data axis takes the
    remainder. With defaults this is a pure-DP mesh; tensor_parallel=n gives
    pure TP for single-utterance latency scaling.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % tensor_parallel != 0:
        raise ValueError(f"tensor_parallel={tensor_parallel} does not divide {n} devices")
    grid = np.array(devices).reshape(n // tensor_parallel, tensor_parallel)
    return Mesh(grid, (DATA_AXIS, TENSOR_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (rank - 1))))
