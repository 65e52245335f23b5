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


# --------------------------------------------------------------------------------------
# Multi-host (multi-process) meshes — v5e slices over ICI, pods over DCN
# --------------------------------------------------------------------------------------
#
# SURVEY.md §2.2 names `jax.distributed` + DCN as the TPU-native bar for the
# rebuilt distributed backend. One JAX process runs per host; each host owns
# its local chips (4 on a v5e host). After `initialize_distributed()`,
# `jax.devices()` returns the GLOBAL device list on every process and
# GSPMD/pjit programs are compiled against the global mesh — per-host code
# only ever feeds its local shard (see `process_batch_slice`).
#
# Axis placement rule (How-to-Scale-Your-Model recipe): the mesh's trailing
# (tensor) axis must stay INSIDE a host/slice so TP collectives ride ICI;
# the leading (data) axis may span hosts, because DP gradients all-reduce
# once per step and tolerate DCN latency. `make_multihost_mesh` enforces
# this by requiring tensor_parallel <= local device count.
#
# This repo runs on a single-chip tunnel, so real multi-host execution is
# untestable here; the process/mesh math below is unit-tested with mocked
# process counts (tests/test_sharding.py) and documented in
# docs/ARCHITECTURE.md.


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """`jax.distributed.initialize` wrapper (no-op when single-process).

    On TPU pods the three arguments are auto-detected from the TPU metadata
    server, so bare ``initialize_distributed()`` is correct on Cloud TPU;
    pass them explicitly for DCN-connected CPU/GPU fleets. Call BEFORE any
    other JAX API touches the backend.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(
    tensor_parallel: int = 1,
    *,
    devices=None,
    process_count: int | None = None,
    local_device_count: int | None = None,
) -> Mesh:
    """Global (data, tensor) mesh aware of the process topology.

    The device grid is laid out host-major: JAX's global device list orders
    devices by process, so reshaping to (data, tensor) with
    tensor_parallel <= devices-per-host keeps every TP group within one
    host's ICI domain, and only the data axis crosses DCN.

    ``process_count``/``local_device_count`` exist for unit-testing the
    topology math without a real multi-host backend.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    procs = process_count if process_count is not None else jax.process_count()
    local = (
        local_device_count
        if local_device_count is not None
        else max(1, n // max(procs, 1))
    )
    if tensor_parallel > local or local % tensor_parallel != 0:
        raise ValueError(
            f"tensor_parallel={tensor_parallel} does not pack into the "
            f"{local} devices local to one host: TP groups would straddle "
            "hosts and their collectives would cross DCN. Shard the batch "
            "(data axis) across hosts instead."
        )
    if n % tensor_parallel != 0:
        raise ValueError(
            f"tensor_parallel={tensor_parallel} does not divide {n} devices"
        )
    grid = np.array(devices).reshape(n // tensor_parallel, tensor_parallel)
    return Mesh(grid, (DATA_AXIS, TENSOR_AXIS))


def process_batch_slice(
    global_batch: int,
    *,
    process_index: int | None = None,
    process_count: int | None = None,
) -> tuple[int, int]:
    """[start, stop) rows of the global batch owned by this process.

    Multi-host input pipeline contract: every process builds the SAME global
    jit call but materializes only its local rows;
    `jax.make_array_from_process_local_data` assembles the global array.
    """
    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    if global_batch % pc != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {pc} processes"
        )
    per = global_batch // pc
    return pi * per, (pi + 1) * per


def local_batch_to_global(mesh: Mesh, local_rows, rank: int = 1):
    """Assemble a per-process batch shard into a global sharded array.

    ``local_rows``: this process's rows of the (leading-axis data-sharded)
    global batch. Single-process: a plain device_put with the same sharding,
    so code paths stay identical from 1 host to N.
    """
    sharding = data_sharded(mesh, rank)
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(local_rows), sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_rows))
