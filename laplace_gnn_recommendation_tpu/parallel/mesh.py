"""Device mesh construction and sharding helpers.

The reference is single-process, single-device (SURVEY §2c: no
torch.distributed/NCCL/MPI anywhere). This module is the from-scratch TPU
replacement: a 2-D ``jax.sharding.Mesh`` with axes

* ``data``  — data parallelism over user batches (DP),
* ``model`` — row-sharding of the user/item embedding tables, sharded SpMM
  frontiers, and sharded top-k MIPS item partitions (model parallelism).

All collectives (all-to-all embedding row exchange, psum for DP gradients,
all-gather for cross-shard top-k merge) are inserted by XLA from the sharding
annotations, riding ICI within a slice; no hand-written transport exists.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def distributed_init(strict: bool = False) -> bool:
    """Initialize multi-host JAX when launched under a multi-process runtime.

    Returns True when the distributed runtime is (already) initialized.
    Launch detection: any of the coordinator env vars the TPU/pod runtimes
    set (``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS``, or
    ``MEGASCALE_COORDINATOR_ADDRESS``). Single-process runs are a no-op
    returning False. Failures raise when ``strict`` (a pod launch that
    cannot initialize must not silently train on one host's devices);
    non-strict logs and falls back to single-process — the CLI default, so
    local development never needs the flag unset.

    On TPU pods / managed clusters ``jax.distributed.initialize()``
    auto-detects the topology. Manual launches (including the 2-process
    localhost gate in ``tests/test_multihost.py``) pass it explicitly via
    ``JAX_NUM_PROCESSES`` + ``JAX_PROCESS_ID`` alongside the coordinator
    address.
    """
    # NOTE: must not call jax.process_count()/jax.devices() here — they
    # initialize the XLA backend, after which jax.distributed.initialize()
    # refuses to run (observed in the 2-process localhost gate)
    if jax.distributed.is_initialized():
        return True  # already initialized by a prior call / the launcher
    coord = (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not coord:
        return False
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc) if nproc is not None else None,
            process_id=int(pid) if pid is not None else None,
        )
        return True
    except Exception as exc:
        if strict:
            raise
        print(
            f"[mesh] multi-host init failed ({exc}); continuing "
            "single-process — pass strict=True to make this fatal"
        )
        return False


def build_mesh(
    data_axis: int = -1,
    model_axis: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the 2-D ``(data, model)`` mesh.

    ``-1`` on either axis absorbs the remaining devices. With one device this
    degenerates to a 1×1 mesh, so every sharded function also runs unmodified
    on a single chip.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis == -1 and model_axis == -1:
        data_axis, model_axis = n, 1
    elif data_axis == -1:
        assert n % model_axis == 0, (n, model_axis)
        data_axis = n // model_axis
    elif model_axis == -1:
        assert n % data_axis == 0, (n, data_axis)
        model_axis = n // data_axis
    assert data_axis * model_axis == n, (
        f"mesh {data_axis}x{model_axis} != {n} devices"
    )
    arr = np.array(devices).reshape(data_axis, model_axis)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard rows of a table over the ``model`` axis (embedding tables, item
    score partitions)."""
    spec = [None] * (axis + 1)
    spec[axis] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))


def data_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard the leading batch axis over the ``data`` axis."""
    spec = [None] * (axis + 1)
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


def shard_rows_pad(n_rows: int, mesh: Mesh) -> int:
    """Pad a row count so it divides evenly across the ``model`` axis.

    Padded rows are dead weight (never referenced by any edge or lookup);
    keeping shapes divisible lets XLA shard without ragged remainders.
    """
    parts = mesh.shape[MODEL_AXIS]
    return round_up(max(n_rows, 1), parts)
