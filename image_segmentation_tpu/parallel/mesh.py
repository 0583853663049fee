"""Device mesh construction and sharding helpers.

Replaces the reference's torchrun + NCCL + DDP stack
(scripts/train_distributed.py:13-23, models/model_wrappers.py:795-1050) with
the JAX SPMD model:

- ``jax.distributed.initialize()`` for multi-host (the torchrun rendezvous);
- a ``Mesh`` whose axes name the parallelism: ``data`` (batch sharding —
  the only strategy the reference has) plus an optional ``model`` axis for
  tensor-parallel experiments;
- gradient reduction is NOT explicit: with params replicated and the batch
  sharded, XLA inserts the ICI all-reduce during jit compilation (the
  DDP-bucket NCCL allreduce equivalent, for free and fused).

Barriers (model_wrappers.py:1002,1050) have no equivalent: SPMD programs are
globally scheduled; per-epoch artifact writes are process-0-only.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def distributed_init(
    force: bool = False,
    *,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host rendezvous — torchrun/NCCL `init_process_group` equivalent
    of reference train_distributed.py:13-20.

    Explicit ``coordinator_address``/``num_processes``/``process_id`` run the
    rendezvous directly (the torchrun-args form; exercised by the 2-process
    CPU-collective test, tests/test_multiprocess.py).  Otherwise the
    rendezvous runs only when a multi-process launcher environment is
    detected (a coordinator address in the environment, as the JAX launchers
    and TPU pod runtimes set) or when ``force`` is passed.  Single-process
    runs are a no-op; double initialization is tolerated so callers need not
    track launcher state.
    """
    import os

    coordinator = (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if not (force or coordinator):
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized by the launcher
        if "already" not in str(e).lower():
            raise


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data[, model]) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put every array in a pytree with batch-dim sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def shard_params_tp(
    mesh: Mesh, tree, *, min_size: int = 1 << 12
):
    """Tensor-parallel placement: shard large weight matrices/kernels over
    the ``model`` axis along their LAST (output-feature) dimension; leave
    everything else replicated.  Applied uniformly to params and matching
    optimizer moments; XLA/GSPMD inserts the required collectives during
    jit compilation (the scaling-book recipe: annotate shardings, let the
    compiler place all-gathers/reduce-scatters on ICI)."""
    n_model = mesh.shape[MODEL_AXIS]
    rep = replicated(mesh)
    if n_model <= 1:
        return jax.tree.map(lambda a: jax.device_put(a, rep), tree)

    def place(a):
        shape = getattr(a, "shape", ())
        if (
            len(shape) >= 2
            and shape[-1] % n_model == 0
            and int(np.prod(shape)) >= min_size
        ):
            spec = P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
            return jax.device_put(a, NamedSharding(mesh, spec))
        return jax.device_put(a, rep)

    return jax.tree.map(place, tree)
