"""Child process for the multi-process CPU-collective test (test_multiprocess.py).

Each process provisions ``argv[5]`` virtual CPU devices (8 global across
``argv[2]`` processes), rendezvouses via ``distributed_init``, and over a
(data=4, model=2) global mesh runs:

1. an EVALUATOR leg on the deterministic init state — the clean split plus
   one integer-battery cell, with a batch size chosen so the last batch is
   a REMAINDER (drop_last=False) and the replicated-placement branch of
   ``data/pipeline.py`` executes with non-addressable devices;
2. ONE global train step of a tiny UNet — the TPU-native realization of the
   reference's torchrun + DDP + DistributedSampler path
   (scripts/train_distributed.py:13-66, models/model_wrappers.py:795-1050).

Prints one JSON line with the observations the parent asserts on.
"""

import json
import os
import sys

PROCESS_ID = int(sys.argv[1])
NUM_PROCESSES = int(sys.argv[2])
PORT = sys.argv[3]
# "python" (BatchPipeline) or "native" (C++ NativeBatchPipeline — the
# multi-host form of the runtime/loader.cpp path).
LOADER = sys.argv[4] if len(sys.argv) > 4 else "python"
LOCAL_DEVICES = int(sys.argv[5]) if len(sys.argv) > 5 else 4

# Must precede any jax import; override the parent pytest's 8-device flag.
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from image_segmentation_tpu.parallel import mesh as mesh_lib  # noqa: E402

mesh_lib.distributed_init(
    coordinator_address=f"127.0.0.1:{PORT}",
    num_processes=NUM_PROCESSES,
    process_id=PROCESS_ID,
)
assert jax.process_count() == NUM_PROCESSES
assert jax.process_index() == PROCESS_ID
assert len(jax.devices()) == NUM_PROCESSES * LOCAL_DEVICES
assert len(jax.local_devices()) == LOCAL_DEVICES

import numpy as np  # noqa: E402

from image_segmentation_tpu.config import DataConfig, TrainConfig  # noqa: E402
from image_segmentation_tpu.engine.train import Trainer  # noqa: E402

N_DEV = NUM_PROCESSES * LOCAL_DEVICES
N_MODEL = 2
N_DATA = N_DEV // N_MODEL
mesh = mesh_lib.make_mesh(n_data=N_DATA, n_model=N_MODEL)

GLOBAL_BATCH = 2 * N_DATA
cfg = TrainConfig(
    model="unet",
    model_args={"stem_features": 8, "encoder_features": (16, 32)},
    batch_size=GLOBAL_BATCH,
    num_epochs=1,
    n_model_shards=N_MODEL,
    native_loader=(LOADER == "native"),
    data=DataConfig(
        dataset="synthetic",
        synthetic_length=GLOBAL_BATCH,
        image_size=32,
        augmentations_per_datapoint=1,
    ),
)
if LOADER == "native":
    from image_segmentation_tpu.data import native_loader

    assert native_loader.native_loader_available(), "C++ loader must build"
trainer = Trainer(cfg, mesh=mesh, make_artifacts=False)

# ---- Evaluator leg (on the deterministic INIT state, before the train
# step donates it): clean metrics + one integer-battery cell.  Batch 8
# over length=10 — divisible by every process count in the grid (1, 2,
# 4, 8; the host pipeline requires batch % processes == 0) and leaves a
# REMAINDER last batch (8, 2) that cannot shard over the data axis, so
# the replicated-remainder branch of data/pipeline.py executes with
# non-addressable devices.  The batch MUST be layout-invariant: the
# metrics are per-BATCH means averaged over batches (reference
# semantics), so a different batching changes the values; at a FIXED
# batching the cross-device reductions are exact f32 count sums and the
# values are BIT-FOR-BIT identical across process layouts (asserted by
# the parent against a 1-process run).
from image_segmentation_tpu.data.datasets import synthetic_dataset  # noqa: E402
from image_segmentation_tpu.engine.evaluate import Evaluator  # noqa: E402

eval_ds = synthetic_dataset(
    length=10, height=32, width=32, num_classes=3, seed=123
)
evaluator = Evaluator(
    trainer.model, trainer.state, eval_ds, batch_size=8, mesh=mesh, seed=7
)
clean_metrics = evaluator.test()
# One cell of the integer battery (the published-artifact path).
cell_iou, cell_pa, cell_dice = evaluator._run_sweep_point(
    "int", "gaussian_noise", 8
)

train_pipe, _ = trainer._pipelines()
if LOADER == "native":
    # No silent fallback: the C++ loader must actually be driving.
    assert type(train_pipe).__name__ == "NativeBatchPipeline", type(train_pipe)
images, masks = next(iter(train_pipe.epoch(0)))

# The batch is ONE GLOBAL array: global shape, sharded over all devices,
# with only this process's chunk addressable.
assert images.shape == (GLOBAL_BATCH, 32, 32, 3), images.shape
assert masks.shape == (GLOBAL_BATCH, 32, 32), masks.shape
assert len(images.sharding.device_set) == N_DEV
addressable = list(images.addressable_shards)
# data axis 8 x model axis 2 replicas = 16 shards, 4 on this process.
assert len(addressable) == LOCAL_DEVICES
shard_rows = sorted(s.index[0].start or 0 for s in addressable)
per_row = GLOBAL_BATCH // N_DATA

key = jax.random.PRNGKey(0)
trainer.state, loss = trainer._train_step(trainer.state, images, masks, key)
loss_value = float(loss)
assert np.isfinite(loss_value)

# TP placement really sharded over `model` on the global mesh.
specs = {
    str(leaf.sharding.spec) for leaf in jax.tree.leaves(trainer.state["params"])
}
assert any("model" in s for s in specs), specs

print(
    json.dumps(
        {
            "process_id": PROCESS_ID,
            "loader": LOADER,
            "loss": loss_value,
            "global_shape": list(images.shape),
            "n_devices": N_DEV,
            "addressable_shards": len(addressable),
            "shard_rows": shard_rows,
            "per_row": per_row,
            "clean_metrics": clean_metrics,
            "battery_cell": [cell_iou, cell_pa, cell_dice],
        }
    ),
    flush=True,
)
