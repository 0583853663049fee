"""Batched headline A/B runs in ONE process — pay the axon warmup once.

The round-5 lowering probe (tools/exp_lowering.py + faulthandler stack
dumps) overturned the round-4 "217 s host-side lowering" attribution: the
warm bench's real wall is the axon remote session warmup — the FIRST
device->host sync in a fresh process blocks 20-560 s (measured variance)
behind the shared pool's claim/compile queue, while actual host lowering
is ~13 s of CPU.  That warmup is paid once per PROCESS, so the way to
make silicon A/Bs cheap is to run every configuration of a sweep in one
process: config 1 pays the warmup, configs 2..N cost ~25-40 s each
(trace + lower + cache-hit compile + 2x20 chained steps).

Each variant is a JSON object {"label": ..., "env": {VAR: value, ...}};
env vars are applied before the config/model build, so both the
IMGSEG_BENCH_* config hooks and the call-time IMGSEG_PALLAS_* kernel
knobs take effect per variant (IMGSEG_PALLAS_FATDOT is import-time and
cannot be swept here).  Repeats interleave variants (A,B,A,B...) so
service drift hits both arms equally.

Usage:
  python tools/bench_many.py --repeat 2 \
      '{"label":"base","env":{}}' \
      '{"label":"tg","env":{"IMGSEG_PALLAS_WGRAD_TG":"1"}}'
  python tools/bench_many.py --variants-file sweep.json --repeat 3
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run_variant(label, steps=20):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from image_segmentation_tpu.engine.train import Trainer

    t0 = time.perf_counter()
    cfg = bench.make_cfg()
    trainer = Trainer(cfg, make_artifacts=False)
    batch, size = cfg.batch_size, cfg.data.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    )
    masks = jnp.asarray(rng.integers(0, 3, (batch, size, size)).astype(np.uint8))
    key = jax.random.PRNGKey(0)
    step = trainer._train_step

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0,))
    def run_n(state, images, masks, key, n):
        def body(i, st):
            st2, _loss = step(st, images, masks, jax.random.fold_in(key, i))
            return st2
        return jax.lax.fori_loop(0, n, body, state)

    state = run_n(trainer.state, images, masks, key, steps)  # build + warm
    jax.device_get(state["step"])
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    state = run_n(state, images, masks, key, steps)
    jax.device_get(state["step"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "label": label,
        "img_per_sec": round(steps * batch / dt, 2),
        "build_s": round(t_build, 1),
        "timed_s": round(dt, 2),
    }), flush=True)
    return steps * batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", help="JSON variant objects")
    ap.add_argument("--variants-file", help="JSON file with a list of variants")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    variants = [json.loads(v) for v in args.variants]
    if args.variants_file:
        variants += json.load(open(args.variants_file))
    if not variants:
        variants = [{"label": "base", "env": {}}]

    base_env = dict(os.environ)
    results = {}
    for r in range(args.repeat):
        for v in variants:
            os.environ.clear()
            os.environ.update(base_env)
            os.environ.update(v.get("env", {}))
            val = run_variant(f"{v['label']}#{r}", steps=args.steps)
            results.setdefault(v["label"], []).append(val)
    os.environ.clear()
    os.environ.update(base_env)
    for label, vals in results.items():
        print(json.dumps({
            "label": label,
            "runs": [round(x, 2) for x in vals],
            "mean": round(sum(vals) / len(vals), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
