"""bench == preset, by construction and pinned here.

Round-4 VERDICT weak #4: ``w2d_level2_fold2`` was a bench-only default
absent from the ``autoencoder`` preset, so the benched step was no longer
the preset-configured production step.  The fix is structural — bench.py
and bench_extra.py now DERIVE their model_args from ``preset(...)`` (env
knobs applied only as explicit overrides) — and this test pins it so the
drift cannot recur silently.
"""

import os
from unittest import mock

from image_segmentation_tpu.config import preset

_BENCH_ENV = [
    "IMGSEG_BENCH_BATCH", "IMGSEG_BENCH_W2D_IMPL", "IMGSEG_BENCH_W2D_L1",
    "IMGSEG_BENCH_W2D_L1F2", "IMGSEG_BENCH_FUSED_DEEP",
    "IMGSEG_BENCH_CLIP_W2D_L1F2", "IMGSEG_BENCH_PROMPT_W2D",
    "IMGSEG_BENCH_AE_W2D", "IMGSEG_BENCH_AE_W2D_L1F2",
    "IMGSEG_BENCH_AE_W2D_L2F2",
]


def _no_bench_env():
    env = {k: v for k, v in os.environ.items() if k not in _BENCH_ENV}
    return mock.patch.dict(os.environ, env, clear=True)


def test_headline_bench_model_args_equal_preset():
    import bench

    with _no_bench_env():
        cfg = bench.make_cfg()
    assert cfg.model == "large_unet"
    assert cfg.model_args == preset("large_unet").model_args


def test_bench_extra_model_args_equal_presets():
    import bench_extra

    with _no_bench_env():
        for name in ("large_unet", "clip_unet", "prompt", "autoencoder"):
            assert bench_extra._preset_model_args(name) == preset(name).model_args


def test_env_hooks_still_override():
    import bench_extra

    with _no_bench_env(), mock.patch.dict(
        os.environ, {"IMGSEG_BENCH_AE_W2D_L2F2": "0"}
    ):
        args = bench_extra._preset_model_args(
            "autoencoder", w2d_level2_fold2="IMGSEG_BENCH_AE_W2D_L2F2"
        )
    assert args["w2d_level2_fold2"] is False
    base = dict(preset("autoencoder").model_args)
    base["w2d_level2_fold2"] = False
    assert args == base


def test_autoencoder_preset_has_level2_fold():
    # The promoted round-4 fast path (VERDICT #4 / ADVICE #2).
    assert preset("autoencoder").model_args["w2d_level2_fold2"] is True
