"""Dataset loading: npz cache path (the offline-testable part of
load_pet_dataset) and the converter CLI plumbing."""

import os

import numpy as np
import pytest

from image_segmentation_tpu.data import records
from image_segmentation_tpu.data.datasets import ArrayDataset, load_pet_dataset


def _write_cache(loc, split, n=4):
    os.makedirs(loc, exist_ok=True)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (n, 256, 256, 3), dtype=np.uint8)
    palette = np.array([0, 38, 75, 255], np.uint8)
    raw = palette[rng.integers(0, 4, (n, 256, 256))]
    masks = records.remap_mask_batch(raw)
    np.savez(
        os.path.join(loc, f"{split}_arrays.npz"),
        images=images, masks=masks, raw_masks=raw,
    )
    return images, masks, raw


class TestPetCachePath:
    def test_loads_from_cache(self, tmp_path):
        loc = str(tmp_path / "Data")
        images, masks, raw = _write_cache(loc, "validation")
        ds = load_pet_dataset("validation", dataset_loc=loc, cache=True)
        np.testing.assert_array_equal(ds.images, images)
        np.testing.assert_array_equal(ds.masks, masks)
        assert ds.raw_masks is None  # not requested

    def test_keep_raw_masks(self, tmp_path):
        loc = str(tmp_path / "Data")
        _, _, raw = _write_cache(loc, "test")
        ds = load_pet_dataset("test", dataset_loc=loc, cache=True,
                              keep_raw_masks=True)
        np.testing.assert_array_equal(ds.raw_masks, raw)

    def test_invalid_split_raises(self):
        with pytest.raises(ValueError):
            load_pet_dataset("training")


class TestLiveIngestion:
    """The HF ``load_dataset`` branch (reference datasets.py:40-53,133-135),
    covered WITHOUT network: a locally saved parquet dataset with the same
    byte-record schema as mattidebeer/Oxford-IIIT-Pet-Augmented."""

    def _write_parquet_dataset(self, loc, split, n=3):
        import datasets as hfds

        rng = np.random.default_rng(7)
        images = rng.integers(0, 256, (n, 256, 256, 3), dtype=np.uint8)
        palette = np.array([0, 38, 75, 255], np.uint8)
        raw = palette[rng.integers(0, 4, (n, 256, 256))]
        ds = hfds.Dataset.from_dict(
            {
                "image": [im.tobytes() for im in images],
                "mask": [m.tobytes() for m in raw],
            }
        )
        os.makedirs(os.path.join(loc, "data"), exist_ok=True)
        ds.to_parquet(
            os.path.join(loc, "data", f"{split}-00000-of-00001.parquet")
        )
        return images, raw

    def test_load_dataset_branch_deserializes_and_remaps(self, tmp_path):
        loc = str(tmp_path / "hfds")
        images, raw = self._write_parquet_dataset(loc, "validation")
        ds = load_pet_dataset(
            "validation", dataset_loc=loc, cache=False, keep_raw_masks=True
        )
        np.testing.assert_array_equal(ds.images, images)
        np.testing.assert_array_equal(ds.raw_masks, raw)
        np.testing.assert_array_equal(ds.masks, records.remap_mask_batch(raw))

    def test_load_dataset_branch_writes_npz_cache(self, tmp_path):
        loc = str(tmp_path / "hfds")
        images, _ = self._write_parquet_dataset(loc, "test")
        ds = load_pet_dataset("test", dataset_loc=loc, cache=True)
        cache_file = os.path.join(loc, "test_arrays.npz")
        assert os.path.exists(cache_file)
        # Second load takes the cache branch and round-trips.
        ds2 = load_pet_dataset("test", dataset_loc=loc, cache=True)
        np.testing.assert_array_equal(ds2.images, ds.images)
        np.testing.assert_array_equal(ds2.masks, ds.masks)


class TestConverterCLI:
    def test_resnet34_state_dict_file_roundtrip(self, tmp_path):
        import sys

        import torch

        from tests.test_resnet import TorchResNet34Features

        torch.manual_seed(0)
        m = TorchResNet34Features()
        sd_path = str(tmp_path / "resnet34.pth")
        torch.save(m.state_dict(), sd_path)
        out = str(tmp_path / "resnet34.npz")

        import runpy

        argv = sys.argv
        sys.argv = ["convert_pretrained", "resnet34",
                    "--torch-state-dict", sd_path, "--out", out]
        try:
            runpy.run_module("scripts.convert_pretrained", run_name="__main__")
        finally:
            sys.argv = argv
        assert os.path.exists(out)

        from image_segmentation_tpu.utils import checkpoint as ckpt_lib

        flat = ckpt_lib.load_checkpoint_flat(out)
        assert any(k.startswith("params/conv1") for k in flat)
        assert any(k.startswith("batch_stats/") for k in flat)
