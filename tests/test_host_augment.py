"""Host-side robust augmentation (reference CustomImageDatasetRobust)."""

import numpy as np

from image_segmentation_tpu.data import host_augment as ha
from image_segmentation_tpu.data import records
from image_segmentation_tpu.data.datasets import synthetic_dataset


def test_rotate_identity():
    img = np.random.default_rng(0).random((8, 8, 3))
    np.testing.assert_allclose(ha._rotate_nearest(img.copy(), 0.0), img)


def test_flip_shared_between_image_and_mask():
    # A single marked pixel can vanish under nearest rotation, so restrict
    # the geometry to the flip (max_degrees=0) and check image/mask move
    # together: the brightest image pixel must still carry the mask id.
    img = np.zeros((16, 16, 3), np.uint8)
    mask = np.zeros((16, 16), np.uint8)
    img[4, 7] = 255
    mask[4, 7] = 2
    for seed in range(6):  # covers both flip outcomes
        out_img, out_mask = ha.robust_transform_item(
            np.random.default_rng(seed), img, mask,
            max_degrees=0.0, blur_kernel=1,
        )
        iy, ix = np.unravel_index(np.argmax(out_img.sum(-1)), out_img.shape[:2])
        assert out_mask[iy, ix] == 2
        assert (iy, ix) in [(4, 7), (4, 8)]


def test_blur_preserves_constant():
    img = np.full((8, 8, 3), 0.25)
    np.testing.assert_allclose(ha._gaussian_blur(img, 5), 0.25, atol=1e-12)


def test_epoch_iterator_clean_slots():
    ds = synthetic_dataset(length=3, height=8, width=8, seed=0)
    items = list(ha.robust_augment_epoch(ds, augmentations_per_datapoint=2, seed=1))
    assert len(items) == 9
    for base in range(3):
        img, mask = items[base * 3]
        np.testing.assert_array_equal(img, ds.images[base])
        np.testing.assert_array_equal(mask, ds.masks[base])
        aug_img, _ = items[base * 3 + 1]
        assert not np.array_equal(aug_img, ds.images[base])


def test_binary_any_animal_batch():
    raw = np.zeros((2, 4, 4), np.uint8)
    raw[0, 0, 0] = records.CAT_PALETTE
    raw[0, 1, 1] = records.UNCERTAIN_PALETTE
    raw[1, 2, 2] = records.DOG_PALETTE
    segs, labels = records.binary_any_animal_batch(raw)
    assert labels.tolist() == [0, 1]
    assert segs[0, 0, 0] == 1 and segs[0, 1, 1] == 1 and segs[0, 3, 3] == 0
    assert segs[1, 2, 2] == 1
