"""Mask-remap and record deserialization semantics (reference datasets.py:92-135)."""

import numpy as np

from image_segmentation_tpu.data import records


def test_deserialize_roundtrip():
    img = np.random.default_rng(0).integers(0, 256, records.IMAGE_SHAPE, dtype=np.uint8)
    out = records.deserialize_image(img.tobytes())
    np.testing.assert_array_equal(out, img)
    assert out.flags.writeable


def test_remap_cat_image_absorbs_uncertain_as_cat():
    raw = np.zeros((4, 4), np.uint8)
    raw[0, 0] = records.CAT_PALETTE
    raw[1, 1] = records.UNCERTAIN_PALETTE
    out = records.remap_mask(raw)
    assert out[0, 0] == records.CAT_ID
    assert out[1, 1] == records.CAT_ID  # uncertain -> cat because cat present
    assert out[2, 2] == records.BACKGROUND_ID


def test_remap_dog_image_absorbs_uncertain_as_dog():
    raw = np.zeros((4, 4), np.uint8)
    raw[0, 0] = records.DOG_PALETTE
    raw[1, 1] = records.UNCERTAIN_PALETTE
    out = records.remap_mask(raw)
    assert out[0, 0] == records.DOG_ID
    assert out[1, 1] == records.DOG_ID


def test_remap_no_animal_uncertain_goes_dog():
    # Reference quirk (datasets.py:123-128): with no cat pixels the dog branch
    # runs, so uncertain-only masks become dog.
    raw = np.zeros((4, 4), np.uint8)
    raw[1, 1] = records.UNCERTAIN_PALETTE
    out = records.remap_mask(raw)
    assert out[1, 1] == records.DOG_ID


def test_remap_batch_matches_single():
    rng = np.random.default_rng(1)
    palette = np.array([0, 38, 75, 255], np.uint8)
    raws = palette[rng.integers(0, 4, (8, 16, 16))]
    batch = records.remap_mask_batch(raws)
    for i in range(8):
        np.testing.assert_array_equal(batch[i], records.remap_mask(raws[i]))


def test_binary_any_animal_mask():
    raw = np.zeros((4, 4), np.uint8)
    raw[0, 0] = records.CAT_PALETTE
    raw[1, 1] = records.UNCERTAIN_PALETTE
    seg, label = records.binary_any_animal_mask(raw)
    assert label == 0  # cat image
    assert seg[0, 0] == 1 and seg[1, 1] == 1 and seg[2, 2] == 0


def test_class_presence_masks_bg_includes_uncertain():
    raw = np.zeros((2, 2), np.uint8)
    raw[0, 0] = records.CAT_PALETTE
    raw[0, 1] = records.UNCERTAIN_PALETTE
    cat, dog, bg = records.class_presence_masks(raw)
    assert cat[0, 0] == 1.0 and bg[0, 1] == 1.0 and dog.sum() == 0
