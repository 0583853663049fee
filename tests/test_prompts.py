"""Device-side prompt generation (reference PromptImageDataset,
datasets.py:473-610)."""

import numpy as np

import jax
import jax.numpy as jnp

from image_segmentation_tpu.data import prompts, records

KEY = jax.random.PRNGKey(0)


def palette_batch():
    """Half-cat, quarter-dog, quarter-bg masks."""
    raw = np.zeros((4, 16, 16), np.uint8)
    raw[:, :8, :] = records.CAT_PALETTE
    raw[:, 8:12, :] = records.DOG_PALETTE
    return jnp.asarray(raw)


def test_shapes_and_ranges():
    heat, label = prompts.make_prompt_batch(KEY, palette_batch(), 10.0)
    assert heat.shape == (4, 16, 16, 1)
    assert label.shape == (4, 16, 16)
    h = np.asarray(heat)
    assert h.min() >= 0 and h.max() <= 1.0 + 1e-6
    assert set(np.unique(np.asarray(label))).issubset({0.0, 1.0})


def test_heatmap_peak_inside_chosen_class():
    heat, label = prompts.make_prompt_batch(KEY, palette_batch(), 3.0)
    h = np.asarray(heat)[..., 0]
    lab = np.asarray(label)
    for i in range(4):
        cy, cx = np.unravel_index(np.argmax(h[i]), h[i].shape)
        assert h[i, cy, cx] >= 1.0 - 1e-5  # gaussian peak == 1 at the point
        assert lab[i, cy, cx] == 1.0       # point lies in the labelled class


def test_binary_point_mode():
    heat, _ = prompts.make_prompt_batch(KEY, palette_batch(), None)
    h = np.asarray(heat)[..., 0]
    assert (h.sum(axis=(1, 2)) == 1.0).all()
    assert set(np.unique(h)).issubset({0.0, 1.0})


def test_class_choice_weighted_by_pixel_count():
    raw = np.zeros((256, 16, 16), np.uint8)
    raw[:, :, :] = records.CAT_PALETTE  # all-cat: must always pick cat
    heat, label = prompts.make_prompt_batch(KEY, jnp.asarray(raw), 5.0)
    np.testing.assert_array_equal(np.asarray(label), np.ones((256, 16, 16)))


def test_label_is_chosen_class_mask():
    raw = palette_batch()
    _, label = prompts.make_prompt_batch(KEY, raw, 5.0)
    cat, dog, bg = prompts.palette_to_class_masks(raw)
    lab = np.asarray(label)
    for i in range(4):
        matches = [
            np.array_equal(lab[i], np.asarray(m)[i]) for m in (cat, dog, bg)
        ]
        assert any(matches)


def test_uncertain_counts_as_background():
    raw = np.full((1, 8, 8), records.UNCERTAIN_PALETTE, np.uint8)
    cat, dog, bg = prompts.palette_to_class_masks(jnp.asarray(raw))
    assert float(jnp.sum(bg)) == 64.0
