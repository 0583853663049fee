"""Golden-value tests for losses/metrics against torch (CPU) and against
independent numpy implementations of the smp-DiceLoss semantics the
reference relies on (see ops/losses.py parity notes)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from image_segmentation_tpu.ops import losses as L

RNG = np.random.default_rng(42)


def rand_logits(b=2, h=8, w=8, c=3):
    return RNG.normal(size=(b, h, w, c)).astype(np.float32)


def rand_targets(b=2, h=8, w=8, c=3):
    return RNG.integers(0, c, size=(b, h, w)).astype(np.int32)


def to_torch_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


class TestCrossEntropy:
    def test_matches_torch(self):
        logits, targets = rand_logits(), rand_targets()
        ours = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
        ref = float(
            F.cross_entropy(to_torch_nchw(logits), torch.from_numpy(targets).long())
        )
        assert ours == pytest.approx(ref, rel=1e-5)


class TestBCE:
    def test_matches_torch(self):
        logits = rand_logits(c=1)
        targets = (RNG.random((2, 8, 8)) > 0.5).astype(np.float32)
        ours = float(
            L.bce_with_logits(jnp.asarray(logits[..., 0]), jnp.asarray(targets))
        )
        ref = float(
            F.binary_cross_entropy_with_logits(
                torch.from_numpy(logits[..., 0]), torch.from_numpy(targets)
            )
        )
        assert ours == pytest.approx(ref, rel=1e-5)


def smp_dice_loss_np(y_pred_probs, y_true, num_classes, eps=1e-7):
    """Independent numpy port of smp.losses.DiceLoss(mode='multiclass')
    applied to probability input: internal log_softmax().exp() == softmax,
    dims=(batch, spatial), smooth=0, absent classes zeroed, mean over C."""
    x = y_pred_probs.astype(np.float64)
    x = np.exp(x - x.max(-1, keepdims=True))
    probs = x / x.sum(-1, keepdims=True)  # softmax over channel
    b = probs.shape[0]
    p = probs.reshape(b, -1, num_classes)
    onehot = np.eye(num_classes)[y_true.reshape(b, -1)]
    inter = (p * onehot).sum(axis=(0, 1))
    card = p.sum(axis=(0, 1)) + onehot.sum(axis=(0, 1))
    dice = 2 * inter / np.maximum(card, eps)
    loss = 1 - dice
    loss[onehot.sum(axis=(0, 1)) == 0] = 0
    return loss.mean()


class TestDice:
    def test_smp_parity_double_softmax(self):
        logits, targets = rand_logits(), rand_targets()
        ours = float(L.dice_score(jnp.asarray(logits), jnp.asarray(targets)))
        # reference Dice: 1 - smp_dice(F.softmax(logits), targets)
        probs = torch.softmax(to_torch_nchw(logits), dim=1).numpy()
        probs_nhwc = np.moveaxis(probs, 1, -1)
        ref = 1.0 - smp_dice_loss_np(probs_nhwc, targets, 3)
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_absent_class_contributes_one(self):
        # All-background target: cat/dog absent -> their loss terms zeroed.
        logits = rand_logits()
        targets = np.zeros((2, 8, 8), np.int32)
        v = float(L.dice_score(jnp.asarray(logits), jnp.asarray(targets)))
        assert 0.0 <= v <= 1.0

    def test_binary_double_sigmoid(self):
        logits = rand_logits(c=1)
        targets = (RNG.random((2, 8, 8)) > 0.5).astype(np.int32)
        ours = float(
            L.dice_score_binary(jnp.asarray(logits), jnp.asarray(targets))
        )
        probs = 1 / (1 + np.exp(-(1 / (1 + np.exp(-logits[..., 0])))))
        p = probs.reshape(2, -1, 1)
        o = targets.reshape(2, -1, 1).astype(np.float64)
        inter = (p * o).sum(axis=(0, 1))
        card = p.sum(axis=(0, 1)) + o.sum(axis=(0, 1))
        dice = 2 * inter / np.maximum(card, 1e-7)
        ref = 1 - (1 - dice).mean()
        assert ours == pytest.approx(float(ref), rel=1e-4)


class TestIoU:
    def test_matches_reference_formula(self):
        logits, targets = rand_logits(), rand_targets()
        ours = float(L.iou(jnp.asarray(logits), jnp.asarray(targets)))
        # reference losses.py:38-63 in torch
        preds = torch.argmax(to_torch_nchw(logits), dim=1)
        t = torch.from_numpy(targets).long()
        vals = []
        for c in range(3):
            pc = (preds == c).float()
            tc = (t == c).float()
            inter = (pc * tc).sum()
            union = pc.sum() + tc.sum() - inter
            vals.append((inter + 1e-6) / (union + 1e-6))
        ref = float(torch.stack(vals).mean())
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_binary(self):
        logits = rand_logits(c=1)
        targets = (RNG.random((2, 8, 8)) > 0.5).astype(np.float32)
        ours = float(L.iou_binary(jnp.asarray(logits), jnp.asarray(targets)))
        preds = (torch.sigmoid(torch.from_numpy(logits[..., 0])) > 0.5).float()
        t = torch.from_numpy(targets)
        inter = (preds * t).sum(dim=[1, 2])
        union = preds.sum(dim=[1, 2]) + t.sum(dim=[1, 2]) - inter
        ref = float(((inter + 1e-6) / (union + 1e-6)).mean())
        assert ours == pytest.approx(ref, rel=1e-5)


class TestPixelAccuracy:
    def test_matches_reference_formula(self):
        logits, targets = rand_logits(), rand_targets()
        ours = float(L.pixel_accuracy(jnp.asarray(logits), jnp.asarray(targets)))
        preds = torch.argmax(to_torch_nchw(logits), dim=1)
        t = torch.from_numpy(targets).long()
        accs = []
        for c in range(3):
            m = t == c
            if m.sum() > 0:
                accs.append(((preds == t) & m).float().sum() / m.float().sum())
        ref = float(torch.stack(accs).mean())
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_absent_class_excluded(self):
        logits = rand_logits()
        targets = np.zeros((2, 8, 8), np.int32)  # only background present
        preds_bg_frac = float(
            (np.argmax(logits, -1) == 0).mean()
        )
        ours = float(L.pixel_accuracy(jnp.asarray(logits), jnp.asarray(targets)))
        assert ours == pytest.approx(preds_bg_frac, rel=1e-5)


class TestConfusionLoss:
    def test_matches_reference_formula(self):
        logits, targets = rand_logits(), rand_targets()
        ours = float(
            L.combined_confusion_loss(jnp.asarray(logits), jnp.asarray(targets))
        )
        lt = to_torch_nchw(logits)
        tt = torch.from_numpy(targets).long()
        loss = F.cross_entropy(lt, tt, reduction="none")
        pred_classes = torch.softmax(lt, dim=1).argmax(dim=1)
        incorrect = pred_classes != tt
        loss[incorrect] *= 2.0
        conf = ((pred_classes == 1) & (tt == 2)) | ((pred_classes == 2) & (tt == 1))
        loss[conf] *= 2.0
        assert ours == pytest.approx(float(loss.mean()), rel=1e-5)


class TestHybrid:
    def test_hybrid_is_plain_ce(self):
        logits, targets = rand_logits(), rand_targets()
        assert float(L.hybrid_loss(jnp.asarray(logits), jnp.asarray(targets))) == (
            pytest.approx(
                float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
            )
        )

    def test_hybrid_binary_components(self):
        logits = rand_logits(c=1)
        targets = (RNG.random((2, 8, 8)) > 0.5).astype(np.int32)
        total = float(
            L.hybrid_loss_binary(jnp.asarray(logits), jnp.asarray(targets))
        )
        bce = float(
            L.bce_with_logits(
                jnp.asarray(logits[..., 0]), jnp.asarray(targets.astype(np.float32))
            )
        )
        dice_term = 1.0 - float(
            L.dice_score_binary(jnp.asarray(logits), jnp.asarray(targets))
        )
        assert total == pytest.approx(bce + dice_term, rel=1e-4)

    def test_dice_ce_greater_than_ce(self):
        logits, targets = rand_logits(), rand_targets()
        assert float(L.dice_ce_loss(jnp.asarray(logits), jnp.asarray(targets))) > (
            float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
        )


def test_dice_from_iou():
    assert float(L.dice_from_iou(jnp.asarray(0.5))) == pytest.approx(2 * 0.5 / 1.5)
