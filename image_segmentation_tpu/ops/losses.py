"""Losses and metrics, fp32, functionally pure.

Re-derivation of reference ``models/losses.py`` semantics on JAX.  All
functions take raw logits and integer/binary targets and return scalars.

Parity notes (bit-for-intent with the reference artifacts):

- ``HybridLoss`` in the reference constructs Dice+CE+confusion members but its
  ``forward`` returns plain CrossEntropy only (losses.py:15).  Our default
  multiclass training loss is therefore :func:`cross_entropy`; a real
  Dice+CE combination is available as :func:`dice_ce_loss` (the BASELINE.json
  target loss family).
- The reference's Dice metrics pass *already activated* probabilities into
  ``segmentation_models_pytorch`` DiceLoss, which internally applies
  log-softmax/log-sigmoid again (smp ``DiceLoss.forward``).  The published
  numbers therefore use softmax(softmax(logits)) / sigmoid(sigmoid(logits)).
  We reproduce this exactly by default (``smp_parity=True``) and expose the
  mathematically-clean variant behind the flag.
- smp DiceLoss aggregates intersection/cardinality over (batch, spatial) per
  class with smooth=0, eps=1e-7, zeroes classes absent from the target, and
  means over ALL classes (absent classes contribute a loss of 0, i.e. a dice
  "score" contribution of 1 through the 1-loss transform).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMP_EPS = 1e-7


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy over all pixels.

    Matches ``nn.CrossEntropyLoss()`` on (B, C, H, W)/(B, H, W) — here
    logits are NHWC (B, H, W, C), targets (B, H, W) int.
    Reference: losses.py:10,15.

    Implemented as a one-hot contraction, NOT take_along_axis: the per-pixel
    gather lowers to the TPU scalar core and alone cost 60 ms/step at
    16x512^2 (profiled); the one-hot multiply-sum is pure VPU work.
    """
    logits = logits.astype(jnp.float32)
    logz = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=jnp.float32)
    return -jnp.mean(jnp.sum(onehot * logz, axis=-1))


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean binary cross-entropy on logits (torch ``BCEWithLogitsLoss``).

    Reference: losses.py:21,33.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # Numerically stable: max(x,0) - x*t + log(1+exp(-|x|))
    return jnp.mean(
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def _smp_dice_per_class(probs: jax.Array, onehot: jax.Array) -> jax.Array:
    """smp soft_dice_score with dims=(batch, spatial): per-class dice."""
    inter = jnp.sum(probs * onehot, axis=(0, 1))
    card = jnp.sum(probs, axis=(0, 1)) + jnp.sum(onehot, axis=(0, 1))
    return (2.0 * inter) / jnp.clip(card, _SMP_EPS, None)


def smp_multiclass_dice_loss(
    probs: jax.Array, targets: jax.Array, num_classes: int
) -> jax.Array:
    """smp ``DiceLoss(mode='multiclass')`` applied to probability input.

    ``probs`` is whatever the caller passes as ``y_pred``; smp re-applies
    log_softmax().exp() internally — for any input x that equals softmax(x) —
    which we replicate here.
    probs: (B, H, W, C) ; targets: (B, H, W) int.
    """
    probs = jax.nn.softmax(probs.astype(jnp.float32), axis=-1)
    p = probs.reshape(probs.shape[0], -1, num_classes)
    onehot = jax.nn.one_hot(targets.reshape(targets.shape[0], -1), num_classes)
    dice = _smp_dice_per_class(p, onehot)
    loss = 1.0 - dice
    present = jnp.sum(onehot, axis=(0, 1)) > 0
    loss = jnp.where(present, loss, 0.0)
    return jnp.mean(loss)


def dice_score(
    logits: jax.Array, targets: jax.Array, *, smp_parity: bool = True
) -> jax.Array:
    """Multiclass Dice *score* = 1 - smp DiceLoss(softmax(logits), targets).

    Reference losses.py:92-100 passes F.softmax(preds) into smp DiceLoss,
    which applies log_softmax().exp() again (double softmax).  With
    ``smp_parity=False`` a single softmax is used.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    if smp_parity:
        # smp's internal log_softmax(probs).exp() == softmax(probs).
        probs = jax.nn.softmax(probs, axis=-1)
    p = probs.reshape(probs.shape[0], -1, num_classes)
    onehot = jax.nn.one_hot(targets.reshape(targets.shape[0], -1), num_classes)
    dice = _smp_dice_per_class(p, onehot)
    loss = 1.0 - dice
    present = jnp.sum(onehot, axis=(0, 1)) > 0
    loss = jnp.where(present, loss, 0.0)
    return 1.0 - jnp.mean(loss)


def dice_score_binary(
    logits: jax.Array, targets: jax.Array, *, smp_parity: bool = True
) -> jax.Array:
    """Binary Dice score (reference losses.py:102-126).

    Reference passes sigmoid(logits) into smp binary DiceLoss which applies
    logsigmoid().exp() again -> sigmoid(sigmoid(logits)) under parity.
    logits: (B, H, W, 1) or (B, H, W); targets: (B, H, W) in {0,1}.
    """
    logits = jnp.squeeze(logits, -1) if logits.ndim == 4 else logits
    logits = logits.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)
    if smp_parity:
        probs = jax.nn.sigmoid(probs)
    t = targets.astype(jnp.float32)
    p = probs.reshape(probs.shape[0], -1)[..., None]
    o = t.reshape(t.shape[0], -1)[..., None]
    dice = _smp_dice_per_class(p, o)
    loss = 1.0 - dice
    present = jnp.sum(o, axis=(0, 1)) > 0
    loss = jnp.where(present, loss, 0.0)
    return 1.0 - jnp.mean(loss)


def hybrid_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Multiclass training loss == plain CE (reference HybridLoss, losses.py:15)."""
    return cross_entropy(logits, targets)


def dice_ce_loss(
    logits: jax.Array, targets: jax.Array, *, dice_weight: float = 1.0
) -> jax.Array:
    """CE + multiclass soft-dice loss (single softmax) — the loss family the
    reference *intended* (its HybridLoss constructs but never uses the dice
    term, losses.py:6-15)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    p = probs.reshape(probs.shape[0], -1, num_classes)
    onehot = jax.nn.one_hot(targets.reshape(targets.shape[0], -1), num_classes)
    dice = _smp_dice_per_class(p, onehot)
    present = jnp.sum(onehot, axis=(0, 1)) > 0
    dice_loss = jnp.mean(jnp.where(present, 1.0 - dice, 0.0))
    return cross_entropy(logits, targets) + dice_weight * dice_loss


def hybrid_loss_binary(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """BCEWithLogits + smp binary DiceLoss(sigmoid(logits)) (losses.py:17-36).

    The dice term keeps the reference's double-sigmoid behaviour.
    """
    logits2 = jnp.squeeze(logits, -1) if logits.ndim == 4 else logits
    t = targets.astype(jnp.float32)
    bce = bce_with_logits(logits2, t)
    probs = jax.nn.sigmoid(jax.nn.sigmoid(logits2.astype(jnp.float32)))
    p = probs.reshape(probs.shape[0], -1)[..., None]
    o = t.reshape(t.shape[0], -1)[..., None]
    dice = _smp_dice_per_class(p, o)
    loss = 1.0 - dice
    present = jnp.sum(o, axis=(0, 1)) > 0
    dice_loss = jnp.mean(jnp.where(present, loss, 0.0))
    return bce + dice_loss


def iou(logits: jax.Array, targets: jax.Array, *, eps: float = 1e-6) -> jax.Array:
    """Mean per-class IoU over the whole batch (reference losses.py:38-63).

    argmax over classes; intersection/union aggregated over batch+spatial per
    class; mean over all C classes with eps smoothing (absent classes give
    IoU ~ 1 via eps/eps, matching the reference).
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    preds = jnp.argmax(logits, axis=-1)
    pred_oh = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)
    tgt_oh = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    inter = jnp.sum(pred_oh * tgt_oh, axis=(0, 1, 2))
    union = jnp.sum(pred_oh, axis=(0, 1, 2)) + jnp.sum(tgt_oh, axis=(0, 1, 2)) - inter
    return jnp.mean((inter + eps) / (union + eps))


def iou_binary(
    logits: jax.Array,
    targets: jax.Array,
    *,
    eps: float = 1e-6,
    threshold: float = 0.5,
) -> jax.Array:
    """Per-sample binary IoU, averaged over the batch (losses.py:65-90)."""
    logits = jnp.squeeze(logits, -1) if logits.ndim == 4 else logits
    preds = (jax.nn.sigmoid(logits.astype(jnp.float32)) > threshold).astype(
        jnp.float32
    )
    t = targets.astype(jnp.float32)
    t = jnp.squeeze(t, -1) if t.ndim == 4 else t
    inter = jnp.sum(preds * t, axis=(1, 2))
    union = jnp.sum(preds, axis=(1, 2)) + jnp.sum(t, axis=(1, 2)) - inter
    return jnp.mean((inter + eps) / (union + eps))


def pixel_accuracy(
    logits: jax.Array, targets: jax.Array, *, num_classes: int = 3
) -> jax.Array:
    """Mean of per-class accuracies over classes present in the target.

    Reference losses.py:129-154 (hard-codes 3 classes).
    """
    logits = logits.astype(jnp.float32)
    preds = jnp.argmax(logits, axis=-1)
    correct = (preds == targets).astype(jnp.float32)
    accs = []
    presents = []
    for c in range(num_classes):
        mask = (targets == c).astype(jnp.float32)
        total = jnp.sum(mask)
        acc = jnp.sum(correct * mask) / jnp.clip(total, 1.0, None)
        accs.append(acc)
        presents.append(total > 0)
    accs = jnp.stack(accs)
    present = jnp.stack(presents).astype(jnp.float32)
    return jnp.sum(accs * present) / jnp.clip(jnp.sum(present), 1.0, None)


def pixel_accuracy_binary(
    logits: jax.Array, targets: jax.Array, *, threshold: float = 0.5
) -> jax.Array:
    """Thresholded overall pixel accuracy (losses.py:156-180)."""
    logits = jnp.squeeze(logits, -1) if logits.ndim == 4 else logits
    preds = (jax.nn.sigmoid(logits.astype(jnp.float32)) > threshold).astype(
        jnp.float32
    )
    t = targets.astype(jnp.float32)
    t = jnp.squeeze(t, -1) if t.ndim == 4 else t
    return jnp.mean((preds == t).astype(jnp.float32))


def combined_confusion_loss(
    logits: jax.Array,
    targets: jax.Array,
    *,
    incorrect_penalty: float = 2.0,
    confusion_pairs: tuple = ((1, 2),),
    confusion_penalty: float = 2.0,
) -> jax.Array:
    """Per-pixel CE with multiplicative penalties (reference losses.py:182-215).

    Incorrect pixels get ``incorrect_penalty``x; confused (cat<->dog) pixels
    get an extra ``confusion_penalty``x on top.
    """
    logits = logits.astype(jnp.float32)
    logz = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=jnp.float32)
    loss = -jnp.sum(onehot * logz, axis=-1)
    preds = jnp.argmax(logits, axis=-1)
    incorrect = preds != targets
    loss = jnp.where(incorrect, loss * incorrect_penalty, loss)
    for c1, c2 in confusion_pairs:
        confused = ((preds == c1) & (targets == c2)) | (
            (preds == c2) & (targets == c1)
        )
        loss = jnp.where(confused, loss * confusion_penalty, loss)
    return jnp.mean(loss)


def dice_from_iou(iou_value: jax.Array) -> jax.Array:
    """Dice recomputed from IoU as 2*IoU/(1+IoU).

    The reference logs this derived value in its validation loops
    (model_wrappers.py:211,388,458,1017; prompt_train.py:119).
    """
    return 2.0 * iou_value / (1.0 + iou_value)
