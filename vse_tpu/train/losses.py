"""Training losses for the DB detector and CRNN recognizer.

The reference ships inference-only Paddle graphs (no training code); we train
from scratch / fine-tune on synthetic data (SURVEY.md hard part #1: most
upstream weights are LFS-stripped). Losses follow the published recipes:

- DB: binary cross-entropy on the shrink (probability) map with hard negative
  mining (3:1), L1 on the threshold map inside dilated text borders, and dice
  loss on the differentiable binarization map.
- CRNN: CTC loss (optax), blank id 0.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def balanced_bce(
    pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray, neg_ratio: float = 3.0
) -> jnp.ndarray:
    """BCE over prob map with hard-negative mining at `neg_ratio` negatives
    per positive. pred/gt/mask: [B, H, W]."""
    eps = 1e-6
    pred = jnp.clip(pred, eps, 1 - eps)
    bce = -(gt * jnp.log(pred) + (1 - gt) * jnp.log(1 - pred))
    pos = (gt > 0.5) & (mask > 0.5)
    neg = (gt <= 0.5) & (mask > 0.5)
    n_pos = jnp.sum(pos)
    n_neg_keep = jnp.minimum(jnp.sum(neg), (n_pos * neg_ratio).astype(jnp.int32) + 16)
    pos_loss = jnp.sum(jnp.where(pos, bce, 0.0))
    # take the hardest negatives: top-k by loss over the flattened batch
    neg_losses = jnp.where(neg, bce, -1.0).reshape(-1)
    k = neg_losses.shape[0]
    sorted_neg = jnp.sort(neg_losses)[::-1]
    idx = jnp.arange(k)
    neg_loss = jnp.sum(jnp.where(idx < n_neg_keep, sorted_neg, 0.0))
    denom = jnp.maximum(n_pos + n_neg_keep, 1).astype(pred.dtype)
    return (pos_loss + neg_loss) / denom


def dice_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    pred = pred * mask
    gt = gt * mask
    inter = jnp.sum(pred * gt)
    union = jnp.sum(pred * pred) + jnp.sum(gt * gt) + 1e-6
    return 1.0 - 2.0 * inter / union


def masked_l1(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.abs(pred - gt) * mask) / n


def db_loss(
    prob: jnp.ndarray,
    thresh: jnp.ndarray,
    binary: jnp.ndarray,
    gt_shrink: jnp.ndarray,
    gt_shrink_mask: jnp.ndarray,
    gt_thresh: jnp.ndarray,
    gt_thresh_mask: jnp.ndarray,
    alpha: float = 5.0,
    beta: float = 10.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full DB objective: L = Ls + alpha*Lb + beta*Lt."""
    ls = balanced_bce(prob, gt_shrink, gt_shrink_mask)
    lb = dice_loss(binary, gt_shrink, gt_shrink_mask)
    lt = masked_l1(thresh, gt_thresh, gt_thresh_mask)
    total = ls + alpha * lb + beta * lt
    return total, {"shrink_bce": ls, "binary_dice": lb, "thresh_l1": lt}


def ctc_rec_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, label_lengths: jnp.ndarray
) -> jnp.ndarray:
    """CTC loss over [B, T, C] logits and [B, L] padded labels (0 = pad)."""
    B, T, _ = logits.shape
    L = labels.shape[1]
    logit_paddings = jnp.zeros((B, T), jnp.float32)
    label_paddings = (
        jnp.arange(L)[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings, blank_id=0)
    return jnp.mean(per_seq)
