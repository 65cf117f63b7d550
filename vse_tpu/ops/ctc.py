"""CTC decoding and loss.

The reference's CTC decode lives inside PaddleOCR's CTCLabelDecode (invoked
through `OcrRecogniser.predict`, reference backend/tools/ocr.py:24-86): greedy
argmax, collapse repeats, drop blanks, score = mean prob of kept steps. We
reimplement both:

- `ctc_greedy_decode` — fully batched on device: argmax + repeat-collapse +
  blank-masking computed as vector ops (no host loop), returning fixed-width
  id buffers + validity mask + mean confidence. Host converts to strings.
- `ctc_prefix_beam_decode` — small prefix beam search on host (numpy) for the
  accuracy-sensitive accurate mode; operates on device-computed log-probs.
- `ctc_loss` — via optax, for the training path.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def ctc_greedy_decode(
    logits: jnp.ndarray, blank: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched greedy CTC decode on device.

    Args:
      logits: [B, T, C] raw logits (or log-probs).
    Returns:
      ids:    [B, T] int32 — decoded ids, left-packed, padded with 0.
      mask:   [B, T] bool  — True where ids is a real character.
      scores: [B]    float32 — mean probability over kept (non-blank,
              non-repeat) steps; 1.0 when nothing was kept (empty string),
              matching PaddleOCR's mean-over-kept convention.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    best = jnp.argmax(probs, axis=-1)  # [B, T]
    best_prob = jnp.max(probs, axis=-1)  # [B, T]
    # keep = not blank and not same as previous step
    prev = jnp.pad(best[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    keep = (best != blank) & (best != prev)  # [B, T]
    # left-pack kept ids into fixed-width buffers via argsort on (!keep, t)
    t = jnp.arange(best.shape[1])[None, :]
    order = jnp.argsort(jnp.where(keep, t, best.shape[1] + t), axis=1)
    ids = jnp.take_along_axis(jnp.where(keep, best, 0), order, axis=1)
    mask = jnp.take_along_axis(keep, order, axis=1)
    n_kept = jnp.sum(keep, axis=1)
    score_sum = jnp.sum(jnp.where(keep, best_prob, 0.0), axis=1)
    scores = jnp.where(n_kept > 0, score_sum / jnp.maximum(n_kept, 1), 1.0)
    return ids.astype(jnp.int32), mask, scores.astype(jnp.float32)


def ctc_prefix_beam_decode(
    log_probs: np.ndarray, beam_width: int = 8, blank: int = 0, top_k: int = 16
) -> Tuple[List[int], float]:
    """Prefix beam search over one sequence of log-probs [T, C] (host side).

    Returns (ids, score) where score is exp(mean per-char log prob)."""
    T, C = log_probs.shape
    # beams: prefix tuple -> (log_p_blank, log_p_nonblank)
    NEG = -1e30

    def logsumexp2(a, b):
        m = max(a, b)
        if m <= NEG:
            return NEG
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    beams = {(): (0.0, NEG)}
    for t in range(T):
        lp = log_probs[t]
        cand = np.argsort(lp)[-top_k:]
        new_beams: dict = {}

        def add(prefix, pb, pnb):
            if prefix in new_beams:
                opb, opnb = new_beams[prefix]
                new_beams[prefix] = (logsumexp2(opb, pb), logsumexp2(opnb, pnb))
            else:
                new_beams[prefix] = (pb, pnb)

        for prefix, (pb, pnb) in beams.items():
            ptot = logsumexp2(pb, pnb)
            for c in cand:
                p = float(lp[c])
                if c == blank:
                    add(prefix, ptot + p, NEG)
                elif prefix and c == prefix[-1]:
                    # repeat char: extends non-blank stays same prefix;
                    # via blank makes a new char
                    add(prefix, NEG, pnb + p)
                    add(prefix + (c,), NEG, pb + p)
                else:
                    add(prefix + (c,), NEG, ptot + p)
        # prune
        scored = sorted(
            new_beams.items(),
            key=lambda kv: -logsumexp2(kv[1][0], kv[1][1]),
        )[:beam_width]
        beams = dict(scored)
    best_prefix, (pb, pnb) = max(
        beams.items(), key=lambda kv: logsumexp2(kv[1][0], kv[1][1])
    )
    total = logsumexp2(pb, pnb)
    n = max(1, len(best_prefix))
    return list(best_prefix), float(np.exp(total / n))


def ctc_loss(
    logits: jnp.ndarray,
    logit_paddings: jnp.ndarray,
    labels: jnp.ndarray,
    label_paddings: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Mean CTC loss over the batch (training path)."""
    per_seq = optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=blank
    )
    return jnp.mean(per_seq)


def decode_batch_to_texts(ids, mask, charset) -> List[str]:
    """Host-side: device decode output -> python strings."""
    ids = np.asarray(ids)
    mask = np.asarray(mask)
    out = []
    for row_ids, row_mask in zip(ids, mask):
        out.append(charset.decode_ids([int(i) for i, m in zip(row_ids, row_mask) if m]))
    return out
