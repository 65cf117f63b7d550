"""CRNN text recognizer (CNN backbone -> BiLSTM neck -> CTC head) in flax.

TPU-native re-implementation of the reference's recognition stage — PaddleOCR
CRNN (reference backend/tools/ocr.py:97 selects `rec_algorithm="CRNN"`), with
the reference's input geometry: 3x48x320 for V3/V4 models, 3x32x320 for V2
(reference backend/tools/paddle_model_config.py:93-97). Output is per-step
logits over (vocab + 1 blank) consumed by the CTC decoder
(vse_tpu/ops/ctc.py).

The BiLSTM scans run as `jax.lax.scan` over the W/4-length sequence axis —
static length, so XLA unrolls the recurrence into an efficient while loop on
device; the LSTM matmuls are batched onto the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vse_tpu.models.mobilenet_v3 import MobileNetV3Rec


class BiLSTM(nn.Module):
    """Bidirectional LSTM layer over [B, T, C].

    `unroll=16`: the recurrence lowers to a while loop whose per-step body is
    a small matmul; at T=80 the loop overhead dominates (the 4 scans of the
    2-layer neck measured ~29 ms of the fused OCR program on 1024 crops).
    Unrolling packs 16 steps per loop iteration — same math, same params."""

    hidden: int
    dtype: Any = jnp.bfloat16
    unroll: int = 16

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype,
                                 param_dtype=jnp.float32),
            unroll=self.unroll,
            name="fwd",
        )
        bwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype,
                                 param_dtype=jnp.float32),
            reverse=True,
            keep_order=True,
            unroll=self.unroll,
            name="bwd",
        )
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)


class CRNNRecognizer(nn.Module):
    """CRNN: MobileNetV3 feature extractor -> 2x BiLSTM -> CTC projection.

    variant="mobile": MobileNetV3-small x0.5, hidden 48 (the reference's
    *_rec_fast class). variant="server": MobileNetV3-large x1.0, hidden 256.

    `hidden` / `cnn_scale` override the variant defaults. Large-vocab
    ideograph families need them: a 96-dim BiLSTM feature separating 1.7k+
    CJK classes underfits hard (r5: japan/chinese_cht plateaued at CER
    ~0.14-0.16 / probe-exact 0 after 40k steps at the mobile defaults while
    1k-class ch passed at 0.0219 — the errors were substitutions between
    visually unrelated ideographs, i.e. feature collapse, not render
    ambiguity). A trained checkpoint records its overrides in vse_meta.json
    so the engine rebuilds the exact architecture (ocr_engine.py).
    """

    vocab_size: int  # number of real characters (blank is added internally)
    variant: str = "mobile"
    hidden: int = 0  # 0 = variant default (mobile 48 / server 256)
    cnn_scale: float = 0.0  # 0 = variant default (mobile 0.5 / server 1.0)
    dtype: Any = jnp.bfloat16

    @property
    def num_classes(self) -> int:
        return self.vocab_size + 1  # + CTC blank (index 0)

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """images: [B, H, W, 3] normalized crops -> logits [B, W//4, vocab+1]."""
        x = images.astype(self.dtype)
        if self.variant == "mobile":
            scale = self.cnn_scale or 0.5
            x = MobileNetV3Rec(arch="small", scale=scale, dtype=self.dtype)(x, train)
            hidden = self.hidden or 48
        elif self.variant == "server":
            scale = self.cnn_scale or 1.0
            x = MobileNetV3Rec(arch="large", scale=scale, dtype=self.dtype)(x, train)
            hidden = self.hidden or 256
        else:
            raise ValueError(f"unknown rec variant {self.variant}")
        x = BiLSTM(hidden, dtype=self.dtype, name="lstm1")(x)
        x = BiLSTM(hidden, dtype=self.dtype, name="lstm2")(x)
        logits = nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
            name="ctc_fc",
        )(x)
        return logits.astype(jnp.float32)
