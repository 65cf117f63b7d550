"""Normalized sqdiff template matching for audio alignment.

The reference's hot loop calls OpenCV's TM_SQDIFF_NORMED matcher on 1-D audio
(reference backend/sushi/wav.py:187). TPU-native formulation: with template T
(length M) and image window I_x,

  sqdiff(x)      = sum(T^2) + sum(I_x^2) - 2 * corr(x)
  sqdiff_norm(x) = sqdiff(x) / sqrt(sum(T^2) * sum(I_x^2))

corr computes as an FFT cross-correlation (one fused device program), the
sliding window energies via cumsum — O(N log N) instead of OpenCV's O(N*M),
and batched over search groups. Shapes are bucketed to powers of two for the
jit cache. Numpy fallback keeps CPU-only environments exact.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("fft_len",))
def _sqdiff_normed_fft(image: jnp.ndarray, template: jnp.ndarray,
                       img_len: jnp.ndarray, tpl_len: jnp.ndarray,
                       fft_len: int) -> jnp.ndarray:
    """Core: image [N] (zero-padded to fft_len), template [N] (zero-padded),
    actual lengths passed dynamically. Returns [N] scores; entries beyond
    (img_len - tpl_len + 1) are +inf."""
    fi = jnp.fft.rfft(image, fft_len)
    ft = jnp.fft.rfft(template, fft_len)
    corr = jnp.fft.irfft(fi * jnp.conj(ft), fft_len)  # corr[x] = sum I[x+j] T[j]
    csum2 = jnp.concatenate([jnp.zeros(1), jnp.cumsum(image * image)])
    idx = jnp.arange(image.shape[0])
    end = jnp.minimum(idx + tpl_len, image.shape[0])
    win_energy = csum2[end] - csum2[idx]
    t_energy = jnp.sum(template * template)
    sq = t_energy + win_energy - 2.0 * corr[: image.shape[0]]
    denom = jnp.sqrt(jnp.maximum(t_energy * win_energy, 1e-12))
    score = sq / denom
    n_valid = img_len - tpl_len + 1
    return jnp.where(idx < n_valid, score, jnp.inf)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def match_template_device(image: np.ndarray, template: np.ndarray) -> Tuple[float, int]:
    """Returns (best_score, best_offset) of TM_SQDIFF_NORMED. 1-D inputs."""
    image = np.asarray(image, np.float32).ravel()
    template = np.asarray(template, np.float32).ravel()
    n, m = len(image), len(template)
    if m > n:
        raise ValueError("template longer than image")
    fft_len = _next_pow2(n + m)
    buf_i = np.zeros(fft_len, np.float32)
    buf_i[:n] = image
    buf_t = np.zeros(fft_len, np.float32)
    buf_t[:m] = template
    scores = np.asarray(
        _sqdiff_normed_fft(
            jnp.asarray(buf_i[: fft_len]), jnp.asarray(buf_t[: fft_len]),
            jnp.int32(n), jnp.int32(m), fft_len,
        )
    )
    best = int(np.argmin(scores))
    return float(scores[best]), best


def match_template_numpy(image: np.ndarray, template: np.ndarray) -> Tuple[float, int]:
    """Exact numpy reference (same math, direct FFT via numpy)."""
    image = np.asarray(image, np.float64).ravel()
    template = np.asarray(template, np.float64).ravel()
    n, m = len(image), len(template)
    fft_len = _next_pow2(n + m)
    fi = np.fft.rfft(image, fft_len)
    ft = np.fft.rfft(template, fft_len)
    corr = np.fft.irfft(fi * np.conj(ft), fft_len)[: n - m + 1]
    csum2 = np.concatenate([[0.0], np.cumsum(image * image)])
    win = csum2[m:] - csum2[: n - m + 1]
    t_energy = float(np.sum(template * template))
    sq = t_energy + win - 2.0 * corr
    denom = np.sqrt(np.maximum(t_energy * win, 1e-12))
    scores = sq / denom
    best = int(np.argmin(scores))
    return float(scores[best]), best
