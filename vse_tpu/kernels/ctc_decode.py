"""Pallas CTC greedy decoder (TPU).

The expensive part of greedy CTC decode is the C-axis sweep over [B, T, C]
logits — C reaches ~21k classes for the CJK heads, so every extra pass over
the tensor is HBM bandwidth. The Pallas kernel fuses the three C-axis
reductions (max, argmax, logsumexp) into ONE read of the logits; the
remaining collapse/left-pack work touches only [B, T] arrays and runs as
plain XLA ops (Mosaic cannot lower the irregular 1-D ops involved — cumsum,
offset-changing reductions — and at [B, 80] they are free anyway).

The jnp fallback (vse_tpu/ops/ctc.py) remains the CPU path and the
correctness oracle (tests/test_ctc_pallas.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _argmax_lse_kernel(logits_ref, best_ref, prob_ref):
    """[1, T, C] logits -> best id [1, 1, T] + softmax prob of best [1, 1, T].

    One VMEM-resident pass over the C axis per sequence."""
    x = logits_ref[0].astype(jnp.float32)  # [T, C]
    m = jnp.max(x, axis=1)  # [T]
    best = jnp.argmax(x, axis=1).astype(jnp.int32)  # [T]
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m[:, None]), axis=1))
    best_ref[0, 0, :] = best
    prob_ref[0, 0, :] = jnp.exp(m - lse)


@partial(jax.jit, static_argnames=("interpret",))
def ctc_greedy_decode_pallas(
    logits: jnp.ndarray, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[B, T, C] logits -> (ids [B, T] int32 left-packed, mask [B, T] bool,
    scores [B] f32). Matches vse_tpu.ops.ctc.ctc_greedy_decode.

    Outputs are emitted as [B, 1, T] blocks: Mosaic requires the last two
    block dims to be (8,128)-tiled or equal to the array dims."""
    B, T, C = logits.shape
    best, best_prob = pl.pallas_call(
        _argmax_lse_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, T), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, T), jnp.float32),
        ),
        interpret=interpret,
    )(logits)
    best = best[:, 0, :]  # [B, T]
    best_prob = best_prob[:, 0, :]

    # collapse repeats + blanks, left-pack (identical to ops/ctc.py semantics)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, best.dtype), best[:, :-1]], axis=1
    )
    keep = (best != 0) & (best != prev)
    n_kept = jnp.sum(keep, axis=1)
    score_sum = jnp.sum(jnp.where(keep, best_prob, 0.0), axis=1)
    scores = jnp.where(
        n_kept > 0, score_sum / jnp.maximum(n_kept, 1), 1.0
    )
    posn = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # [B, T]
    slots = jnp.arange(T)[None, None, :]
    onehot = (posn[:, :, None] == slots) & keep[:, :, None]  # [B, T, T]
    ids = jnp.sum(jnp.where(onehot, best[:, :, None], 0), axis=1)
    mask = jnp.arange(T)[None, :] < n_kept[:, None]
    return ids.astype(jnp.int32), mask, scores.astype(jnp.float32)
