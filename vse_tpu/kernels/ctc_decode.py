"""Pallas CTC greedy decoder.

Fuses the decode chain (softmax-max -> argmax -> repeat-collapse -> blank
mask -> left-pack -> confidence) into one kernel so the [B, T, C] logits are
read from HBM exactly once — C is the vocab axis and reaches ~21k classes for
the CJK heads, so the XLA fallback's multiple passes (softmax, max, argmax,
argsort) are all bandwidth on the same giant tensor.

Grid: one program per sequence. The left-pack is a T-step scalar loop
(T = W/4 = 80) writing through SMEM — negligible next to the C-axis
reductions. The jnp fallback (vse_tpu/ops/ctc.py) remains the CPU path and
the correctness oracle (tests/test_ctc_pallas.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ctc_greedy_kernel(logits_ref, ids_ref, nkept_ref, score_ref):
    x = logits_ref[0].astype(jnp.float32)  # [T, C]
    T, C = x.shape
    # stable softmax prob of the argmax class, no full softmax materialized
    m = jnp.max(x, axis=1)  # [T]
    best = jnp.argmax(x, axis=1)  # [T]
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m[:, None]), axis=1))
    best_prob = jnp.exp(m - lse)  # [T]
    prev = jnp.concatenate([jnp.full((1,), -1, best.dtype), best[:-1]])
    keep = (best != 0) & (best != prev)
    n_kept = jnp.sum(keep.astype(jnp.int32))
    score_sum = jnp.sum(jnp.where(keep, best_prob, 0.0))
    nkept_ref[0, 0] = n_kept
    score_ref[0, 0] = jnp.where(
        n_kept > 0, score_sum / jnp.maximum(n_kept, 1).astype(jnp.float32), 1.0
    )
    # left-pack kept ids with a scalar loop over T
    ids_ref[0, :] = jnp.zeros((T,), jnp.int32)

    def body(t, pos):
        k = keep[t]

        @pl.when(k)
        def _():
            ids_ref[0, pos] = best[t].astype(jnp.int32)

        return pos + k.astype(jnp.int32)

    jax.lax.fori_loop(0, T, body, jnp.int32(0))


@partial(jax.jit, static_argnames=("interpret",))
def ctc_greedy_decode_pallas(
    logits: jnp.ndarray, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[B, T, C] logits -> (ids [B, T] int32 left-packed, mask [B, T] bool,
    scores [B] f32). Matches vse_tpu.ops.ctc.ctc_greedy_decode."""
    B, T, C = logits.shape
    ids, nkept, score = pl.pallas_call(
        _ctc_greedy_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        interpret=interpret,
    )(logits)
    mask = jnp.arange(T)[None, :] < nkept
    return ids, mask, score[:, 0]
