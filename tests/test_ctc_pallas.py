"""Pallas CTC greedy decoder vs the jnp oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vse_tpu.kernels.ctc_decode import ctc_greedy_decode_pallas
from vse_tpu.ops.ctc import ctc_greedy_decode


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_jnp_oracle(seed):
    rng = np.random.default_rng(seed)
    B, T, C = 4, 16, 40
    logits = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    ids_p, mask_p, scores_p = ctc_greedy_decode_pallas(logits, interpret=True)
    ids_j, mask_j, scores_j = ctc_greedy_decode(logits)
    for b in range(B):
        got = [int(i) for i, m in zip(np.array(ids_p[b]), np.array(mask_p[b])) if m]
        want = [int(i) for i, m in zip(np.array(ids_j[b]), np.array(mask_j[b])) if m]
        assert got == want
    np.testing.assert_allclose(
        np.array(scores_p), np.array(scores_j), rtol=1e-5, atol=1e-6
    )


def test_pallas_empty_sequence():
    logits = np.full((1, 8, 5), -10.0, np.float32)
    logits[..., 0] = 10.0  # all blanks
    ids, mask, scores = ctc_greedy_decode_pallas(jnp.asarray(logits), interpret=True)
    assert not np.array(mask).any()
    assert float(scores[0]) == pytest.approx(1.0)
