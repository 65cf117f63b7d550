"""Device-resident training loop (vse_tpu/train/device_loop.py): the
traced-scale resampling matrices must match direct bilinear sampling, and
the chunked scan must actually optimize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vse_tpu.train.device_loop import (
    _bilinear_weights,
    crop_expand_matrix,
    make_rec_augment,
    resample_chain_matrix,
    run_rec_device_loop,
)


def _bilinear_resize_1d(x: np.ndarray, m_dst: int) -> np.ndarray:
    """Reference: cv2.INTER_LINEAR sampling along axis 0."""
    n_src = x.shape[0]
    out = np.zeros((m_dst,) + x.shape[1:], np.float64)
    for d in range(m_dst):
        s = (d + 0.5) * n_src / m_dst - 0.5
        j0 = int(np.floor(s))
        frac = s - j0
        j0c = min(max(j0, 0), n_src - 1)
        j1c = min(max(j0 + 1, 0), n_src - 1)
        out[d] = (1 - frac) * x[j0c] + frac * x[j1c]
    return out


@pytest.mark.parametrize("n,m", [(48, 30), (48, 48), (320, 240), (17, 9)])
def test_bilinear_weights_match_direct(rng, n, m):
    x = rng.uniform(0, 255, size=(n, 5)).astype(np.float32)
    w = np.asarray(_bilinear_weights(n, n, m, n))  # n -> m, padded to n rows
    got = w @ x
    want = _bilinear_resize_1d(x, m)
    np.testing.assert_allclose(got[:m], want, rtol=1e-4, atol=1e-3)
    assert np.all(got[m:] == 0)  # inactive rows zero


@pytest.mark.parametrize("n,m", [(48, 31), (48, 8), (320, 170)])
def test_resample_chain_matches_two_pass(rng, n, m):
    x = rng.uniform(0, 255, size=(n, 3)).astype(np.float32)
    got = np.asarray(resample_chain_matrix(n, m)) @ x
    want = _bilinear_resize_1d(_bilinear_resize_1d(x, m), n)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_crop_expand_places_and_replicates(rng):
    n, nh, y_off = 48, 20, 7
    x = rng.uniform(0, 255, size=(n, 2)).astype(np.float32)
    got = np.asarray(crop_expand_matrix(n, nh, y_off)) @ x
    small = _bilinear_resize_1d(x, nh)
    np.testing.assert_allclose(got[y_off:y_off + nh], small, rtol=1e-4, atol=1e-2)
    # margins replicate the small image's first/last rows
    np.testing.assert_allclose(got[:y_off], np.tile(small[0], (y_off, 1)),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(got[y_off + nh:],
                               np.tile(small[-1], (n - y_off - nh, 1)),
                               rtol=1e-4, atol=1e-2)


def test_augment_jits_and_preserves_shape(rng):
    aug = jax.jit(make_rec_augment(48, 320))
    x = jnp.asarray(rng.uniform(0, 255, size=(4, 48, 320, 3)).astype(np.float32))
    y = aug(jax.random.PRNGKey(0), x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    # different keys give different augmentations
    y2 = aug(jax.random.PRNGKey(1), x)
    assert float(jnp.abs(y - y2).mean()) > 0.5


def test_device_loop_optimizes_linear_model(rng):
    """Tiny least-squares 'recognizer': loss must drop and checkpoints/logs
    must fire at the configured cadence."""
    import optax

    N, h, w = 64, 8, 16
    # Bright images keep the normalized batch mean (the probe's gradient
    # signal, 2(w*m - t)*m) well away from 0 under the augmentation's
    # photometric jitter; zero-mean noise makes m ~ N(0, .05) and the
    # 40-step SGD probe stalls by construction.
    raw = rng.integers(150, 255, size=(N, h, w, 3)).astype(np.uint8)
    labels = rng.integers(0, 5, size=(N, 4)).astype(np.int32)
    lengths = np.full((N,), 4, np.int32)

    target = np.float32(0.3)
    tx = optax.sgd(0.05)
    params = {"w": jnp.zeros(())}
    opt_state = tx.init(params)

    def step_core(params, bs, opt, imgs, lab, lens):
        def loss_fn(p):
            return jnp.mean((p["w"] * imgs.mean() - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), bs, opt, loss

    events = {"logs": [], "ckpts": []}
    p, bs, opt = run_rec_device_loop(
        raw_imgs=raw, labels=labels, lengths=lengths,
        params=params, batch_stats={}, opt_state=opt_state,
        step_core=step_core, steps=40, start_step=0, batch=8, seed=0,
        chunk=10, checkpoint_every=20,
        checkpoint_cb=lambda s, *a: events["ckpts"].append(s),
        log_cb=lambda s, loss, *a: events["logs"].append((s, loss)),
    )
    assert events["ckpts"] == [20, 40]
    assert [s for s, _ in events["logs"]] == [10, 20, 30, 40]
    losses = [l for _, l in events["logs"]]
    assert losses[-1] < losses[0] * 0.5
    assert np.isfinite(float(p["w"]))


def test_det_device_loop_optimizes(rng):
    """Det variant: dict-batch step_core with metrics; loss must drop and
    the checkpoint/log cadence must hold (the host-fed det loop OOMed the
    remote platform at ~60 MB of transfer buffers per step, r3)."""
    import optax

    from vse_tpu.train.device_loop import run_det_device_loop

    N, H, W = 32, 16, 24
    ds = {
        "images": rng.integers(0, 255, size=(N, H, W, 3)).astype(np.uint8),
        "gt_shrink": rng.random((N, H, W)).astype(np.float16),
        "gt_shrink_mask": np.ones((N, H, W), np.float16),
        "gt_thresh": rng.random((N, H, W)).astype(np.float16),
        "gt_thresh_mask": np.ones((N, H, W), np.float16),
    }
    tx = optax.sgd(0.1)
    params = {"w": jnp.zeros(())}
    opt_state = tx.init(params)

    def step_core(params, bs, opt, batch):
        def loss_fn(p):
            pred = p["w"] * batch["det_images"].mean()
            return (pred - batch["gt_shrink"].mean()) ** 2

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        metrics = {"shrink_bce": loss, "binary_dice": loss, "thresh_l1": loss}
        return optax.apply_updates(params, updates), bs, opt, loss, metrics

    events = {"logs": [], "ckpts": []}
    p, bs, opt = run_det_device_loop(
        ds=ds, params=params, batch_stats={}, opt_state=opt_state,
        step_core=step_core, steps=30, start_step=0, batch=4, seed=0,
        chunk=10, checkpoint_every=20,
        checkpoint_cb=lambda s, *a: events["ckpts"].append(s),
        log_cb=lambda s, loss, m, *a: events["logs"].append((s, loss, m)),
    )
    assert events["ckpts"] == [20, 30]
    assert [s for s, _, _ in events["logs"]] == [10, 20, 30]
    assert events["logs"][-1][1] < events["logs"][0][1]
    assert set(events["logs"][0][2]) == {"shrink_bce", "binary_dice",
                                         "thresh_l1"}
