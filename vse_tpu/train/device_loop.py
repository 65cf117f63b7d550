"""Device-resident rec training: dataset in HBM, augmentation on the MXU,
multi-step `lax.scan` chunks per host call.

Why: this box has ONE host core. The host-side augmentation pipeline
(pretrain._augment: per-image cv2 resample chains) feeds the TPU at
~0.3-2.3 s/step depending on contention; the device step itself is ~20 ms.
The TPU-native fix is to make the host disappear from the hot loop:

- the pre-rendered dataset (uint8 crops + encoded labels) is uploaded to
  HBM once (~1.8 GB for 38k crops — v5e has 16 GB);
- every augmentation is re-expressed as dense linear algebra with STATIC
  shapes so it jits: the random down/up resample chain and the
  crop-expansion geometry become dynamically-built [H,H]/[W,W] resampling
  matrices applied as matmuls on the MXU (a traced-scale `cv2.resize`
  equivalent — XLA cannot compile traced output shapes, but the combined
  down-then-up operator is a fixed-shape matrix whose VALUES carry the
  traced scale);
- a `lax.scan` runs `chunk` optimizer steps per dispatch, so host<->device
  round-trips (and their 10-100 ms tunnel latencies) amortize to nothing.

Measured on the korean head (batch 64): 0.29 s/step host-fed ->
~0.02 s/step device-resident (chunk 200).

Augmentation parity with pretrain._augment is covered by
tests/test_device_loop.py (matrix resample vs direct bilinear sampling,
curriculum window, end-to-end loss-decreases smoke).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _bilinear_weights(n_dst_static: int, n_src_static: int,
                      m_dst, m_src) -> jnp.ndarray:
    """[n_dst_static, n_src_static] bilinear resize operator whose ACTIVE
    block is [m_dst, m_src] (traced values <= the static dims); rows/cols
    beyond the active block are zero. Sampling follows cv2.INTER_LINEAR:
    dst pixel d reads src coordinate (d + 0.5) * m_src / m_dst - 0.5."""
    d = jnp.arange(n_dst_static, dtype=jnp.float32)[:, None]
    j = jnp.arange(n_src_static, dtype=jnp.float32)[None, :]
    m_dst = jnp.asarray(m_dst, jnp.float32)
    m_src = jnp.asarray(m_src, jnp.float32)
    s = (d + 0.5) * (m_src / m_dst) - 0.5
    j0 = jnp.floor(s)
    frac = s - j0
    j0c = jnp.clip(j0, 0.0, m_src - 1.0)
    j1c = jnp.clip(j0 + 1.0, 0.0, m_src - 1.0)
    w = (j == j0c) * (1.0 - frac) + (j == j1c) * frac
    # zero inactive rows (dst >= m_dst); inactive cols are already zero
    # because j0c/j1c < m_src <= n_src_static
    w = w * (d < m_dst)
    return w


def resample_chain_matrix(n: int, m) -> jnp.ndarray:
    """[n, n] operator equal to: bilinear-resize n->m, then m->n (the
    blur/alias of a traced-scale cv2 down-up chain, as one static-shape
    matrix). `m` may be traced."""
    up = _bilinear_weights(n, n, n, m)      # m -> n (active cols: m)
    down = _bilinear_weights(n, n, m, n)    # n -> m (active rows: m)
    return up @ down


def crop_expand_matrix(n: int, nh, y_off) -> jnp.ndarray:
    """[n, n] operator equal to: resize n->nh vertically, place at y_off,
    replicate the first/last row into the margins (the crop-expansion
    geometry of pretrain._augment). `nh`, `y_off` may be traced."""
    down = _bilinear_weights(n, n, nh, n)  # n -> nh (active rows: nh)
    i = jnp.arange(n, dtype=jnp.int32)[:, None]
    d = jnp.arange(n, dtype=jnp.int32)[None, :]
    src_row = jnp.clip(i - jnp.asarray(y_off, jnp.int32), 0,
                       jnp.asarray(nh, jnp.int32) - 1)
    place = (d == src_row).astype(jnp.float32)
    return place @ down


def interval_resize_matrix(h: int, a, b) -> jnp.ndarray:
    """[h, h] operator resampling source rows [a, b) onto [0, h) with
    bilinear taps and edge-clamped reads (`a`/`b` may be traced, b > a).
    Upscaling (b - a < h) is safe in y: rows outside the canvas replicate
    the background edge."""
    d = jnp.arange(h, dtype=jnp.float32)[:, None]
    j = jnp.arange(h, dtype=jnp.float32)[None, :]
    src = a + (d + 0.5) * (b - a) / h - 0.5
    j0 = jnp.floor(src)
    frac = src - j0
    j0c = jnp.clip(j0, 0.0, h - 1.0)
    j1c = jnp.clip(j0 + 1.0, 0.0, h - 1.0)
    return (j == j0c) * (1.0 - frac) + (j == j1c) * frac


def ink_rows_batch(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample vertical ink extent [B] (same 12%-of-range row
    gradient-energy rule as ops/image.py ink_rows — the production
    tighten pass this augmentation mirrors)."""
    h = x.shape[1]
    g = jnp.mean(x, axis=-1)  # [B, h, w]
    e = jnp.mean(jnp.abs(g[:, :, 1:] - g[:, :, :-1]), axis=2)  # [B, h]
    lo = jnp.min(e, axis=1, keepdims=True)
    rng = jnp.max(e, axis=1, keepdims=True) - lo
    mask = (e - lo) > 0.12 * rng
    idx = jnp.arange(h)[None, :]
    y0 = jnp.min(jnp.where(mask, idx, h), axis=1)
    y1 = jnp.max(jnp.where(mask, idx, -1), axis=1)
    ok = (y1 - y0 >= 3)
    y0 = jnp.where(ok, y0, 0)
    y1 = jnp.where(ok, y1, h - 1)
    return y0.astype(jnp.float32), y1.astype(jnp.float32)


def make_rec_augment(h: int, w: int) -> Callable:
    """jit-able augmentation with the same distribution as the deployed
    crop path: photometric jitter + noise + horizontal shift + (p=.5)
    resample chain (det-crop upscale blur) + ink-anchored re-crop geometry
    (the production ink-tight two-pass crop, ops/image.py refine_boxes_ink)
    + coupled aspect-fit with black right pad."""

    def augment(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, h, w, 3] float32 in [0, 255]
        B = x.shape[0]
        ks = jax.random.split(rng, 18)
        gain = jax.random.uniform(ks[0], (B, 1, 1, 1), minval=0.7, maxval=1.3)
        bias = jax.random.uniform(ks[1], (B, 1, 1, 1), minval=-30.0, maxval=30.0)
        chan = jax.random.uniform(ks[2], (B, 1, 1, 3), minval=0.9, maxval=1.1)
        x = (x - 127.5) * gain + 127.5 + bias
        x = x * chan
        sigma = jax.random.uniform(ks[3], (), minval=0.0, maxval=8.0)
        x = x + sigma * jax.random.normal(ks[4], x.shape)
        # horizontal shift with left-edge replication of the original col 0
        shift = jax.random.randint(ks[5], (), 0, 9)
        col0 = x[:, :, 0:1]
        x = jnp.where(jnp.arange(w)[None, None, :, None] < shift,
                      col0, jnp.roll(x, shift, axis=2))
        x = jnp.clip(x, 0.0, 255.0)
        # resample chain (p=.5): scale_y in [.75, 1]; aspect usually mild
        # [.85, 1.05], but 25% of draws squash hard [.55, .85] — the crop
        # op x-squashes any line wider than out_w/out_h * box_h to fit the
        # 320-px rec window (ops/image.py::crop_axis_aligned_matmul), so
        # long subtitle lines reach the head horizontally compressed.
        sy = jax.random.uniform(ks[6], (), minval=0.75, maxval=1.0)
        mild = jax.random.uniform(ks[7], (), minval=0.85, maxval=1.05)
        hard = jax.random.uniform(ks[12], (), minval=0.55, maxval=0.85)
        sx = sy * jnp.where(jax.random.uniform(ks[13], ()) < 0.25, hard, mild)
        dh = jnp.maximum(8, jnp.round(h * sy)).astype(jnp.int32)
        dw = jnp.maximum(16, jnp.round(w * sx)).astype(jnp.int32)
        my = resample_chain_matrix(h, dh)
        mx = resample_chain_matrix(w, dw)
        resampled = jnp.einsum("ik,bkwc->biwc", my, x)
        resampled = jnp.einsum("jw,bhwc->bhjc", mx, resampled)
        x = jnp.where(jax.random.uniform(ks[8], ()) < 0.5, resampled, x)
        # ink-anchored re-crop geometry: production crops are tightened to
        # the measured ink band + margin (ops/image.py refine_boxes_ink
        # with rec_crop_tight_margin 0.07 -> ink fills ~78-86% of the 48-px
        # window). Measure each sample's ink rows and resample the interval
        # [ink - pad, ink + pad] onto the full window: 80% of draws target
        # the deployed band (ink fraction ~U[.74,.90], centered +- jitter),
        # 20% a harder tail U[.48,.74] for crops where the tighten pass
        # falls back (low contrast) and the raw expand_y margins survive.
        y0, y1 = ink_rows_batch(x)
        ink = y1 - y0 + 1.0
        in_band = jax.random.uniform(ks[9], (x.shape[0],)) < 0.8
        f_band = jax.random.uniform(ks[14], (x.shape[0],),
                                    minval=0.74, maxval=0.90)
        f_tail = jax.random.uniform(ks[15], (x.shape[0],),
                                    minval=0.48, maxval=0.74)
        f = jnp.where(in_band, f_band, f_tail)
        span = ink / f                       # source rows mapped to h
        cjit = jax.random.uniform(ks[10], (x.shape[0],),
                                  minval=-0.08, maxval=0.08)
        cy = (y0 + y1 + 1.0) / 2.0 + cjit * span
        a = cy - span / 2.0
        b = cy + span / 2.0
        mg = jax.vmap(lambda aa, bb: interval_resize_matrix(h, aa, bb))(a, b)
        x = jnp.einsum("bik,bkwc->biwc", mg, x)
        # aspect-fit + BLACK right pad: the production crop op
        # (ops/image.py crop_axis_aligned_matmul) uniform-scales the
        # refined box into the 320-px window and ZERO-pads beyond
        # target_w, so glyphs reach the head at the SAME scale factor in x
        # as in y against a hard black right edge (a head never trained on
        # the pad read CER 0.26 where full-width CER was 0.0, r4). The fit
        # factor is COUPLED to the applied y-scale h/span and applied to
        # the measured ink-column CONTENT (so an upscale never pushes
        # glyphs past the window), with occasional extra narrowing for the
        # long-line compression case.
        ks2 = jax.random.split(ks[11], 4)
        gc = jnp.mean(x, axis=-1)
        ec = jnp.mean(jnp.abs(gc[:, 1:, :] - gc[:, :-1, :]), axis=1)  # [B,w]
        loc = jnp.min(ec, axis=1, keepdims=True)
        rngc = jnp.max(ec, axis=1, keepdims=True) - loc
        maskc = (ec - loc) > 0.12 * rngc
        idxc = jnp.arange(w)[None, :]
        x1c = jnp.max(jnp.where(maskc, idxc, -1), axis=1).astype(jnp.float32)
        cw = jnp.clip(x1c + 5.0, 24.0, jnp.float32(w))
        aspect = jax.random.uniform(ks2[0], (x.shape[0],),
                                    minval=0.9, maxval=1.1)
        narrow = jnp.where(
            jax.random.uniform(ks2[2], (x.shape[0],)) < 0.25,
            jax.random.uniform(ks2[3], (x.shape[0],), minval=0.6, maxval=1.0),
            1.0,
        )
        s_fit = h / span * aspect * narrow
        dw2 = jnp.clip(cw * s_fit, 24.0, jnp.float32(w))
        # per-sample content fit ([w, w]: active src cols cw -> active dst
        # cols dw2, zero beyond = the black pad), batched like the y
        # interval resample
        m_fit = jax.vmap(
            lambda dd, ss: _bilinear_weights(w, w, dd, ss)
        )(dw2, cw)
        fitted = jnp.einsum("bjw,bhwc->bhjc", m_fit, x)
        do_fit = (jax.random.uniform(ks2[1], (x.shape[0],))
                  < 0.9)[:, None, None, None]
        x = jnp.where(do_fit, fitted, x)
        return x

    return augment


def run_rec_device_loop(
    *,
    raw_imgs: np.ndarray,            # [N, h, w, 3] uint8
    labels: np.ndarray,              # [N, L] int32
    lengths: np.ndarray,             # [N] int32
    params, batch_stats, opt_state,
    step_core: Callable,             # (params, bs, opt, imgs, labels, lens) -> (p, bs, opt, loss)
    steps: int, start_step: int, batch: int, seed: int,
    chunk: int = 200,
    checkpoint_every: int = 1000,
    checkpoint_cb: Callable[[int, object, object, object], None] = None,
    log_cb: Callable[[int, float], None] = None,
) -> Tuple[object, object, object]:
    """Drive `step_core` for `steps - start_step` optimizer steps with the
    dataset resident in HBM and `chunk` steps fused per dispatch. The
    curriculum window (clean->hard prefix sampling, pretrain._cache_batch)
    is computed on device from the global step index."""
    h, w = raw_imgs.shape[1], raw_imgs.shape[2]
    total = raw_imgs.shape[0]
    augment = make_rec_augment(h, w)

    # slice the upload (~500 MB pieces): a multi-GB single put is fine on a
    # local PCIe host but has stalled the remote-tunnel transport
    import time as _time

    t_up = _time.time()
    piece = max(1, (512 << 20) // max(1, raw_imgs[0].nbytes))
    parts = [jax.device_put(raw_imgs[k:k + piece])
             for k in range(0, total, piece)]
    imgs_dev = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    imgs_dev.block_until_ready()
    labels_dev = jax.device_put(labels.astype(np.int32))
    lengths_dev = jax.device_put(lengths.astype(np.int32))
    print(f"[device-loop] dataset resident: {raw_imgs.nbytes / 1e9:.2f} GB "
          f"in {_time.time() - t_up:.1f}s; compiling first chunk...",
          flush=True)

    # the dataset arrays are EXPLICIT jit arguments, not closure captures:
    # captured device arrays are lifted into the lowered program as
    # constants, and the axon remote-compile endpoint then receives a
    # multi-GB HLO (observed: 17 GB host RSS during lowering, then a
    # broken-pipe on /remote_compile). Arguments are always parameters.
    @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("n_steps",))
    def chunk_fn(params, batch_stats, opt_state, rng, step0,
                 imgs, lbls, lens, n_steps):
        def body(carry, k):
            params, bs, opt, rng = carry
            i = step0 + k
            rng, r_idx, r_aug = jax.random.split(rng, 3)
            frac = jnp.minimum(1.0, i / max(1.0, steps * 0.4))
            window = jnp.maximum(batch * 8, (total * frac).astype(jnp.int32))
            window = jnp.minimum(window, total)
            idx = jax.random.randint(r_idx, (batch,), 0, window)
            x = imgs[idx].astype(jnp.float32)
            x = augment(r_aug, x)
            x = (x / 255.0 - 0.5) / 0.5
            params, bs, opt, loss = step_core(
                params, bs, opt, x, lbls[idx], lens[idx])
            return (params, bs, opt, rng), loss

        (params, batch_stats, opt_state, rng), losses = lax.scan(
            body, (params, batch_stats, opt_state, rng),
            jnp.arange(n_steps, dtype=jnp.float32))
        return params, batch_stats, opt_state, losses

    rng = jax.random.PRNGKey(seed + 917)
    i = start_step
    while i < steps:
        n = min(chunk, steps - i,
                checkpoint_every - (i % checkpoint_every) or checkpoint_every)
        rng, sub = jax.random.split(rng)
        params, batch_stats, opt_state, losses = chunk_fn(
            params, batch_stats, opt_state, sub, jnp.float32(i),
            imgs_dev, labels_dev, lengths_dev, n_steps=int(n))
        i += n
        if log_cb is not None:
            log_cb(i, float(losses[-1]), params, batch_stats)
        if checkpoint_cb is not None and (i % checkpoint_every == 0 or i >= steps):
            checkpoint_cb(i, params, batch_stats, opt_state)
    return params, batch_stats, opt_state


def run_det_device_loop(
    *,
    ds: dict,                        # images [N,H,W,3] u8; gt_* [N,H,W] f16
    params, batch_stats, opt_state,
    step_core: Callable,             # (params, bs, opt, batch) -> (p, bs, opt, loss, metrics)
    steps: int, start_step: int, batch: int, seed: int,
    chunk: int = 100,
    checkpoint_every: int = 500,
    checkpoint_cb: Callable = None,
    log_cb: Callable = None,
):
    """Device-resident det training (same design as run_rec_device_loop).

    The host-fed det loop shipped ~60 MB of fresh buffers per step; on the
    remote-tunnel platform those host-side transfer buffers are not
    reclaimed, which OOM-killed a 3000-step run at ~130 GB RSS (r3). Here
    the rendered dataset crosses host->device ONCE (uint8 images + f16
    label maps, ~3 GB in HBM) and the photometric augmentation runs on
    device inside a multi-step lax.scan chunk."""
    import time as _time

    t_up = _time.time()
    n_total = ds["images"].shape[0]
    piece = max(1, (512 << 20) // max(1, ds["images"][0].nbytes))
    parts = [jax.device_put(ds["images"][k:k + piece])
             for k in range(0, n_total, piece)]
    imgs_dev = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    imgs_dev.block_until_ready()
    gts_dev = {
        k: jax.device_put(ds[k].astype(np.float16))
        for k in ("gt_shrink", "gt_shrink_mask", "gt_thresh", "gt_thresh_mask")
    }
    print(f"[det device-loop] dataset resident "
          f"({sum(v.nbytes for v in ds.values()) / 1e9:.2f} GB) "
          f"in {_time.time() - t_up:.1f}s; compiling first chunk...",
          flush=True)

    mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.array([0.229, 0.224, 0.225], jnp.float32)

    # dataset arrays as explicit jit ARGUMENTS (see run_rec_device_loop:
    # closure-captured device arrays lower as constants and blow up the
    # remote-compile request)
    @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("n_steps",))
    def chunk_fn(params, batch_stats, opt_state, rng, imgs, gts, n_steps):
        def body(carry, _):
            params, bs, opt, rng = carry
            rng, r_idx, r_g, r_b, r_n = jax.random.split(rng, 5)
            idx = jax.random.randint(r_idx, (batch,), 0, n_total)
            x = imgs[idx].astype(jnp.float32)
            gain = jax.random.uniform(r_g, (batch, 1, 1, 1),
                                      minval=0.75, maxval=1.25)
            bias = jax.random.uniform(r_b, (batch, 1, 1, 1),
                                      minval=-25.0, maxval=25.0)
            x = (x - 127.5) * gain + 127.5 + bias
            x = x + 5.0 * jax.random.normal(r_n, x.shape)
            x = jnp.clip(x, 0.0, 255.0)
            hb = {"det_images": (x / 255.0 - mean) / std}
            for k in gts:
                hb[k] = gts[k][idx].astype(jnp.float32)
            params, bs, opt, loss, metrics = step_core(params, bs, opt, hb)
            return (params, bs, opt, rng), (loss, metrics)

        (params, batch_stats, opt_state, rng), (losses, metrics) = lax.scan(
            body, (params, batch_stats, opt_state, rng), None, length=n_steps)
        return params, batch_stats, opt_state, losses, metrics

    rng = jax.random.PRNGKey(seed + 417)
    i = start_step
    while i < steps:
        n = min(chunk, steps - i,
                checkpoint_every - (i % checkpoint_every) or checkpoint_every)
        rng, sub = jax.random.split(rng)
        params, batch_stats, opt_state, losses, metrics = chunk_fn(
            params, batch_stats, opt_state, sub, imgs_dev, gts_dev,
            n_steps=int(n))
        i += n
        if log_cb is not None:
            log_cb(i, float(losses[-1]),
                   {k: float(v[-1]) for k, v in metrics.items()},
                   params, batch_stats)
        if checkpoint_cb is not None and (i % checkpoint_every == 0 or i >= steps):
            checkpoint_cb(i, params, batch_stats, opt_state)
    return params, batch_stats, opt_state
