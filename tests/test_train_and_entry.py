import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from vse_tpu.core.charset import get_charset
from vse_tpu.train.losses import balanced_bce, db_loss, dice_loss, masked_l1
from vse_tpu.train.synth import SynthConfig, TextRenderer


def test_db_loss_zero_when_perfect():
    gt = np.zeros((1, 32, 32), np.float32)
    gt[0, 8:24, 8:24] = 1.0
    mask = np.ones_like(gt)
    tm = np.full_like(gt, 0.3)
    tmask = np.zeros_like(gt)
    total, metrics = db_loss(
        jnp.asarray(gt * 0.999 + 0.0005), jnp.asarray(tm), jnp.asarray(gt),
        jnp.asarray(gt), jnp.asarray(mask), jnp.asarray(tm), jnp.asarray(tmask),
    )
    assert float(metrics["shrink_bce"]) < 0.01
    assert float(metrics["binary_dice"]) < 0.01
    assert float(metrics["thresh_l1"]) == 0.0  # empty mask


def test_balanced_bce_penalizes_wrong():
    gt = np.zeros((1, 16, 16), np.float32)
    gt[0, 4:12, 4:12] = 1.0
    mask = np.ones_like(gt)
    good = float(balanced_bce(jnp.asarray(np.clip(gt, 0.01, 0.99)), jnp.asarray(gt), jnp.asarray(mask)))
    bad = float(balanced_bce(jnp.asarray(np.clip(1 - gt, 0.01, 0.99)), jnp.asarray(gt), jnp.asarray(mask)))
    assert bad > good * 10


def test_synth_rec_batch_shapes():
    cs = get_charset("en")
    r = TextRenderer(cs, SynthConfig(), seed=0)
    b = r.rec_batch(3)
    assert b["rec_images"].shape == (3, 48, 320, 3)
    assert b["labels"].shape[0] == 3
    assert (b["label_lengths"] > 0).all()
    # labels decode back to the rendered text (unknown chars dropped)
    for i, t in enumerate(b["texts"]):
        ids = [int(x) for x in b["labels"][i][: b["label_lengths"][i]]]
        assert cs.decode_ids(ids) == "".join(c for c in t if c in cs.chars)[: len(ids)]


def test_synth_det_labels_geometry():
    cs = get_charset("en")
    r = TextRenderer(cs, SynthConfig(det_h=64, det_w=128), seed=1)
    labels = r.det_labels([(20, 20, 100, 44)])
    shrink = labels["gt_shrink"]
    # shrunk region strictly inside the box
    ys, xs = np.nonzero(shrink)
    assert ys.min() > 20 and ys.max() < 44
    assert xs.min() > 20 and xs.max() < 100
    # threshold peaks (≈0.7) on the box border
    assert labels["gt_thresh"][20, 60] > 0.65
    # and decays to 0.3 away from it
    assert labels["gt_thresh"][0, 0] == pytest.approx(0.3)


def test_train_step_reduces_loss():
    from vse_tpu.train.steps import init_state, make_models, make_train_step

    cs = get_charset("digits")
    det, rec = make_models(cs.vocab_size)
    cfg = SynthConfig(det_h=32, det_w=64, rec_h=48, rec_w=64, max_label_len=6,
                      min_font=10, max_font=14)
    state, tx = init_state(
        det, rec,
        det_shape=(1, cfg.det_h, cfg.det_w, 3),
        rec_shape=(1, cfg.rec_h, cfg.rec_w, 3),
        lr=1e-3,
    )
    step = make_train_step(det, rec, tx)
    renderer = TextRenderer(cs, cfg, seed=0)
    batch = {k: jnp.asarray(v) for k, v in renderer.combined_batch(4).items()}
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]  # same batch: loss must drop
    assert int(state.step) == 5


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    boxes = out[0]
    assert boxes.shape[0] == 2
