"""Synthetic pretraining: produce working det/rec checkpoints from scratch.

Most upstream weights are LFS-stripped (SURVEY.md §2.5 / hard part #1), so
the framework bootstraps its own: CRNN recognizers train on rendered text
lines, the DB detector on rendered subtitle frames (vse_tpu/train/synth.py).
Run on TPU:

  python -m vse_tpu.train.pretrain rec --language en --steps 3000
  python -m vse_tpu.train.pretrain det --steps 1500

Checkpoints land in the registry layout (vse_tpu/core/registry.py):
  checkpoints/rec_<family>_<variant>/ and checkpoints/det_<variant>/.
"""

from __future__ import annotations

import argparse
import os
import queue
import threading
import time
from typing import Dict

# persist XLA compiles across training invocations: campaign gate-retries
# and wedge-restart resumes re-jit the same chunk program, and a fresh
# compile costs minutes through the remote-compile tunnel
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vse_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vse_tpu.core.charset import get_charset, script_family
from vse_tpu.core.registry import models_root, save_params
from vse_tpu.models.crnn import CRNNRecognizer
from vse_tpu.models.db_detector import DBDetector
from vse_tpu.ops.ctc import ctc_greedy_decode, decode_batch_to_texts
from vse_tpu.train.losses import ctc_rec_loss, db_loss
from vse_tpu.train.synth import SynthConfig, TextRenderer, rec_render_config


def _prefetch(make_batch, depth=8, workers=6):
    """Parallel host-side batch generation (PIL rendering is the bottleneck;
    one renderer thread starves the TPU)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker(wid):
        while not stop.is_set():
            batch = make_batch(wid)
            while not stop.is_set():
                try:
                    q.put(batch, timeout=1)
                    break
                except queue.Full:
                    continue

    for wid in range(workers):
        threading.Thread(target=worker, args=(wid,), daemon=True).start()
    return q, stop


def _rec_train_charset(language: str, use_space: bool, fold_case: bool):
    charset = get_charset(language)
    if fold_case and charset.name in ("en", "latin", "cyrillic", "el"):
        charset = charset.folded()
    if not use_space:
        charset = charset.without_space()
    if charset.name == "korean":
        # factor syllables into positional-jamo CTC classes (2,350 -> 161;
        # the r3 syllable head plateaued at CER 0.30) — see JamoCharset
        from vse_tpu.core.charset import to_jamo

        charset = to_jamo(charset)
    if charset.name == "arabic":
        # fold DejaVu pixel-identical homoglyphs (digit twins, ه/ە, ى/ی):
        # separate classes are coin-flips by construction
        from vse_tpu.core.arabic import HOMOGLYPHS

        charset = charset.aliased(HOMOGLYPHS)
    return charset


def load_or_render_rec_dataset(language: str, pregen: int, batch: int,
                               seed: int = 0, use_space: bool = False,
                               fold_case: bool = True):
    """Disk-cached rendered rec dataset (host-only — safe to run while the
    TPU is busy; `python -m vse_tpu.train.pretrain render ...`)."""
    charset = _rec_train_charset(language, use_space, fold_case)
    cfg = rec_render_config()
    # bump when the renderer's output changes (text distribution OR draw
    # profile): cached datasets would silently keep the old one.
    # g6 (all families): near-full-height fonts matching the ink-tight crop
    # geometry (ops/image.py refine_boxes_ink) + native wordlists for 9
    # script families (train/wordlists.py) — soup-trained dot-diacritic
    # heads floored at CER ~0.2-0.5 regardless of steps (r4/r5).
    gen = "g6"
    ds_path = (
        f"/tmp/vse_rec_ds_{language}_{pregen}x{batch}"
        f"_w{int(cfg.words_only)}s{cfg.fixed_stroke}{gen}.npz"
    )
    if os.path.exists(ds_path):
        print(f"loading cached dataset {ds_path}")
        z = np.load(ds_path, allow_pickle=True)
        raw_imgs, all_texts = z["images"], z["texts"]
    else:
        print(f"pre-rendering {pregen} batches x {batch}...", flush=True)
        t_gen = time.time()
        raw_list, all_texts = [], []
        r = TextRenderer(charset, cfg, seed=seed)
        for bi in range(pregen * batch):
            r.cfg.difficulty = min(1.0, 2.0 * bi / max(1, pregen * batch))
            img, text = r.render_line()
            raw_list.append(img)
            all_texts.append(text)
        raw_imgs = np.stack(raw_list)
        np.savez_compressed(ds_path, images=raw_imgs,
                            texts=np.array(all_texts, object))
        print(f"dataset ready in {time.time() - t_gen:.0f}s -> {ds_path}")
    return raw_imgs, [str(t) for t in all_texts]


def load_or_render_det_dataset(pregen: int, det_h: int = 256,
                               det_w: int = 448, seed: int = 0):
    """Disk-cached rendered det dataset (host-only, like the rec one):
    frames + DB shrink/threshold label maps."""
    charset = get_charset("en")
    cfg = SynthConfig(det_h=det_h, det_w=det_w)
    ds_path = f"/tmp/vse_det_ds_{pregen}_{det_h}x{det_w}.npz"
    if os.path.exists(ds_path):
        print(f"loading cached det dataset {ds_path}")
        z = np.load(ds_path)
        return {k: z[k] for k in z.files}
    print(f"pre-rendering {pregen} det frames...", flush=True)
    r = TextRenderer(charset, cfg, seed=seed)
    frames, shr, shm, th, thm = [], [], [], [], []
    t_g = time.time()
    for _ in range(pregen):
        img, boxes = r.render_frame()
        lab = r.det_labels(boxes)
        frames.append(img)
        shr.append(lab["gt_shrink"])
        shm.append(lab["gt_shrink_mask"])
        th.append(lab["gt_thresh"])
        thm.append(lab["gt_thresh_mask"])
    ds = {
        "images": np.stack(frames),
        "gt_shrink": np.stack(shr).astype(np.float16),
        "gt_shrink_mask": np.stack(shm).astype(np.float16),
        "gt_thresh": np.stack(th).astype(np.float16),
        "gt_thresh_mask": np.stack(thm).astype(np.float16),
    }
    np.savez_compressed(ds_path, **ds)
    print(f"det dataset ready in {time.time()-t_g:.0f}s -> {ds_path}")
    return ds


def train_rec(language: str, steps: int, batch: int, lr: float, seed: int,
              variant: str = "mobile", log_every: int = 50,
              pregen: int = 0, use_space: bool = False,
              fold_case: bool = True, device_data: bool = True,
              fresh: bool = False, fresh_opt: bool = False,
              hidden: int = 0, cnn_scale: float = 0.0) -> str:
    """`pregen` > 0: render that many batches up front (curriculum-ordered
    clean->hard) and epoch over them — host PIL rendering is GIL-bound and
    otherwise starves the TPU (~4.5 s/step live vs ~50 ms cached).

    `fresh=True`: ignore an existing checkpoint and train from scratch
    (the r5 retrain campaign: stale pre-geometry checkpoints must not seed
    the run). `fresh_opt=True`: warm-start params from the checkpoint but
    re-initialize the optimizer with a full warmup+cosine schedule over the
    REMAINING steps — plain resume restores the adam step count, so an
    extension past the original cosine target trains at the ~0-LR tail and
    learns nothing (measured r5: cyrillic +40k extension steps moved CER
    0.33 -> 0.27 while a from-scratch 40k run under the same data passes).

    `use_space=False` (default): drop the space class — a gap-supervised
    space blocks CTC convergence from scratch (measured: spaced-label overfit
    plateaus at loss 33 where wordwise reaches 9); the word-segmentation
    reformat re-splits at output time. The choice is recorded in the
    checkpoint's vse_meta.json so the engine builds the matching charset."""
    charset = _rec_train_charset(language, use_space, fold_case)
    # subtitle-domain profile: real words with burned-in outlines,
    # near-full-height fonts (see rec_render_config)
    cfg = rec_render_config()
    from vse_tpu.core.charset import JamoCharset

    is_jamo = isinstance(charset, JamoCharset)
    if is_jamo:
        # 2-3 label tokens per rendered syllable: a 320-px line holds up to
        # ~16 syllables -> 48 jamo; CTC time axis is W/4 = 80 steps
        cfg.max_label_len = 56
    else:
        from vse_tpu.core.strokefont import stroke_script_for

        if stroke_script_for(charset.name) is not None:
            # combining marks add label chars without advancing the pen —
            # a width-trimmed line can exceed the default 24 labels, and a
            # silently truncated label poisons CTC supervision
            cfg.max_label_len = 36
    # fp32 activations for training: bf16 stalls CTC convergence (measured:
    # fresh-data loss frozen at ~17.6 in bf16 vs steadily dropping in fp32);
    # inference still runs the trained fp32 params through the bf16 graph
    rec = CRNNRecognizer(
        vocab_size=charset.vocab_size, variant=variant, dtype=jnp.float32,
        hidden=hidden, cnn_scale=cnn_scale,
    )
    variables = jax.jit(rec.init, static_argnames=("train",))(
        jax.random.PRNGKey(seed), jnp.zeros((1, cfg.rec_h, cfg.rec_w, 3)),
        train=True,
    )
    from vse_tpu.core.registry import load_meta, rec_ckpt_path

    path = rec_ckpt_path(language, variant)
    # peek the resume point BEFORE building the optimizer: fresh_opt
    # schedules over the REMAINING steps (see docstring)
    prior_step = 0
    if not fresh and os.path.isdir(path):
        pm = load_meta(path)
        if (pm and pm.get("vocab_size") == charset.vocab_size
                and int(pm.get("hidden", 0)) == hidden
                and float(pm.get("cnn_scale", 0.0)) == cnn_scale):
            prior_step = int(pm.get("step", 0))
    sched_steps = max(1, steps - prior_step) if fresh_opt else steps
    warmup = 200 if (fresh_opt and prior_step) else 100
    # global-norm clipping: unclipped adam on hard CTC batches blows up
    # mid-run (observed at ~step 3700: loss 1.3 -> 35, blank re-collapse)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(
            optax.warmup_cosine_decay_schedule(0, lr, warmup, sched_steps)
        ),
    )
    opt_state = tx.init(variables["params"])
    # difficulty curriculum: clean text first, full augmentation by mid-run
    # (full difficulty from scratch collapses CTC to blanks)
    difficulty = {"value": 0.0}

    def step_core(params, batch_stats, opt_state, images, labels, lengths):
        def loss_fn(p):
            logits, mut = rec.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"],
            )
            return ctc_rec_loss(logits, labels, lengths), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    step_fn = jax.jit(step_core)

    renderers = {}

    def make_batch(wid):
        # one renderer (and RNG) per prefetch worker — np.random.Generator is
        # not thread-safe
        if wid not in renderers:
            renderers[wid] = TextRenderer(charset, cfg, seed=seed * 100 + wid)
        r = renderers[wid]
        r.cfg.difficulty = difficulty["value"]  # SynthConfig is mutable
        b = r.rec_batch(batch)
        imgs = ((b["rec_images"].astype(np.float32) / 255.0) - 0.5) / 0.5
        return imgs, b["labels"], b["label_lengths"], b["texts"]

    cache = None
    if pregen > 0:
        raw_imgs, all_texts = load_or_render_rec_dataset(
            language, pregen, batch, seed,
            use_space=use_space, fold_case=fold_case,
        )
        cache = (raw_imgs, all_texts)
        q = stop = None
    else:
        q, stop = _prefetch(make_batch)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    eval_fn = jax.jit(
        lambda p, bs, x: rec.apply({"params": p, "batch_stats": bs}, x)
    )
    meta = {
        "language": language,
        "use_space_char": charset.use_space_char,
        "fold_case": charset.fold_case,
        "vocab_size": charset.vocab_size,
        "variant": variant,
        "hidden": hidden,
        "cnn_scale": cnn_scale,
        "jamo": is_jamo,
        "homoglyph_fold": bool(charset.aliases),
        # the crop geometry this head was trained for (the engine warns on
        # mismatch): tight1 = ink-tight re-crop, ops/image.py refine_boxes_ink
        "geometry": "tight1",
    }

    from vse_tpu.core.registry import opt_path

    def checkpoint(step):
        # opt sidecar FIRST: if we die between the two saves, the main
        # checkpoint's step is older than the sidecar's and the mismatch
        # check below simply ignores the sidecar
        save_params(opt_state, opt_path(path), meta={"step": step})
        save_params(
            {"params": params, "batch_stats": batch_stats}, path,
            meta={**meta, "step": step},
        )

    # resume: pick up params/opt state from a prior periodic checkpoint of
    # the same run shape (wall-clock-killed runs otherwise restart cold)
    start_step = 0
    if prior_step > 0:
        from vse_tpu.core.registry import load_params

        try:
            restored = load_params(
                path, like={"params": params, "batch_stats": batch_stats}
            )
            params = restored["params"]
            batch_stats = restored["batch_stats"]
            start_step = prior_step
            print(f"resuming {path} from step {start_step}"
                  + (" (fresh optimizer)" if fresh_opt else ""))
            if not fresh_opt:
                from vse_tpu.core.registry import find_opt_sidecar

                opt_side = find_opt_sidecar(path)
                opt_meta = load_meta(opt_side) if opt_side else None
                if opt_meta and int(opt_meta.get("step", -1)) == start_step:
                    opt_state = load_params(opt_side, like=opt_state)
                    print("restored optimizer state (adam moments + schedule)")
        except Exception as e:
            print(f"resume failed ({e}); training from scratch")

    if start_step >= steps:
        # resume point is already past the requested run — never rewrite a
        # finished checkpoint's meta (a no-op run would reset its step)
        print(f"{path} already at step {start_step} >= {steps}; nothing to do")
        return path

    if cache is not None and device_data:
        # Device-resident fast path (vse_tpu/train/device_loop.py): dataset
        # in HBM, augmentation as MXU matmuls, 200-step lax.scan chunks —
        # the 1-core host otherwise bounds training at ~0.3-2.3 s/step.
        from vse_tpu.train.device_loop import run_rec_device_loop

        raw_imgs, all_texts = cache
        n_all = len(all_texts)
        labels_all = np.zeros((n_all, cfg.max_label_len), np.int32)
        lengths_all = np.zeros((n_all,), np.int32)
        for k, t in enumerate(all_texts):
            ids = charset.encode(t)[: cfg.max_label_len] or [1]
            labels_all[k, : len(ids)] = ids
            lengths_all[k] = len(ids)

        probe = jnp.asarray(
            ((raw_imgs[:4].astype(np.float32) / 255.0) - 0.5) / 0.5)
        probe_texts = [all_texts[k] for k in range(4)]
        t0 = time.time()

        def log_cb(step, loss, p, bs):
            logits = eval_fn(p, bs, probe)
            ids, mask, _ = ctc_greedy_decode(logits)
            preds = decode_batch_to_texts(ids, mask, charset)
            exact = sum(pr == t for pr, t in zip(preds, probe_texts))
            print(
                f"[rec {language}] step {step} loss {loss:.4f} "
                f"probe-exact {exact}/4 ({time.time()-t0:.0f}s) "
                f"pred={preds[0]!r} gt={probe_texts[0]!r}",
                flush=True,
            )

        def checkpoint_cb(step, p, bs, opt):
            nonlocal params, batch_stats, opt_state
            params, batch_stats, opt_state = p, bs, opt
            checkpoint(step)
            print(f"[rec {language}] checkpoint @ {step}", flush=True)

        params, batch_stats, opt_state = run_rec_device_loop(
            raw_imgs=raw_imgs, labels=labels_all, lengths=lengths_all,
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            step_core=step_core, steps=steps, start_step=start_step,
            batch=batch, seed=seed,
            checkpoint_cb=checkpoint_cb, log_cb=log_cb,
        )
        checkpoint(steps)
        print(f"saved {path}")
        return path

    aug_rng = np.random.default_rng(seed + 13)

    def _augment(imgs_u8: np.ndarray) -> np.ndarray:
        """Cheap per-step photometric jitter over cached renders: without it
        a ~40k-sample cache is memorized within a few epochs (observed:
        train loss 3e-4 while FRESH-sample CER sat at 0.50)."""
        x = imgs_u8.astype(np.float32)
        n = x.shape[0]
        gain = aug_rng.uniform(0.7, 1.3, size=(n, 1, 1, 1)).astype(np.float32)
        bias = aug_rng.uniform(-30, 30, size=(n, 1, 1, 1)).astype(np.float32)
        chan = aug_rng.uniform(0.9, 1.1, size=(n, 1, 1, 3)).astype(np.float32)
        x = (x - 127.5) * gain + 127.5 + bias
        x = x * chan
        x += aug_rng.normal(0, aug_rng.uniform(0, 8), size=x.shape)
        # random horizontal shift (text position jitter)
        shift = int(aug_rng.integers(0, 9))
        if shift:
            x = np.roll(x, shift, axis=2)
            x[:, :, :shift] = x[:, :, shift : shift + 1]
        x = np.clip(x, 0, 255)
        # resample chain: real crops arrive through det-box -> bilinear
        # upscale + horizontal aspect-compress (ops/image.py crop policy),
        # while renders are born at 48x320 — without simulating it the head
        # wobbles on real crops ('o'->'g' under blur+squeeze, observed on
        # the golden corpus at high confidence)
        if aug_rng.random() < 0.5:
            import cv2

            h, w = x.shape[1], x.shape[2]
            # gentle range: 0.55 downscale taught systematic o->g
            # confusions on REAL crops (golden F1 1.0 -> 0.67); real det
            # crops upscale from ~0.75x at most
            sy = float(aug_rng.uniform(0.75, 1.0))
            sx = sy * float(aug_rng.uniform(0.85, 1.05))
            dh, dw = max(8, int(h * sy)), max(16, int(w * sx))
            for k in range(x.shape[0]):
                small = cv2.resize(x[k], (dw, dh),
                                   interpolation=cv2.INTER_LINEAR)
                x[k] = cv2.resize(small, (w, h),
                                  interpolation=cv2.INTER_LINEAR)
        if aug_rng.random() < 0.5:
            # crop-expansion geometry: production crops arrive through
            # rec_crop_expand_y (ops-level vertical expansion), so glyphs
            # occupy ~50-80% of the crop height with background bands
            # above/below — renders are born full-height
            import cv2

            h, w = x.shape[1], x.shape[2]
            sy = float(aug_rng.uniform(0.55, 0.85))
            nh = max(12, int(h * sy))
            y_off = int(aug_rng.integers(0, h - nh + 1))
            for k in range(x.shape[0]):
                small = cv2.resize(x[k], (w, nh),
                                   interpolation=cv2.INTER_LINEAR)
                canvas = np.empty_like(x[k])
                canvas[:y_off] = small[0]
                canvas[y_off : y_off + nh] = small
                canvas[y_off + nh :] = small[-1]
                x[k] = canvas
        return x

    def _cache_batch(i: int):
        raw_imgs, all_texts = cache
        total = len(all_texts)
        # curriculum: samples are rendered clean->hard; start on the clean
        # prefix, cover everything by 40% of training. Indices are RANDOM
        # within the window (fixed batch groupings get memorized too).
        frac = min(1.0, i / max(1, steps * 0.4))
        window = max(batch * 8, int(total * frac))
        idx = aug_rng.integers(0, min(window, total), size=batch)
        imgs = (_augment(raw_imgs[idx]) / 255.0 - 0.5) / 0.5
        texts = [all_texts[k] for k in idx]
        labels = np.zeros((batch, cfg.max_label_len), np.int32)
        lengths = np.zeros((batch,), np.int32)
        for k, t in enumerate(texts):
            ids = charset.encode(t)[: cfg.max_label_len] or [1]
            labels[k, : len(ids)] = ids
            lengths[k] = len(ids)
        return imgs.astype(np.float32), labels, lengths, texts

    # overlap host batch assembly/augmentation with the device step
    cache_q: "queue.Queue" = queue.Queue(maxsize=4)
    cache_stop = threading.Event()
    if cache is not None:
        def _cache_feeder():
            for i in range(start_step, steps):
                b = _cache_batch(i)
                while not cache_stop.is_set():
                    try:
                        cache_q.put(b, timeout=1)
                        break
                    except queue.Full:
                        continue
                if cache_stop.is_set():
                    return

        threading.Thread(target=_cache_feeder, daemon=True).start()

    t0 = time.time()
    try:
        for i in range(start_step, steps):
            # periodic saves: a wall-clock kill must not lose the run
            if i > 0 and i % 1000 == 0:
                checkpoint(i)
            if cache is not None:
                imgs, labels, lengths, texts = cache_q.get()
            else:
                difficulty["value"] = min(1.0, 2.0 * i / max(1, steps))
                imgs, labels, lengths, texts = q.get()
            params, batch_stats, opt_state, loss = step_fn(
                params, batch_stats, opt_state, jnp.asarray(imgs),
                jnp.asarray(labels), jnp.asarray(lengths),
            )
            if i % log_every == 0 or i == steps - 1:
                logits = eval_fn(params, batch_stats, jnp.asarray(imgs[:4]))
                ids, mask, _ = ctc_greedy_decode(logits)
                preds = decode_batch_to_texts(ids, mask, charset)
                exact = sum(p == t for p, t in zip(preds, texts[:4]))
                print(
                    f"[rec {language}] step {i} loss {float(loss):.4f} "
                    f"sample-exact {exact}/4 ({time.time()-t0:.0f}s) "
                    f"pred={preds[0]!r} gt={texts[0]!r}"
                )
    finally:
        cache_stop.set()
        if stop is not None:
            stop.set()
    checkpoint(steps)
    print(f"saved {path}")
    return path


def train_det(steps: int, batch: int, lr: float, seed: int,
              variant: str = "mobile", log_every: int = 25,
              det_h: int = 256, det_w: int = 448, pregen: int = 0) -> str:
    """`pregen` > 0: render that many frames once (disk-cached) and sample
    randomly with photometric jitter — the 1-core host otherwise starves the
    TPU (same fix as train_rec's cache mode)."""
    charset = get_charset("en")
    cfg = SynthConfig(det_h=det_h, det_w=det_w)
    det = DBDetector(variant=variant, train_outputs=True, dtype=jnp.float32)
    variables = det.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, det_h, det_w, 3)), train=True
    )
    tx = optax.adamw(optax.warmup_cosine_decay_schedule(0, lr, 100, steps))
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step_fn(params, batch_stats, opt_state, batch):
        def loss_fn(p):
            (prob, thresh, binary), mut = det.apply(
                {"params": p, **batch_stats}, batch["det_images"], train=True,
                mutable=["batch_stats"],
            )
            loss, metrics = db_loss(
                prob, thresh, binary,
                batch["gt_shrink"], batch["gt_shrink_mask"],
                batch["gt_thresh"], batch["gt_thresh_mask"],
            )
            return loss, (mut, metrics)

        (loss, (mut, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), mut, opt_state, loss, metrics

    renderers = {}

    def make_batch(wid):
        if wid not in renderers:
            renderers[wid] = TextRenderer(charset, cfg, seed=seed * 100 + wid)
        b = renderers[wid].det_batch(batch)
        imgs = b["det_images"].astype(np.float32) / 255.0
        imgs = (imgs - np.array([0.485, 0.456, 0.406], np.float32)) / np.array(
            [0.229, 0.224, 0.225], np.float32
        )
        return {
            "det_images": imgs.astype(np.float32),
            "gt_shrink": b["gt_shrink"],
            "gt_shrink_mask": b["gt_shrink_mask"],
            "gt_thresh": b["gt_thresh"],
            "gt_thresh_mask": b["gt_thresh_mask"],
        }

    if pregen > 0:
        ds = load_or_render_det_dataset(pregen, det_h, det_w, seed)
        q = stop = None
    else:
        q, stop = _prefetch(make_batch)
    params = variables["params"]
    batch_stats = {k: v for k, v in variables.items() if k != "params"}
    path = f"{models_root()}/det_{variant}"
    # resume: pick up params from a prior periodic checkpoint (wall-clock
    # kills are routine on this box; same contract as train_rec)
    start_step = 0
    if os.path.isdir(path):
        from vse_tpu.core.registry import load_meta, load_params

        prior_meta = load_meta(path)
        try:
            restored = load_params(path, like={"params": params, **batch_stats})
            params = restored["params"]
            batch_stats = {k: v for k, v in restored.items() if k != "params"}
            start_step = int((prior_meta or {}).get("step", 0))
            print(f"resuming {path} from step {start_step}")
            from vse_tpu.core.registry import find_opt_sidecar

            opt_side = find_opt_sidecar(path)
            opt_meta = load_meta(opt_side) if opt_side else None
            if opt_meta and int(opt_meta.get("step", -1)) == start_step:
                opt_state = load_params(opt_side, like=opt_state)
                print("restored optimizer state (adam moments + schedule)")
        except Exception as e:
            print(f"resume failed ({e}); training from scratch")

    from vse_tpu.core.registry import opt_path

    def det_checkpoint(step):
        save_params(opt_state, opt_path(path), meta={"step": step})
        save_params({"params": params, **batch_stats}, path,
                    meta={"variant": variant, "step": step})

    t0 = time.time()
    if q is None:
        if start_step >= steps:
            print(f"{path} already at step {start_step} >= {steps}; "
                  "nothing to do")
            return path
        # Device-resident path (vse_tpu/train/device_loop.py): the host-fed
        # loop shipped ~60 MB of transfer buffers per step, which the
        # remote-tunnel platform never reclaimed (OOM at ~130 GB RSS, r3).
        from vse_tpu.train.device_loop import run_det_device_loop

        state = {"params": params, "bs": batch_stats, "opt": opt_state}

        def dev_ckpt(step, p, bs, opt):
            nonlocal params, batch_stats, opt_state
            params, batch_stats, opt_state = p, bs, opt
            det_checkpoint(step)
            print(f"[det] checkpoint @ {step}", flush=True)

        def dev_log(step, loss, metrics, p, bs):
            print(
                f"[det] step {step} loss {loss:.4f} "
                f"bce {metrics['shrink_bce']:.4f} "
                f"dice {metrics['binary_dice']:.4f} "
                f"l1 {metrics['thresh_l1']:.4f} ({time.time()-t0:.0f}s)",
                flush=True,
            )

        params, batch_stats, opt_state = run_det_device_loop(
            ds=ds, params=state["params"], batch_stats=state["bs"],
            opt_state=state["opt"], step_core=step_fn, steps=steps,
            start_step=start_step, batch=batch, seed=seed,
            checkpoint_cb=dev_ckpt, log_cb=dev_log,
        )
    else:
        try:
            for i in range(start_step, steps):
                if i > 0 and i % 500 == 0:
                    det_checkpoint(i)
                hb = {k: jnp.asarray(v) for k, v in q.get().items()}
                params, mut, opt_state, loss, metrics = step_fn(
                    params, batch_stats, opt_state, hb
                )
                batch_stats = mut
                if i % log_every == 0 or i == steps - 1:
                    print(
                        f"[det] step {i} loss {float(loss):.4f} "
                        f"bce {float(metrics['shrink_bce']):.4f} "
                        f"dice {float(metrics['binary_dice']):.4f} "
                        f"l1 {float(metrics['thresh_l1']):.4f} "
                        f"({time.time()-t0:.0f}s)"
                    )
        finally:
            stop.set()
    det_checkpoint(steps)
    print(f"saved {path}")
    return path


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="what", required=True)
    pr = sub.add_parser("rec")
    pr.add_argument("--language", default="en")
    pr.add_argument("--steps", type=int, default=3000)
    pr.add_argument("--batch", type=int, default=64)
    pr.add_argument("--lr", type=float, default=1e-3)
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("--variant", default="mobile", choices=["mobile", "server"])
    pr.add_argument("--pregen", type=int, default=0,
                    help="pre-render N batches and epoch over them")
    pr.add_argument("--use-space", action="store_true", dest="use_space",
                    help="keep the space class (slower convergence)")
    pr.add_argument("--host-data", action="store_true", dest="host_data",
                    help="feed batches from the host thread instead of the "
                         "device-resident loop (debug fallback)")
    pr.add_argument("--fresh", action="store_true",
                    help="ignore an existing checkpoint; train from scratch")
    pr.add_argument("--fresh-opt", action="store_true", dest="fresh_opt",
                    help="warm-start params but re-init the optimizer with "
                         "a full LR schedule over the remaining steps")
    pr.add_argument("--hidden", type=int, default=0,
                    help="BiLSTM width override (0 = variant default; "
                         "large-vocab CJK mobile heads need 128)")
    pr.add_argument("--cnn-scale", type=float, default=0.0, dest="cnn_scale",
                    help="MobileNetV3 width multiplier override "
                         "(0 = variant default)")
    pren = sub.add_parser("render", help="host-only dataset pre-render")
    pren.add_argument("--language", default="en")
    pren.add_argument("--pregen", type=int, default=600)
    pren.add_argument("--batch", type=int, default=64)
    pren.add_argument("--seed", type=int, default=0)
    pren.add_argument("--det", action="store_true",
                      help="render the det dataset instead of rec crops")
    pd = sub.add_parser("det")
    pd.add_argument("--pregen", type=int, default=0,
                    help="pre-render N frames and sample from the cache")
    pd.add_argument("--steps", type=int, default=1500)
    pd.add_argument("--batch", type=int, default=16)
    pd.add_argument("--lr", type=float, default=5e-4)
    pd.add_argument("--seed", type=int, default=0)
    pd.add_argument("--variant", default="mobile", choices=["mobile", "server"])
    args = ap.parse_args()
    if args.what == "render":
        if args.det:
            load_or_render_det_dataset(args.pregen, seed=args.seed)
        else:
            load_or_render_rec_dataset(args.language, args.pregen,
                                       args.batch, args.seed)
        return
    if args.what == "rec":
        train_rec(args.language, args.steps, args.batch, args.lr, args.seed,
                  args.variant, pregen=args.pregen, use_space=args.use_space,
                  device_data=not args.host_data, fresh=args.fresh,
                  fresh_opt=args.fresh_opt, hidden=args.hidden,
                  cnn_scale=args.cnn_scale)
    else:
        train_det(args.steps, args.batch, args.lr, args.seed, args.variant,
                  pregen=args.pregen)


if __name__ == "__main__":
    main()
