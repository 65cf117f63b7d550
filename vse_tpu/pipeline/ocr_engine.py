"""The OCR engine: one compiled det+rec device program.

Replaces the reference's OcrRecogniser/PaddleOCR wrapper (reference
backend/tools/ocr.py:9-113) and the det-only SubtitleDetect (reference
backend/tools/subtitle_detect.py:5-26). The reference crosses Python<->C++
per call and re-preprocesses on host; here the whole hot path —
letterbox/normalize -> DB forward -> box extraction -> crop/rectify ->
CRNN forward -> CTC decode — is XLA-compiled with static shape buckets, so
per-batch host work is only the final ids->string conversion.

Output contract parity: `predict(img)` returns (dt_box, rec_res) shaped like
the reference (quads as 4 (x, y) points; rec_res as [(text, prob)]), with the
same line ordering — boxes grouped into text lines by ymin rounded to the
nearest 10, lines sorted top-to-bottom, boxes left-to-right within a line
(reference backend/tools/ocr.py:16-22,44-79).
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vse_tpu.core.charset import Charset, get_charset
from vse_tpu.core.config import Mode, VseConfig
from vse_tpu.core.registry import ModelSpec, init_or_load, load_det, resolve
from vse_tpu.models.crnn import CRNNRecognizer
from vse_tpu.models.db_detector import DBDetector
from vse_tpu.ops.ctc import ctc_greedy_decode, decode_batch_to_texts
from vse_tpu.ops.db_postprocess import db_postprocess
from vse_tpu.ops.image import (
    crop_axis_aligned_fixed,
    crop_axis_aligned_matmul,
    crop_axis_aligned_matmul_windowed,
    letterbox_matmul,
    normalize_det,
    normalize_rec,
    refine_boxes_ink,
)


def _crops_tight(frame, fboxes, rec_h, rec_w, cfg, frame_h, windowed=True):
    """Rec crops for one frame with the ink-tight two-pass policy: sample a
    provisional crop from the (expand_y-inflated) boxes, measure each
    crop's vertical ink band, re-crop the frame to ink + margin
    (ops/image.py refine_boxes_ink). Both passes are the separable-matmul
    crop, so the cost is ~2x one crop — small against the CRNN forward —
    and the final crop resamples ORIGINAL frame pixels."""
    crop = (
        crop_axis_aligned_matmul_windowed if windowed
        else crop_axis_aligned_matmul
    )
    crops0 = jax.vmap(lambda b: crop(frame, b, rec_h, rec_w))(fboxes)
    if not cfg.rec_crop_tighten:
        return crops0
    refined = refine_boxes_ink(
        crops0, fboxes, cfg.rec_crop_tight_margin, frame_h
    )
    return jax.vmap(lambda b: crop(frame, b, rec_h, rec_w))(refined)


def y_round(y: int) -> int:
    """Round a ymin to the nearest multiple of 10 (reference
    backend/tools/ocr.py:16-22)."""
    up = y + 10 - y % 10
    down = y - y % 10
    return up if abs(y - up) < abs(y - down) else down


def sort_into_lines(
    coords: List[Tuple[int, int, int, int]], items: List[Any]
) -> Tuple[List[Tuple[int, int, int, int]], List[Any]]:
    """Group boxes into text lines by rounded ymin and order them
    (line-y asc, then x asc) — the reference's ranking (ocr.py:44-79)."""
    lines: List[int] = []
    for c in coords:
        ry = y_round(c[2])
        if not lines:
            lines.append(ry)
        elif ry not in lines and ry + 10 not in lines and ry - 10 not in lines:
            lines.append(ry)
    lines = sorted(lines)
    snapped = []
    for c in coords:
        ry = y_round(c[2])
        best = c[2]
        for ln in lines:
            if abs(ln - ry) <= 10:
                best = ln
                break
        snapped.append((c[0], c[1], best, c[3]))
    order = sorted(range(len(coords)), key=lambda i: (snapped[i][2], snapped[i][0]))
    return [snapped[i] for i in order], [items[i] for i in order]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _expand_boxes_y(boxes: jnp.ndarray, frac: float, h: int) -> jnp.ndarray:
    """Expand xyxy boxes vertically by `frac` of their height per side,
    clamped to the frame. Crop-stage-only compensation for the thin DB
    shrink core (see VseConfig.rec_crop_expand_y); reported det boxes are
    NOT expanded."""
    if frac <= 0:
        return boxes
    pad = frac * (boxes[..., 3] - boxes[..., 1])
    return jnp.stack(
        [
            boxes[..., 0],
            jnp.clip(boxes[..., 1] - pad, 0, h - 1),
            boxes[..., 2],
            jnp.clip(boxes[..., 3] + pad, 0, h - 1),
        ],
        axis=-1,
    )


class OcrEngine:
    """Device-resident detector + recognizer with shape-bucketed jit cache."""

    def __init__(
        self,
        language: str = "en",
        mode: Mode = Mode.FAST,
        config: Optional[VseConfig] = None,
        charset: Optional[Charset] = None,
        det_params: Any = None,
        rec_params: Any = None,
        accelerated: bool = True,
        seed: int = 0,
        mesh=None,
        decode: str = "greedy",
        beam_width: int = 8,
        rectify: Optional[bool] = None,
    ):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — frame
        batches shard across chips (each chip OCRs its own frames; params
        replicate; no collectives on the hot path — SURVEY.md §2.2 P3/P5
        TPU equivalents). None = single-device.

        `decode`: 'greedy' (on-device, default) or 'beam' (host prefix beam
        over device log-probs — accuracy-sensitive accurate-mode option)."""
        self.config = config or VseConfig(language=language, mode=mode)
        self.language = language
        self.mode = mode
        self.spec: ModelSpec = resolve(language, mode, accelerated)
        self.charset = charset or get_charset(language)
        # server -> mobile rec fallback: the reference's model resolution
        # falls back to the fast model when no server model exists
        # (reference backend/tools/paddle_model_config.py:72-82); a trained
        # mobile head always beats a random-init server head
        import os as _os

        from vse_tpu.core.registry import load_meta, rec_ckpt_path

        self.rec_ckpt = self.spec.rec_ckpt
        self.rec_variant = self.spec.rec_variant
        if not _os.path.isdir(self.rec_ckpt) and self.rec_variant == "server":
            mobile_ckpt = rec_ckpt_path(language, "mobile")
            if _os.path.isdir(mobile_ckpt):
                self.rec_ckpt = mobile_ckpt
                self.rec_variant = "mobile"
        # a trained rec checkpoint records its charset options — the head's
        # class count/order is part of the weights
        rec_meta = load_meta(self.rec_ckpt)
        if rec_meta:
            if rec_meta.get("fold_case", False):
                self.charset = self.charset.folded()
            if not rec_meta.get("use_space_char", True):
                self.charset = self.charset.without_space()
            if rec_meta.get("jamo", False):
                # korean heads trained on positional-jamo classes
                # (vse_tpu/core/charset.py JamoCharset); decode recomposes
                # syllables, so the text contract is unchanged
                from vse_tpu.core.charset import to_jamo

                self.charset = to_jamo(self.charset)
            if rec_meta.get("homoglyph_fold", False):
                # heads trained with pixel-identical glyph twins folded
                # (arabic digit pairs, ه/ە, ى/ی — vse_tpu/core/arabic.py)
                from vse_tpu.core.arabic import HOMOGLYPHS

                self.charset = self.charset.aliased(HOMOGLYPHS)
            head_geo = rec_meta.get("geometry", "expand_y")
            want_geo = (
                "tight1" if self.config.rec_crop_tighten else "expand_y"
            )
            if head_geo != want_geo:
                import warnings

                warnings.warn(
                    f"rec checkpoint {self.rec_ckpt} was trained for crop "
                    f"geometry {head_geo!r} but the engine runs {want_geo!r} "
                    "(config.rec_crop_tighten) — recognition quality will "
                    "degrade; retrain the head or match the config.",
                    stacklevel=2,
                )
        # hidden / cnn_scale overrides are part of the trained weights'
        # architecture (large-vocab CJK mobile heads train wider — see
        # models/crnn.py); absent keys fall back to the variant defaults,
        # so pre-override checkpoints rebuild unchanged
        self.rec_model = CRNNRecognizer(
            vocab_size=self.charset.vocab_size, variant=self.rec_variant,
            hidden=int((rec_meta or {}).get("hidden", 0) or 0),
            cnn_scale=float((rec_meta or {}).get("cnn_scale", 0.0) or 0.0),
        )
        self.rec_h = self.config.rec_image_height
        self.rec_w = self.config.rec_image_width
        self.max_boxes = self.config.max_boxes_per_frame
        self.det_loaded = False
        self.rec_loaded = False
        dummy_det = jnp.zeros((1, 64, 64, 3), jnp.float32)
        dummy_rec = jnp.zeros((1, self.rec_h, self.rec_w, 3), jnp.float32)
        if det_params is not None:
            self.det_model = DBDetector(variant=self.spec.det_variant)
            self.det_params = det_params
            self.det_loaded = True
        else:
            self.det_model, self.det_params, self.det_loaded = load_det(
                self.spec, dummy_det, seed
            )
        if rec_params is not None:
            self.rec_params = rec_params
            self.rec_loaded = True
        else:
            self.rec_params, self.rec_loaded = init_or_load(
                self.rec_model, dummy_rec, self.rec_ckpt, seed + 1
            )
        if not self.rec_loaded:
            import warnings

            warnings.warn(
                f"no trained recognizer checkpoint at {self.rec_ckpt}; "
                "running with RANDOM-INIT weights — recognition output will "
                "be garbage. Train one with `python -m vse_tpu.train.pretrain "
                f"rec --language {language}`.",
                stacklevel=2,
            )
        self._fn_cache: dict = {}
        self.decode = decode
        self.beam_width = beam_width
        # rotated-text handling: perspective-rectify oriented quads before
        # rec (the reference stack always rectifies via
        # get_rotate_crop_image; here the gather-based resample costs ~16x
        # the axis-aligned matmul crop, so it is config-gated — subtitles
        # are horizontal)
        self.rectify = self.config.rec_rectify if rectify is None else rectify
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_sharding = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())
            self.det_params = jax.device_put(self.det_params, rep)
            self.rec_params = jax.device_put(self.rec_params, rep)
        else:
            self._data_sharding = None

    def _shard_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Place a [B, ...] batch on the mesh, padding B up to a multiple of
        the data-axis size (padding rows produce no valid boxes)."""
        if self._data_sharding is None:
            return frames
        n = self.mesh.shape["data"]
        B = frames.shape[0]
        pad = (-B) % n
        if pad:
            frames = jnp.concatenate(
                [frames, jnp.zeros((pad,) + frames.shape[1:], frames.dtype)]
            )
        return jax.device_put(frames, self._data_sharding)

    # --- compiled stages ---------------------------------------------------

    def det_bucket(self, h: int, w: int) -> Tuple[int, int]:
        """Det input bucket: multiples of 32 (backbone stride), capped by the
        configured det canvas."""
        return (
            min(_round_up(h, 32), _round_up(self.config.det_image_height, 32)),
            min(_round_up(w, 32), _round_up(self.config.det_image_width, 32)),
        )

    def _detect_fn(self, hd: int, wd: int):
        key = ("det", hd, wd)
        if key not in self._fn_cache:

            cfg = self.config

            @jax.jit
            def run(det_params, frames_u8):
                # frames_u8: [B, hd, wd, 3] already letterboxed on device side
                x = normalize_det(frames_u8)
                prob = self.det_model.apply(det_params, x)
                boxes, scores, valid = db_postprocess(
                    prob,
                    max_boxes=self.max_boxes,
                    thresh=cfg.db_thresh,
                    box_thresh=cfg.db_box_thresh,
                    unclip_ratio=cfg.db_unclip_ratio,
                    pool=cfg.db_pool,
                    num_sweeps=cfg.db_sweeps,
                )
                return prob, boxes, scores, valid

            self._fn_cache[key] = run
        return self._fn_cache[key]

    def _resize_fn(self, h: int, w: int, hd: int, wd: int):
        """Device letterbox uint8 [B, h, w, 3] -> [B, hd, wd, 3]."""
        key = ("resize", h, w, hd, wd)
        if key not in self._fn_cache:
            scale = min(hd / h, wd / w)
            nh, nw = int(round(h * scale)), int(round(w * scale))

            @jax.jit
            def run(frames_u8):
                f = frames_u8.astype(jnp.float32)
                r = jax.image.resize(
                    f, (f.shape[0], nh, nw, 3), method="bilinear"
                )
                out = jnp.zeros((f.shape[0], hd, wd, 3), jnp.float32)
                out = jax.lax.dynamic_update_slice(out, r, (0, 0, 0, 0))
                return out

            self._fn_cache[key] = (run, 1.0 / scale)
        return self._fn_cache[key]

    def _predict_fused_fn(self, h: int, w: int, hd: int, wd: int):
        """ONE jitted program for the whole OCR step: letterbox -> normalize
        -> DB forward -> box extraction -> scale boxes to frame coords ->
        crop -> CRNN forward -> CTC decode. No host round-trip between det
        and rec (the reference crosses Python<->C++ twice per frame here,
        reference backend/tools/ocr.py:24-86); boxes stay on device.

        On TPU the CTC decode runs the Pallas kernel (one HBM pass over the
        [B*K, T, C] logits — vse_tpu/kernels/ctc_decode.py)."""
        key = ("predict_fused", h, w, hd, wd)
        if key not in self._fn_cache:
            cfg = self.config
            use_pallas_ctc = jax.default_backend() == "tpu"

            rectify = self.rectify

            @jax.jit
            def run(det_params, rec_params, frames_u8):
                x, inv_scale = letterbox_matmul(frames_u8, hd, wd)
                prob = self.det_model.apply(det_params, x)
                boxes, det_scores, valid, angles = db_postprocess(
                    prob,
                    max_boxes=self.max_boxes,
                    thresh=cfg.db_thresh,
                    box_thresh=cfg.db_box_thresh,
                    unclip_ratio=cfg.db_unclip_ratio,
                    pool=cfg.db_pool,
                    num_sweeps=cfg.db_sweeps,
                    with_angles=True,
                )
                # det-canvas -> original frame coords, clamped on device
                inv_y, inv_x = inv_scale
                boxes = jnp.stack(
                    [
                        jnp.clip(boxes[..., 0] * inv_x, 0, w - 1),
                        jnp.clip(boxes[..., 1] * inv_y, 0, h - 1),
                        jnp.clip(boxes[..., 2] * inv_x, 0, w - 1),
                        jnp.clip(boxes[..., 3] * inv_y, 0, h - 1),
                    ],
                    axis=-1,
                )

                crop_boxes = _expand_boxes_y(
                    boxes, cfg.rec_crop_expand_y, h
                )
                if rectify:
                    from vse_tpu.ops.image import (
                        crop_quad_rectified_windowed,
                        quads_from_boxes,
                    )

                    # quads from the RAW boxes: the bbox->rect inversion
                    # assumes an unexpanded bbox, and the recovered PCA
                    # rect already frames the glyphs tightly — measured
                    # best rec accuracy at zero extra expansion (the
                    # axis-aligned path's rec_crop_expand_y compensates
                    # bbox clipping that the oriented fit doesn't have)
                    quads = quads_from_boxes(boxes, angles)

                    def per_frame(frame, fquads):
                        ff = frame.astype(jnp.float32)
                        return jax.vmap(
                            lambda q: crop_quad_rectified_windowed(
                                ff, q, self.rec_h, self.rec_w
                            )
                        )(fquads)

                    crops = jax.vmap(per_frame)(frames_u8, quads)
                else:

                    def per_frame(frame, fboxes):
                        # frame stays uint8 into the crop: the 288-row band
                        # slice then moves 1 byte/px instead of 4 (8 boxes x
                        # 128 frames of f32 bands cost ~6.8 GB HBM traffic,
                        # measured 23 ms of the fused program) and the crop
                        # matmuls run bf16 on the MXU
                        return _crops_tight(
                            frame, fboxes, self.rec_h, self.rec_w, cfg, h
                        )

                    crops = jax.vmap(per_frame)(frames_u8, crop_boxes)
                B, K = crops.shape[0], crops.shape[1]
                crops = crops.reshape((B * K,) + crops.shape[2:])
                crops = (crops / 255.0 - 0.5) / 0.5
                logits = self.rec_model.apply(rec_params, crops)
                if use_pallas_ctc:
                    from vse_tpu.kernels.ctc_decode import (
                        ctc_greedy_decode_pallas,
                    )

                    ids, mask, rec_scores = ctc_greedy_decode_pallas(logits)
                else:
                    ids, mask, rec_scores = ctc_greedy_decode(logits)
                T = ids.shape[1]
                return (
                    boxes,
                    det_scores,
                    valid,
                    ids.reshape(B, K, T),
                    mask.reshape(B, K, T),
                    rec_scores.reshape(B, K),
                )

            self._fn_cache[key] = run
        return self._fn_cache[key]

    def _crop_rec_fn(self, h: int, w: int):
        """Crop K boxes from each full-res frame and run rec + CTC decode."""
        key = ("crop_rec", h, w)
        if key not in self._fn_cache:

            @jax.jit
            def run(rec_params, frames_u8, boxes):
                # frames_u8: [B, h, w, 3]; boxes: [B, K, 4] xyxy in frame coords
                boxes = _expand_boxes_y(
                    boxes, self.config.rec_crop_expand_y, h
                )

                def per_frame(frame, fboxes):
                    f = frame.astype(jnp.float32)
                    return _crops_tight(
                        f, fboxes, self.rec_h, self.rec_w, self.config, h,
                        windowed=False,
                    )

                crops = jax.vmap(per_frame)(frames_u8, boxes)  # [B,K,h,w,3]
                B, K = crops.shape[0], crops.shape[1]
                crops = crops.reshape((B * K,) + crops.shape[2:])
                crops = (crops / 255.0 - 0.5) / 0.5
                logits = self.rec_model.apply(rec_params, crops)
                ids, mask, scores = ctc_greedy_decode(logits)
                T = ids.shape[1]
                return (
                    ids.reshape(B, K, T),
                    mask.reshape(B, K, T),
                    scores.reshape(B, K),
                )

            self._fn_cache[key] = run
        return self._fn_cache[key]

    def _crop_logits_fn(self, h: int, w: int):
        """Crop + rec forward returning log-probs (beam-decode path)."""
        key = ("crop_logits", h, w)
        if key not in self._fn_cache:

            @jax.jit
            def run(rec_params, frames_u8, boxes):
                boxes = _expand_boxes_y(
                    boxes, self.config.rec_crop_expand_y, h
                )

                def per_frame(frame, fboxes):
                    f = frame.astype(jnp.float32)
                    return _crops_tight(
                        f, fboxes, self.rec_h, self.rec_w, self.config, h,
                        windowed=False,
                    )

                crops = jax.vmap(per_frame)(frames_u8, boxes)
                B, K = crops.shape[0], crops.shape[1]
                crops = crops.reshape((B * K,) + crops.shape[2:])
                crops = (crops / 255.0 - 0.5) / 0.5
                logits = self.rec_model.apply(rec_params, crops)
                logp = jax.nn.log_softmax(logits, axis=-1)
                return logp.reshape(B, K, logp.shape[1], logp.shape[2])

            self._fn_cache[key] = run
        return self._fn_cache[key]

    # --- public API ----------------------------------------------------------

    def detect_batch(self, frames_u8: np.ndarray):
        """Det-only forward (the reference's SubtitleDetect role): returns
        (boxes [B,K,4] in original coords, det_scores [B,K], valid [B,K])."""
        B, h, w, _ = frames_u8.shape
        hd, wd = self.det_bucket(h, w)
        resize, inv_scale = self._resize_fn(h, w, hd, wd)
        det = self._detect_fn(hd, wd)
        canvas = resize(self._shard_frames(jnp.asarray(frames_u8)))
        _, boxes, scores, valid = det(self.det_params, canvas)
        boxes = np.asarray(boxes)[:B] * inv_scale
        scores = np.asarray(scores)[:B]
        valid = np.asarray(valid)[:B]
        # clamp to frame
        boxes[..., 0::2] = boxes[..., 0::2].clip(0, w - 1)
        boxes[..., 1::2] = boxes[..., 1::2].clip(0, h - 1)
        return boxes, scores, valid

    def predict_batch(
        self, frames_u8: np.ndarray, origin: Tuple[int, int] = (0, 0)
    ) -> List[Tuple[list, list]]:
        """Full OCR on a frame batch. Returns per-frame (dt_box, rec_res)
        in the reference's format.

        Greedy decode runs the fused single-program path (det+rec in one
        XLA program, boxes never leave the device). Frames are processed in
        chunks of `max_batch_size` (the reference's det-batch knob,
        reference backend/config.py:60) — one compiled bucket per shape.

        `origin=(dy, dx)`: offset added to output box coords — callers that
        upload only the subtitle band (saving host->device bytes) get boxes
        back in FULL-frame coordinates."""
        B, h, w, _ = frames_u8.shape
        if self.decode == "beam":
            return self._predict_batch_beam(frames_u8, origin)
        on_device = isinstance(frames_u8, jax.Array)
        chunk = max(1, self.config.max_batch_size)
        out: List[Tuple[list, list]] = []
        for i in range(0, B, chunk):
            fr = frames_u8[i : i + chunk]
            n = fr.shape[0]
            if n < chunk and B > chunk and not on_device:
                # pad the tail to the compiled bucket size
                fr = np.concatenate(
                    [fr, np.zeros((chunk - n,) + fr.shape[1:], fr.dtype)]
                )
            res = self.ocr_step_device(
                fr if on_device else self._shard_frames(jax.device_put(fr))
            )
            boxes, det_scores, valid, ids, mask, rec_scores = (
                np.asarray(r)[:n] for r in res
            )
            out.extend(
                self._format_results(
                    n, boxes, valid, ids, mask, rec_scores, origin
                )
            )
        return out

    def ocr_step_device(self, frames_dev: jnp.ndarray):
        """The ONE compiled OCR step on device-resident frames — the exact
        program `predict_batch` runs. Returns device arrays
        (boxes, det_scores, valid, ids, mask, rec_scores); callers that
        pipeline uploads (multistream, bench) use this directly."""
        _, h, w, _ = frames_dev.shape
        hd, wd = self.det_bucket(h, w)
        fused = self._predict_fused_fn(h, w, hd, wd)
        return fused(self.det_params, self.rec_params, frames_dev)

    def _to_logical(self, text: str) -> str:
        """Script-aware decode post-pass. Arabic heads are trained on
        visual-order labels (RTL rendering, vse_tpu/core/arabic.py) —
        restore logical order; bilingual cyrillic/greek heads emit
        arbitrary members of pixel-identical cross-script twin classes —
        fold them toward the line's majority script
        (vse_tpu/post/homoglyph.py)."""
        if not text:
            return text
        if self.spec.rec_family == "arabic":
            from vse_tpu.core.arabic import visual_to_logical

            return visual_to_logical(text)
        if self.spec.rec_family in ("cyrillic", "el"):
            from vse_tpu.post.homoglyph import normalize_script

            return normalize_script(text, self.spec.rec_family)
        return text

    def _format_results(self, B, boxes, valid, ids, mask, rec_scores,
                        origin=(0, 0)):
        """ids/mask -> texts, reference output format + line sorting."""
        dy, dx = origin
        out = []
        for b in range(B):
            coords = []
            items = []
            for k in range(self.max_boxes):
                if not valid[b, k]:
                    continue
                x0, y0, x1, y1 = boxes[b, k]
                x0, x1, y0, y1 = x0 + dx, x1 + dx, y0 + dy, y1 + dy
                text = self.charset.decode_ids(
                    [int(i) for i, m in zip(ids[b, k], mask[b, k]) if m]
                )
                text = self._to_logical(text)
                score = float(rec_scores[b, k])
                coords.append((int(x0), int(x1), int(y0), int(y1)))
                items.append((text, score))
            coords, items = sort_into_lines(coords, items)
            dt_box = [
                [(c[0], c[2]), (c[1], c[2]), (c[1], c[3]), (c[0], c[3])]
                for c in coords
            ]
            out.append((dt_box, items))
        return out

    def _predict_batch_beam(
        self, frames_u8: np.ndarray, origin: Tuple[int, int] = (0, 0)
    ) -> List[Tuple[list, list]]:
        """Beam-decode path: device det + rec log-probs, host prefix beam.
        Crops decode host-side in `rec_batch_number` groups (the reference's
        rec-batch knob, reference backend/config.py:58)."""
        B, h, w, _ = frames_u8.shape
        boxes, det_scores, valid = self.detect_batch(frames_u8)
        frames_dev = self._shard_frames(jnp.asarray(frames_u8))
        boxes_dev = self._shard_frames(jnp.asarray(boxes.astype(np.float32)))
        from vse_tpu.ops.ctc import ctc_prefix_beam_decode

        logp = np.asarray(
            self._crop_logits_fn(h, w)(self.rec_params, frames_dev, boxes_dev)
        )[:B]
        texts = {}
        beam_scores = {}
        todo = [
            (b, k)
            for b in range(B)
            for k in range(self.max_boxes)
            if valid[b, k]
        ]
        group = max(1, self.config.rec_batch_number)
        for gi in range(0, len(todo), group):
            for b, k in todo[gi : gi + group]:
                ids_bk, score = ctc_prefix_beam_decode(
                    logp[b, k], beam_width=self.beam_width
                )
                texts[(b, k)] = self._to_logical(
                    self.charset.decode_ids(ids_bk)
                )
                beam_scores[(b, k)] = score
        dy, dx = origin
        out = []
        for b in range(B):
            coords = []
            items = []
            for k in range(self.max_boxes):
                if not valid[b, k]:
                    continue
                x0, y0, x1, y1 = boxes[b, k]
                x0, x1, y0, y1 = x0 + dx, x1 + dx, y0 + dy, y1 + dy
                coords.append((int(x0), int(x1), int(y0), int(y1)))
                items.append((texts[(b, k)], beam_scores[(b, k)]))
            coords, items = sort_into_lines(coords, items)
            dt_box = [
                [(c[0], c[2]), (c[1], c[2]), (c[1], c[3]), (c[0], c[3])]
                for c in coords
            ]
            out.append((dt_box, items))
        return out

    def predict(self, image_u8: np.ndarray) -> Tuple[list, list]:
        """Single-image OCR with the reference's `predict` contract
        (reference backend/tools/ocr.py:24-86)."""
        return self.predict_batch(image_u8[None])[0]
