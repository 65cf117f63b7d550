"""Typed configuration for the extraction pipeline.

Mirrors the reference's config surface (reference backend/config.py:27-102):
same keys, same defaults, same value ranges — but as a plain frozen dataclass
feeding both the CLI and the library API (no Qt/QConfig dependency). The
reference persists to config/config.json; we accept the same JSON shape via
``VseConfig.from_json`` so existing user configs carry over.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from enum import Enum
from typing import Optional, Tuple


class Mode(str, Enum):
    """Recognition mode (reference backend/config.py:54).

    fast     — keyframe scanner (VSF-equivalent Pallas kernel) + mobile models
    auto     — keyframe scanner + server models on accelerator, mobile on CPU
    accurate — per-frame DB detection + span segmentation (reference
               backend/main.py:255-376)
    """

    AUTO = "auto"
    FAST = "fast"
    ACCURATE = "accurate"


class Decoder(str, Enum):
    """Video decode backend for the keyframe scanner (reference
    backend/tools/constant.py VideoSubFinderDecoder)."""

    OPENCV = "opencv"
    FFMPEG = "ffmpeg"


# The 87 subtitle languages supported by the reference
# (reference backend/interface/en.ini:79-166).
LANGUAGES: Tuple[str, ...] = (
    "ch", "en", "korean", "japan", "chinese_cht", "ta", "te", "ka",
    "latin", "arabic", "cyrillic", "devanagari",
    "af", "az", "bs", "cs", "cy", "da", "de", "es", "et", "fr", "ga",
    "hr", "hu", "id", "is", "it", "ku", "la", "lt", "lv", "mi", "ms",
    "mt", "nl", "no", "oc", "pi", "pl", "pt", "ro", "rs_latin", "sk",
    "sl", "sq", "sv", "sw", "tl", "tr", "uz", "vi", "french", "german",
    "ar", "fa", "ug", "ur", "ru", "rs_cyrillic", "be", "bg", "uk", "mn",
    "abq", "ady", "kbd", "ava", "dar", "inh", "che", "lbe", "lez", "tab",
    "hi", "mr", "ne", "bh", "mai", "ang", "bho", "mah", "sck", "new",
    "gom", "sa", "bgc", "th", "el",
)


@dataclass(frozen=True)
class VseConfig:
    """All pipeline knobs; names and defaults track the reference
    (reference backend/config.py:50-98)."""

    # Subtitle language (reference backend/config.py:52)
    language: str = "ch"
    # Recognition mode (reference backend/config.py:54)
    mode: Mode = Mode.FAST
    # Emit a .txt transcript next to the .srt (reference backend/config.py:56)
    generate_txt: bool = False
    # Text boxes recognized per rec batch (reference backend/config.py:58)
    rec_batch_number: int = 6
    # Frames per det batch (reference backend/config.py:60)
    max_batch_size: int = 10
    # Frames sampled per second of video in fps mode (reference backend/config.py:64)
    extract_frequency: int = 3
    # Coordinate-similarity tolerances for watermark unification
    # (reference backend/config.py:66-68)
    tolerant_pixel_y: int = 50
    tolerant_pixel_x: int = 100
    # Scene-text filter band expansion (reference backend/config.py:70)
    subtitle_area_deviation_pixel: int = 50
    # Top-N candidate watermark areas (reference backend/config.py:71)
    watermark_area_num: int = 5
    # Dedup similarity threshold, percent (reference backend/config.py:76)
    threshold_text_similarity: int = 80
    # Drop OCR lines below this confidence, percent (reference backend/config.py:78)
    drop_score: int = 75
    # Allowed box overflow outside the subtitle area, fraction
    # (reference backend/config.py:80)
    subtitle_area_deviation_rate: float = 0.0
    # Debug switches (reference backend/config.py:82-85)
    debug_ocr_loss: bool = False
    debug_no_delete_cache: bool = False
    # Keep/drop keyframe-timeline cues with no recognized text
    # (reference backend/config.py:87)
    delete_empty_timestamp: bool = True
    # Re-segment words / punctuation fixes (reference backend/config.py:89)
    word_segmentation: bool = True
    # Use the TPU (vs CPU fallback) (reference backend/config.py:91)
    hardware_acceleration: bool = True
    # Output directory override; empty = next to the video
    # (reference backend/config.py:95)
    save_directory: str = ""
    # Keyframe scanner worker threads; 0 = auto (reference backend/config.py:96)
    scanner_cpu_cores: int = 0
    # Video decode backend for the keyframe scanner (reference backend/config.py:98)
    scanner_decoder: Decoder = Decoder.OPENCV
    # Default subtitle selection area as ratios "ymin,ymax,xmin,xmax"
    # (reference backend/config.py:49)
    subtitle_selection_areas: str = "0.78,0.99,0.05,0.95"

    # --- TPU-native knobs (no reference equivalent) ---
    # Frames per device batch in the streaming pipeline.
    frame_batch: int = 8
    # Compute dtype for model forward passes.
    compute_dtype: str = "bfloat16"
    # Max text boxes tracked per frame (static shapes for XLA).
    max_boxes_per_frame: int = 8
    # Recognizer input height/width buckets (PP-OCR v3 uses 48x320;
    # reference backend/tools/paddle_model_config.py:93-97).
    rec_image_height: int = 48
    rec_image_width: int = 320
    # DB postprocess knobs (PaddleOCR defaults: thresh .3, box_thresh .6,
    # unclip 1.6). db_pool: connected components run on a db_pool-x
    # max-pooled map (device fast path; 1 = exact full-res); db_sweeps:
    # label-propagation sweeps.
    db_thresh: float = 0.3
    db_box_thresh: float = 0.6
    db_unclip_ratio: float = 1.6
    # perspective-rectify oriented text quads before recognition (the
    # reference stack always does, via get_rotate_crop_image). Off by
    # default: subtitles are horizontal, and the gather-based resample costs
    # ~16x the axis-aligned matmul crop on TPU (measured 1140 -> 71 f/s).
    # Turn on for tilted scene text.
    rec_rectify: bool = False
    db_pool: int = 8
    db_sweeps: int = 2
    # Vertical expansion of det boxes BEFORE rec cropping, as a fraction of
    # box height per side. The DB shrink core is thin: reference-parity
    # unclip yields boxes that clip glyph caps/descenders (~h*1.25 of the
    # shrink core), which PaddleOCR's rec tolerates but heads trained on
    # full synthetic renders misread. Expansion applies only to the crop —
    # reported det boxes stay reference-parity. Set 0 for converted
    # PaddleOCR rec heads.
    rec_crop_expand_y: float = 0.45
    # Ink-tight rec re-crop: sample a provisional crop from the expanded
    # box, measure its vertical ink band (row gradient energy,
    # ops/image.py ink_rows), and re-crop the frame to ink + margin. The
    # generous expand_y above guarantees nothing is clipped; the tighten
    # pass recovers the glyph resolution the margins cost — without it
    # glyphs land at ~19 of 48 px and dot-diacritic scripts
    # (arabic/thai/devanagari/tamil/telugu) are unreadable by construction
    # (r5 measured: ar trained+evaled at that geometry floors at CER 0.21;
    # tight geometry targets ~40 px glyphs). Heads record their crop
    # geometry in vse_meta.json ("geometry": "tight1"); pre-tighten
    # checkpoints must retrain.
    rec_crop_tighten: bool = True
    rec_crop_tight_margin: float = 0.07
    # Detection input size bucket (H, W) — frames are letterboxed to this.
    # Mirrors PaddleOCR's det_limit_side_len=960 used by the reference: a
    # 1080p frame det-scans at 960x540 (padded to 960x576).
    det_image_height: int = 576
    det_image_width: int = 960

    def __post_init__(self):
        if isinstance(self.mode, str) and not isinstance(self.mode, Mode):
            object.__setattr__(self, "mode", Mode(self.mode))
        if isinstance(self.scanner_decoder, str) and not isinstance(
            self.scanner_decoder, Decoder
        ):
            object.__setattr__(self, "scanner_decoder", Decoder(self.scanner_decoder))
        if not 1 <= self.rec_batch_number <= 100:
            raise ValueError("rec_batch_number must be in [1, 100]")
        if not 1 <= self.max_batch_size <= 256:
            raise ValueError("max_batch_size must be in [1, 256]")
        if not 1 <= self.extract_frequency <= 60:
            raise ValueError("extract_frequency must be in [1, 60]")
        if not 0 <= self.threshold_text_similarity <= 100:
            raise ValueError("threshold_text_similarity must be in [0, 100]")
        if not 0 <= self.drop_score <= 100:
            raise ValueError("drop_score must be in [0, 100]")

    def replace(self, **kw) -> "VseConfig":
        return dataclasses.replace(self, **kw)

    # --- reference config.json interop -------------------------------------
    # Mapping from the reference's config/config.json "Main" keys
    # (reference backend/config.py:50-98) to our field names.
    _JSON_KEYS = {
        "Language": "language",
        "Mode": "mode",
        "GenerateTxt": "generate_txt",
        "RecBatchNumber": "rec_batch_number",
        "MaxBatchSize": "max_batch_size",
        "ExtractFrequency": "extract_frequency",
        "TolerantPixelY": "tolerant_pixel_y",
        "TolerantPixelX": "tolerant_pixel_x",
        "SubtitleAreaDeviationPixel": "subtitle_area_deviation_pixel",
        "WaterarkAreaNum": "watermark_area_num",  # sic — reference typo kept
        "ThresholdTextSimilarity": "threshold_text_similarity",
        "DropScore": "drop_score",
        "SubtitleAreaDeviationRate": "subtitle_area_deviation_rate",
        "DebugOcrLoss": "debug_ocr_loss",
        "DebugNoDeleteCache": "debug_no_delete_cache",
        "DeleteEmptyTimeStamp": "delete_empty_timestamp",
        "WordSegmentation": "word_segmentation",
        "HardwareAcceleration": "hardware_acceleration",
        "SaveDirectory": "save_directory",
        "VideoSubFinderCpuCores": "scanner_cpu_cores",
        "VideoSubFinderDecoder": "scanner_decoder",
        "SubtitleSelectionAreas": "subtitle_selection_areas",
    }

    @classmethod
    def from_json(cls, path_or_dict) -> "VseConfig":
        """Load from a reference-format config.json ({"Main": {...}})."""
        if isinstance(path_or_dict, (str, os.PathLike)):
            with open(path_or_dict, "r", encoding="utf-8") as f:
                data = json.load(f)
        else:
            data = path_or_dict
        main = data.get("Main", data)
        kw = {}
        for jkey, fname in cls._JSON_KEYS.items():
            if jkey in main:
                v = main[jkey]
                if fname == "scanner_decoder" and isinstance(v, str):
                    v = Decoder(v.lower().replace("videosubfinderdecoder.", ""))
                kw[fname] = v
        return cls(**kw)

    def to_json(self) -> dict:
        main = {}
        for jkey, fname in self._JSON_KEYS.items():
            v = getattr(self, fname)
            if isinstance(v, Enum):
                v = v.value
            main[jkey] = v
        return {"Main": main}


def default_config() -> VseConfig:
    return VseConfig()
