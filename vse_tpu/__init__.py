"""vse_tpu — TPU-native hard-subtitle extraction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
video-subtitle-extractor (reference: /root/reference): burned-in subtitle
extraction from video (keyframe detection, DB text detection, CRNN/CTC text
recognition, watermark & scene-text filtering, dedup, SRT/TXT generation)
plus a sushi-style audio-correlation subtitle re-timer.

Design stance (SURVEY.md §7): the reference glues CPU decode, CPU/GPU OCR and
an external C++ scanner together with processes/queues/file-IPC. On TPU we
invert that: one Python driver, one device-resident compiled pipeline
(crop -> detect -> recognize never leaves HBM), host code only for video
demux/decode and text post-processing.
"""

__version__ = "0.1.0"

from vse_tpu.core.config import VseConfig, default_config
from vse_tpu.core.subtitle_area import SubtitleArea

__all__ = ["VseConfig", "default_config", "SubtitleArea", "__version__"]
