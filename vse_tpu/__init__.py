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

import os as _os

_env_platforms = _os.environ.get("JAX_PLATFORMS")
if _env_platforms:
    # Some environments register an accelerator PJRT plugin from
    # sitecustomize and pin the platform there, which silently overrides an
    # explicit `JAX_PLATFORMS=cpu vse ...` — a "CPU run" then grabs the real
    # chip (and collides with whatever owns it). Re-pin to what the user
    # asked for; no-op when the config already matches. Must run before the
    # first backend initialization, hence package import time.
    import jax as _jax

    if _jax.config.jax_platforms != _env_platforms:
        _jax.config.update("jax_platforms", _env_platforms)

from vse_tpu.core.config import VseConfig, default_config
from vse_tpu.core.subtitle_area import SubtitleArea

__all__ = ["VseConfig", "default_config", "SubtitleArea", "__version__"]
