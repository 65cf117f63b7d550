from vse_tpu.core.config import VseConfig, default_config
from vse_tpu.core.subtitle_area import SubtitleArea
from vse_tpu.core.accelerator import Accelerator

__all__ = ["VseConfig", "default_config", "SubtitleArea", "Accelerator"]
