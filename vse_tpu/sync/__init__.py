"""Audio-correlation subtitle re-timer ("Timeline Sync").

TPU-native rebuild of the reference's bundled sushi tool (reference
backend/sushi/): shift an existing SRT/ASS script from one cut of a video to
another by matching per-group audio fingerprints. See vse_tpu/sync/engine.py
for the algorithm and vse_tpu/sync/cli.py for the CLI (same flag surface as
reference backend/sushi/__main__.py:47-123).
"""

from vse_tpu.sync.common import SyncError
from vse_tpu.sync.runner import run

__all__ = ["run", "SyncError"]
