from vse_tpu.utils.metrics import StageTimer, Throughput
from vse_tpu.utils.tracing import trace_context

__all__ = ["StageTimer", "Throughput", "trace_context"]
