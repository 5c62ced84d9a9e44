from duodecoding_tpu.engine.metrics import DecodingMetrics, get_empty_metrics
from duodecoding_tpu.engine.registry import get_decoding_mode, register_mode

__all__ = [
    "DecodingMetrics",
    "get_empty_metrics",
    "get_decoding_mode",
    "register_mode",
]
