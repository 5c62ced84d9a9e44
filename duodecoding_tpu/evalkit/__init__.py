from duodecoding_tpu.evalkit.dumper import MetricsAccumulator
from duodecoding_tpu.evalkit.base import EvalTask, get_task
from duodecoding_tpu.evalkit import tasks  # noqa: F401 — registers tasks

__all__ = ["MetricsAccumulator", "EvalTask", "get_task"]
