from duodecoding_tpu.evalkit.dumper import MetricsAccumulator
from duodecoding_tpu.evalkit.base import EvalTask, get_task
from duodecoding_tpu.evalkit import tasks  # noqa: F401 — registers tasks
from duodecoding_tpu.evalkit import judge  # noqa: F401 — registers mt_bench_judge

__all__ = ["MetricsAccumulator", "EvalTask", "get_task"]
