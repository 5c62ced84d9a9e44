from duodecoding_tpu.orchestrate.consistency import prefix_consistency
from duodecoding_tpu.orchestrate.exp_runner import ExpConfig, run_experiments

__all__ = ["ExpConfig", "run_experiments", "prefix_consistency"]
