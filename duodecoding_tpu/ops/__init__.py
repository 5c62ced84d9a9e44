from duodecoding_tpu.ops.sampling import (
    max_fn,
    norm_logits,
    rebuild_topk_uniform_probs,
    sample,
    top_k_top_p_filter,
)
from duodecoding_tpu.ops.verify import (
    AcceptanceResult,
    RollbackPlan,
    build_rollback_plan,
    compute_acceptance,
    compute_residual_distribution,
    gather_token_probs,
)

__all__ = [
    "max_fn",
    "norm_logits",
    "rebuild_topk_uniform_probs",
    "sample",
    "top_k_top_p_filter",
    "AcceptanceResult",
    "RollbackPlan",
    "build_rollback_plan",
    "compute_acceptance",
    "compute_residual_distribution",
    "gather_token_probs",
]
