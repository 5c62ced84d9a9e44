"""Parameter-scan experiment generators.

Ports of the reference's scan runners: the controlled transfer_top_k scan
(reference: exp_cee_sd_controlled_topk_scan.py) and the 9x9 CUHLM
threshold grid (reference: exp_cee_cuhlm_threshold_scan.py). Each returns
ExpConfig lists for orchestrate.run_experiments.
"""

from __future__ import annotations

from typing import List, Optional

from duodecoding_tpu.orchestrate.exp_runner import ExpConfig

TOPK_SCAN_VALUES = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024]
THRESHOLD_GRID = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]


def cee_sd_topk_scan(
    *,
    task: str = "mt_bench",
    little_model: str = "vicuna-68m",
    draft_model: str = "tiny-llama-1.1b",
    target_model: str = "llama-2-13b",
    topk_values: Optional[List[int]] = None,
    **common,
) -> List[ExpConfig]:
    """Controlled transfer_top_k sweep of adaptive_tridecoding."""
    return [
        ExpConfig(
            eval_mode="adaptive_tridecoding",
            task=task,
            little_model=little_model,
            draft_model=draft_model,
            target_model=target_model,
            transfer_top_k=k,
            exp_name=f"exp/topk_scan/k{k}",
            **common,
        )
        for k in (topk_values or TOPK_SCAN_VALUES)
    ]


def cee_cuhlm_threshold_scan(
    *,
    task: str = "mt_bench",
    little_model: str = "vicuna-68m",
    draft_model: str = "tiny-llama-1.1b",
    target_model: str = "llama-2-13b",
    grid: Optional[List[float]] = None,
    **common,
) -> List[ExpConfig]:
    """9x9 (little_threshold x draft_threshold) grid over cee_cuhlm."""
    grid = grid or THRESHOLD_GRID
    configs = []
    for lt in grid:
        for dt in grid:
            configs.append(
                ExpConfig(
                    eval_mode="cee_cuhlm",
                    task=task,
                    little_model=little_model,
                    draft_model=draft_model,
                    target_model=target_model,
                    exp_name=f"exp/cuhlm_scan/l{lt}_d{dt}",
                    extra_args=(
                        "--small_draft_threshold", str(lt),
                        "--draft_target_threshold", str(dt),
                    ),
                    **common,
                )
            )
    return configs
