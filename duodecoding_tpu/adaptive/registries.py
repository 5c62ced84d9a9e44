"""Checkpoint registries for ARP heads and RL agents.

Port of the reference's registry pair (reference: src/acc_head_registry.py,
src/rl_agent_registry.py): checkpoints are resolved by the directed model
pair ``<source>--to--<target>`` (alias-canonicalized), ARP heads through an
optional JSON registry file, RL agents through the fixed layout
``<root>/rl_agents/<role>/<pair>/{latest,best}.pkl``. The reference had an
API drift between positional-eval_mode and role-first signatures (SURVEY
§2.1); this port standardizes on the role-first keyword API.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

_ALIAS = {
    "vicuna-68m": "vicuna-68m",
    "llama-68m": "llama-68m",
    "tinyllama": "tiny-llama-1.1b",
    "tiny-llama-1.1b": "tiny-llama-1.1b",
    "llama-2-13b": "llama-2-13b",
    "llama2-13b": "llama-2-13b",
    "qwen15-0.5b": "qwen1.5-0.5b",
    "qwen15-1.8b": "qwen1.5-1.8b",
    "qwen15-7b": "qwen1.5-7b",
}

LITTLE_THRESHOLDS = [0.1, 0.2, 0.4, 0.6, 0.8, 0.9, 0.95, 0.99]
MAIN_THRESHOLDS = [0.1, 0.2, 0.4, 0.6, 0.8, 0.9, 0.95, 0.99]


def canonical(name: str) -> str:
    key = name.lower().rstrip("/").split("/")[-1]
    return _ALIAS.get(key, key)


def pair_key(source: str, target: str) -> str:
    """Directed pair naming (reference src/acc_head_registry.py:100)."""
    return f"{canonical(source)}--to--{canonical(target)}"


def resolve_acc_head_path(
    source: str,
    target: str,
    registry_path: str = "checkpoints/acc_head_registry.json",
    root: str = "checkpoints/acc_heads",
) -> Optional[str]:
    """JSON registry first (pair -> path), else conventional layout
    ``<root>/<pair>/head.pkl`` if present."""
    key = pair_key(source, target)
    if os.path.exists(registry_path):
        with open(registry_path) as f:
            reg = json.load(f)
        if key in reg:
            return reg[key]
    conventional = os.path.join(root, key, "head.pkl")
    if os.path.exists(conventional):
        return conventional
    return None


def register_acc_head(
    source: str,
    target: str,
    path: str,
    registry_path: str = "checkpoints/acc_head_registry.json",
) -> None:
    reg = {}
    if os.path.exists(registry_path):
        with open(registry_path) as f:
            reg = json.load(f)
    reg[pair_key(source, target)] = path
    os.makedirs(os.path.dirname(registry_path) or ".", exist_ok=True)
    with open(registry_path, "w") as f:
        json.dump(reg, f, indent=2, sort_keys=True)


@dataclasses.dataclass
class RLAgentSpec:
    role: str  # "main" | "little"
    pair: str
    latest_path: str
    best_path: str
    threshold_candidates: list


def get_rl_agent_spec(
    *,
    role: str,
    source: str,
    target: str,
    root: str = "checkpoints",
) -> RLAgentSpec:
    """Role-first keyword API (the reference's post-migration signature,
    src/rl_agent_registry.py:143-183)."""
    if role not in ("main", "little"):
        raise ValueError(f"unknown RL role {role!r}")
    pair = pair_key(source, target)
    base = os.path.join(root, "rl_agents", role, pair)
    return RLAgentSpec(
        role=role,
        pair=pair,
        latest_path=os.path.join(base, "latest.pkl"),
        best_path=os.path.join(base, "best.pkl"),
        threshold_candidates=(
            LITTLE_THRESHOLDS if role == "little" else MAIN_THRESHOLDS
        ),
    )
