"""RL environment: choose (draft quantization level, gamma) vs bandwidth.

Port of the reference's prototype quantization-selection RL environment
(reference: src/quantize/src/train.py:8 — a gym Env whose action picks the
draft quant level and gamma given the observed bandwidth state). Gym-free:
the same step/reset API as a plain class so it composes with the DDQN
agent in adaptive/rl.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

QUANT_LEVELS = ["int4", "int8", "bf16"]
GAMMA_CHOICES = [2, 4, 6, 8]
# (relative draft quality, relative draft cost) per quant level
_QUALITY = {"int4": 0.92, "int8": 0.98, "bf16": 1.0}
_COST = {"int4": 0.3, "int8": 0.55, "bf16": 1.0}


class QuantizeSpecDecEnv:
    """State: [bandwidth_mbps / 100]. Action: quant level x gamma. Reward:
    modeled tokens/s of an SD step under the chosen config."""

    action_dim = len(QUANT_LEVELS) * len(GAMMA_CHOICES)
    observation_dim = 1

    def __init__(
        self,
        base_accept: float = 0.8,
        draft_ms: float = 1.0,
        target_ms: float = 4.0,
        prob_row_bytes: float = 32000 * 4,
        seed: int = 0,
    ):
        self.base_accept = base_accept
        self.draft_ms = draft_ms
        self.target_ms = target_ms
        self.prob_row_bytes = prob_row_bytes
        self._rng = np.random.default_rng(seed)
        self.bandwidth_mbps = 25.0

    def reset(self) -> np.ndarray:
        self.bandwidth_mbps = float(self._rng.uniform(5.0, 100.0))
        return self._obs()

    def _obs(self) -> np.ndarray:
        return np.array([self.bandwidth_mbps / 100.0], np.float32)

    def decode_action(self, action: int) -> Tuple[str, int]:
        return (
            QUANT_LEVELS[action // len(GAMMA_CHOICES)],
            GAMMA_CHOICES[action % len(GAMMA_CHOICES)],
        )

    def step(self, action: int):
        quant, gamma = self.decode_action(action)
        accept = self.base_accept * _QUALITY[quant]
        expected_tokens = sum(accept**i for i in range(1, gamma + 1)) + 1
        compute_s = (gamma * self.draft_ms * _COST[quant] + self.target_ms) / 1e3
        reject_prob = 1.0 - accept**gamma
        comm_s = reject_prob * self.prob_row_bytes / (
            self.bandwidth_mbps * 1e6 / 8
        )
        reward = expected_tokens / (compute_s + comm_s)
        # bandwidth drifts between steps
        self.bandwidth_mbps = float(
            np.clip(self.bandwidth_mbps * self._rng.uniform(0.8, 1.25), 5.0, 200.0)
        )
        return self._obs(), float(reward), False, {
            "quant": quant,
            "gamma": gamma,
            "expected_tokens": expected_tokens,
        }
