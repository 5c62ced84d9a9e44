"""Engine: owns the model tiers and dispatches decoding modes.

Replaces the reference's ``Decoding``/``Baselines`` god-classes
(reference: src/engine.py:78, src/baselines.py:227) with a small facade:
tiers are (config, params) pairs, modes are registered functions over the
engine (engine/registry.py), and each mode returns
``(token_ids, DecodingMetrics)`` exactly like the reference contract
(src/baselines.py mode signatures, §SURVEY 2.3).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine import modes as _modes  # noqa: F401 — registers modes
from duodecoding_tpu.engine.registry import (
    SuiteFallback,
    get_decoding_mode,
    get_suite_runner,
)
from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import init_cache


@dataclasses.dataclass
class Tier:
    """One model tier (little / draft / target)."""

    cfg: ModelConfig
    params: Any

    @property
    def vocab_size(self) -> int:
        return self.cfg.vocab_size


@dataclasses.dataclass
class EngineConfig:
    """Unified typed run configuration (replaces the reference's ~50-flag
    argparse monolith, src/utils.py:248-647 — the subset that shapes
    decoding; eval-harness flags live with the harness)."""

    max_tokens: int = 128
    gamma: int = 4
    gamma1: int = 4
    gamma2: int = 4
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 0.0
    transfer_top_k: Optional[int] = 300
    edge_cloud_bandwidth: float = 23.6  # Mbps
    edge_end_bandwidth: float = 563.0  # Mbps
    cloud_end_bandwidth: float = float("inf")
    ntt_ms_edge_cloud: float = 10.0
    ntt_ms_edge_end: float = 0.0
    use_stochastic_comm: bool = False
    use_precise_comm_sim: bool = False
    batch_delay: float = 0.0
    max_seq_len: int = 2048
    seed: int = 1234
    eos_ids: tuple[int, ...] = ()
    param_dtype: Any = jnp.bfloat16
    cache_dtype: Any = jnp.bfloat16
    int8_kv_target: bool = False  # INT8 KV cache on the target tier
    uncertainty_threshold: float = 0.8


class Engine:
    def __init__(
        self,
        target: Tier,
        draft: Optional[Tier] = None,
        little: Optional[Tier] = None,
        config: Optional[EngineConfig] = None,
    ):
        self.target = target
        self.draft = draft
        self.little = little
        self.config = config or EngineConfig()
        tiers = [t for t in (target, draft, little) if t is not None]
        # shared verification vocab (reference slices to the min vocab,
        # src/decoding_ops.py:363)
        self.vocab_size = min(t.vocab_size for t in tiers)
        self._key = jax.random.PRNGKey(self.config.seed)

    # -- helpers shared by modes ------------------------------------------
    def next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    @property
    def sampling(self) -> SamplingConfig:
        c = self.config
        return SamplingConfig(c.temperature, c.top_k, c.top_p)

    def new_cache(self, tier: Tier, batch: int = 1):
        if self.config.int8_kv_target and tier is self.target:
            from duodecoding_tpu.models.kv_quant import init_quant_cache

            return init_quant_cache(tier.cfg, batch, self.config.max_seq_len)
        return init_cache(
            tier.cfg, batch, self.config.max_seq_len, dtype=self.config.cache_dtype
        )

    def token_buffer(self, prefix: np.ndarray) -> tuple[jax.Array, int]:
        prefix = np.asarray(prefix)
        if prefix.ndim == 1:
            prefix = prefix[None, :]
        B, L = prefix.shape
        if B != 1:
            raise NotImplementedError(
                "modes follow the reference's batch-1 contract; continuous "
                "batching is provided by the serving layer"
            )
        S = self.config.max_seq_len
        if L + self.config.max_tokens + max(
            self.config.gamma, self.config.gamma1 + self.config.gamma2
        ) + 2 > S:
            raise ValueError(
                f"prompt ({L}) + max_tokens ({self.config.max_tokens}) "
                f"exceeds max_seq_len ({S})"
            )
        buf = jnp.zeros((B, S), jnp.int32)
        buf = buf.at[:, :L].set(jnp.asarray(prefix, jnp.int32))
        return buf, L

    def run(self, mode: str, prefix: np.ndarray, **kw):
        """Run a decoding mode. Returns (token_ids [1, n], DecodingMetrics)."""
        fn = get_decoding_mode(mode)
        return fn(self, prefix, **kw)

    def suite_buffer(self, prompts: np.ndarray) -> tuple[jax.Array, int]:
        """[P, L] equal-length prompts -> ([P, 1, S] token buffers, L)."""
        prompts = np.asarray(prompts)
        P, L = prompts.shape
        self.token_buffer(prompts[0][None, :])  # shared length checks
        S = self.config.max_seq_len
        buf = jnp.zeros((P, 1, S), jnp.int32)
        return buf.at[:, 0, :L].set(jnp.asarray(prompts, jnp.int32)), L

    def run_suite(self, mode: str, prompts: np.ndarray, **kw):
        """Run ``mode`` over a stack of EQUAL-LENGTH prompts ``[P, L]``.

        When the mode registers a suite runner (registry.register_suite)
        the whole set runs as ONE device program (lax.scan over prompts)
        — on the remote backend each dispatch carries an ~90 ms
        launch/completion floor (tools/fixed_cost_probe.py), so a fused
        suite pays it once instead of once per prompt. Other modes fall
        back to sequential run(). Returns a list of (tokens, metrics) per
        prompt; fused runs attribute the measured suite wall to prompts
        by loop-iteration share (documented in each metrics dict).

        RNG-stream note: fused runners split ONE engine key across the
        prompt scan, while sequential run() draws ``next_key()`` per run
        — at temperature>0 the two paths sample different streams, so
        suite-vs-sequential parity is contractual only for GREEDY
        decoding (what the losslessness tests pin)."""
        prompts = np.asarray(prompts)
        runner = get_suite_runner(mode)
        if runner is not None and prompts.ndim == 2:
            try:
                return runner(self, prompts, **kw)
            except SuiteFallback:
                pass  # e.g. dynamic-width tree specs: sequential fallback
        return [
            self.run(mode, prompts[i][None, :], **kw)
            for i in range(prompts.shape[0])
        ]


class Stopwatch:
    """Wall-clock region timer; callers block on device results inside."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def block(*arrays):
    """Block until device arrays are ready (timing boundary).

    ``block_until_ready`` has been observed to return EARLY for
    device-resident while-loop programs on the remote TPU backend (it made
    one mode's benchmark wall undercount by ~2x), so the barrier is a real
    host transfer of the LAST array — all outputs of an XLA executable
    materialise together, so fetching one waits for the whole program.
    One fetch only: each extra host round-trip costs ~27 ms on the remote
    backend, so the per-array block_until_ready loop was pure overhead.

    REQUIREMENT: all ``arrays`` must be outputs of the SAME executable (one
    jitted program) — fetching the last one then implies the rest are
    materialised. Passing arrays from different executables would silently
    undercount timing; every current caller passes one program's outputs."""
    if arrays:
        jax.device_get(arrays[-1])
