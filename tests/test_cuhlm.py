"""CUHLM mode: gating behavior, device k* parity with the numpy search,
and comm accounting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.comm.cuhlm import (
    compressed_vocab_size_for_uncertainty,
    compressed_vocab_size_jax,
)
from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.models import init_random_params, resolve_config

PROMPT = np.array([[5, 9, 2, 14, 27, 3, 11]], dtype=np.int32)


def _make_engine(threshold):
    d_cfg = resolve_config("test-tiny")
    t_cfg = resolve_config("test-tiny-deep")
    d = Tier(d_cfg, init_random_params(d_cfg, jax.random.PRNGKey(3), jnp.float32))
    t = Tier(t_cfg, init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32))
    cfg = EngineConfig(
        max_tokens=12,
        max_seq_len=128,
        uncertainty_threshold=threshold,
        param_dtype=jnp.float32,
        cache_dtype=jnp.float32,
    )
    return Engine(target=t, draft=d, config=cfg)


@pytest.mark.parametrize("unc", [0.3, 0.85, 1.0])
def test_device_kstar_matches_numpy(unc):
    rng = np.random.default_rng(0)
    logits = rng.normal(scale=3.0, size=160).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum()
    k_np = compressed_vocab_size_for_uncertainty(unc, probs)
    k_jax = int(compressed_vocab_size_jax(jnp.float32(unc), jnp.array(probs)))
    assert k_np == k_jax


def test_cuhlm_runs_and_accounts(tmp_path):
    engine = _make_engine(0.8)
    out, m = engine.run("uncertainty_decoding", PROMPT)
    assert m["generated_tokens"] >= 12
    assert m["loop_times"] == m["draft_forward_times"]
    assert m["target_forward_times"] <= m["loop_times"]
    assert m["edge_cloud_data_bytes"] > 0
    assert m["throughput"] > 0
    # uncertainty history recorded per step
    assert len(m["draft_entropy_history"]) == m["loop_times"]


def test_cuhlm_threshold_zero_always_verifies():
    # threshold 0: uncertainty >= 0 always -> no opportunistic accepts
    engine = _make_engine(0.0)
    out, m = engine.run("uncertainty_decoding", PROMPT)
    # every loop counted as a target forward (quirk only skips after opp)
    assert m["target_forward_times"] == m["loop_times"]


def test_cuhlm_threshold_two_never_verifies():
    # threshold 2: uncertainty <= 1 < 2 -> all opportunistic
    engine = _make_engine(2.0)
    out, m = engine.run("uncertainty_decoding", PROMPT)
    assert m["draft_accepted_tokens"] == 0  # verified accepts only
    # after the first iteration every target forward is skipped by the quirk
    assert m["target_forward_times"] == 1
    # opportunistic path emits 2 tokens per iteration
    assert m["generated_tokens"] == 2 * m["loop_times"]
