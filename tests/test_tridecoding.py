"""Tridecoding mode: losslessness vs target-AR at temp 0, staged counters,
and per-link comm accounting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.models import init_random_params, resolve_config

PROMPT = np.array([[5, 9, 2, 14, 27, 3, 11, 8, 19, 4, 22, 31]], dtype=np.int32)


@pytest.fixture(scope="module")
def engine():
    l_cfg = resolve_config("test-tiny")
    d_cfg = resolve_config("test-tiny")
    t_cfg = resolve_config("test-tiny-deep")
    little = Tier(l_cfg, init_random_params(l_cfg, jax.random.PRNGKey(1), jnp.float32))
    draft = Tier(d_cfg, init_random_params(d_cfg, jax.random.PRNGKey(3), jnp.float32))
    target = Tier(t_cfg, init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32))
    cfg = EngineConfig(
        max_tokens=16,
        gamma1=3,
        gamma2=2,
        max_seq_len=128,
        edge_cloud_bandwidth=23.6,
        edge_end_bandwidth=563.0,
        ntt_ms_edge_cloud=10,
        ntt_ms_edge_end=1,
        param_dtype=jnp.float32,
        cache_dtype=jnp.float32,
    )
    return Engine(target=target, draft=draft, little=little, config=cfg)


def test_tridecoding_lossless_vs_target_ar(engine):
    out_ar, _ = engine.run("large", PROMPT)
    out_tri, m = engine.run("tridecoding", PROMPT, transfer_top_k=32)
    n = min(out_ar.shape[1], out_tri.shape[1])
    np.testing.assert_array_equal(out_tri[0, :n], out_ar[0, :n])
    assert m["generated_tokens"] >= 16


def test_tridecoding_counters(engine):
    out, m = engine.run("tridecoding", PROMPT, transfer_top_k=32)
    iters = m["loop_times"]
    assert iters >= 1
    assert m["target_forward_times"] == iters
    # little drafts gamma2 per iteration
    assert m["little_forward_times"] == iters * engine.config.gamma2
    # draft: gamma1 drafts + 1 stage-1 verify per iteration
    assert m["draft_forward_times"] == iters * (engine.config.gamma1 + 1)
    assert m["little_accepted_tokens"] <= m["little_generated_tokens"]
    assert m["draft_accepted_tokens"] <= m["draft_generated_tokens"]
    # stage-2 window carries stage-1 output: total >= gamma1 + 1 per iter
    assert m["draft_generated_tokens"] >= iters * (engine.config.gamma1 + 1)


def test_tridecoding_comm_both_links(engine):
    out, m = engine.run("tridecoding", PROMPT, transfer_top_k=32)
    assert m["edge_cloud_data_bytes"] > 0
    assert m["edge_end_data_bytes"] > 0
    assert m["edge_end_comm_time"] > 0
    assert m["communication_time"] > m["edge_end_comm_time"]
    assert m["wall_time"] >= m["communication_time"]
    assert m["throughput"] == pytest.approx(
        m["generated_tokens"] / m["wall_time"]
    )
    # per-iteration: at least 6 edge_end transfers and 4 edge_cloud
    assert m["connect_times"]["edge_end"] >= 1 + 4 * m["loop_times"]
    assert m["connect_times"]["edge_cloud"] >= 4 * m["loop_times"]


def test_tridecoding_rejects_short_prompt(engine):
    with pytest.raises(ValueError):
        engine.run("tridecoding", PROMPT[:, :4], transfer_top_k=32)
