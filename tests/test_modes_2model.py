"""End-to-end tests of the 2-model decoding modes through the Engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.engine.registry import registered_modes
from duodecoding_tpu.models import init_random_params, resolve_config

PROMPT = np.array([[5, 9, 2, 14, 27, 3, 11]], dtype=np.int32)


@pytest.fixture(scope="module")
def engine():
    d_cfg = resolve_config("test-tiny")
    t_cfg = resolve_config("test-tiny-deep")
    d = Tier(d_cfg, init_random_params(d_cfg, jax.random.PRNGKey(3), jnp.float32))
    t = Tier(t_cfg, init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32))
    cfg = EngineConfig(
        max_tokens=16,
        gamma=3,
        max_seq_len=128,
        edge_cloud_bandwidth=23.6,
        ntt_ms_edge_cloud=10,
        ntt_ms_edge_end=0,
        param_dtype=jnp.float32,
        cache_dtype=jnp.float32,
    )
    return Engine(target=t, draft=d, config=cfg)


def test_modes_registered(engine):
    for m in ("small", "large", "sd", "dist_spec", "dsd", "dist_split_spec", "dssd"):
        assert m in registered_modes()


def test_large_mode(engine):
    out, m = engine.run("large", PROMPT)
    assert out.shape[1] == PROMPT.shape[1] + 16
    assert m["generated_tokens"] == 16
    assert m["target_forward_times"] == 16
    assert m["throughput"] > 0


def test_sd_mode_lossless_vs_large(engine):
    out_ar, _ = engine.run("large", PROMPT)
    out_sd, m = engine.run("sd", PROMPT)
    np.testing.assert_array_equal(out_sd[0], out_ar[0])
    assert m["generated_tokens"] == 16
    assert m["draft_generated_tokens"] >= m["draft_accepted_tokens"]
    assert m["target_forward_times"] == m["loop_times"]
    assert m["communication_time"] == 0.0


def test_dist_spec_comm_accounting(engine):
    out, m = engine.run("dist_spec", PROMPT, transfer_top_k=16)
    assert m["generated_tokens"] == 16
    # prompt uplink happened
    assert m["connect_times"]["edge_cloud"] >= m["loop_times"]
    assert m["edge_cloud_data_bytes"] > 0
    assert m["communication_time"] > 0
    assert m["wall_time"] > m["communication_time"]
    assert m["avg_top_k"] == 16
    # compressed prob window: per non-degenerate iteration the prob payload
    # is k*4*g bytes, tokens 8B each — total bytes must be far below the
    # uncompressed g*V*4
    V = engine.vocab_size
    assert m["edge_cloud_data_bytes"] < m["loop_times"] * (3 * V * 4 + 4000)


def test_dist_spec_output_matches_sd(engine):
    # dist_spec differs from sd only in accounting at temp 0 with the same
    # rebuilt-top-k proposal
    out_sd, _ = engine.run("sd", PROMPT, transfer_top_k=16)
    out_dsd, _ = engine.run("dist_spec", PROMPT, transfer_top_k=16)
    np.testing.assert_array_equal(out_sd[0], out_dsd[0])


def test_dssd_uplink_is_small(engine):
    out, m = engine.run("dist_split_spec", PROMPT, transfer_top_k=16)
    assert m["generated_tokens"] == 16
    # DSSD uplink per iter = g*(8+4) bytes; downlink rows only on reject.
    # With V=128 f32 rows, even all-reject stays < V*4 + 50 per iter.
    per_iter = m["edge_cloud_data_bytes"] / m["loop_times"]
    assert per_iter < engine.vocab_size * 4 + 100


def test_sd_with_bandwidth_serial_accounting(engine):
    out, m = engine.run("speculative_decoding_with_bandwidth", PROMPT)
    assert m["generated_tokens"] == 16
    assert m["edge_cloud_data_bytes"] > 0
    assert m["wall_time"] >= m["communication_time"]


def test_throughput_definition(engine):
    out, m = engine.run("dist_spec", PROMPT, transfer_top_k=16)
    assert m["throughput"] == pytest.approx(
        m["generated_tokens"] / m["wall_time"]
    )


def test_dssd_int4_target_sliced_draft_lossless():
    """The dssd 7B-row construction (tools/dssd_rows.py): an INT4-quantized
    target with an INT8 KV cache and a layer-sliced draft cut from the SAME
    quantized pytree must run dist_split_spec greedily lossless vs its own
    AR output (reference regime: experiment_results_table.md rows 8-9)."""
    from duodecoding_tpu.models.quant import fuse_params
    from duodecoding_tpu.models.surgery import (
        init_random_quant_params, scale_residual, truncate_model,
    )

    cfg = resolve_config("test-tiny-deep")
    q = fuse_params(init_random_quant_params(cfg, jax.random.PRNGKey(0), 16))
    tp = scale_residual(q, 0.05)
    dcfg, dp = truncate_model(cfg, tp, 1)
    # the INT4 compute path emits bf16 activations, so the cache must be
    # bf16 too (the production bench/make_engine config)
    ec = EngineConfig(
        max_tokens=16, gamma=3, max_seq_len=128,
        edge_cloud_bandwidth=23.6, ntt_ms_edge_cloud=10, ntt_ms_edge_end=0,
        param_dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16,
        int8_kv_target=True,
    )
    eng = Engine(target=Tier(cfg, tp), draft=Tier(dcfg, dp), config=ec)
    out_ar, _ = eng.run("large", PROMPT)
    out, m = eng.run("dist_split_spec", PROMPT, transfer_top_k=64)
    np.testing.assert_array_equal(out[0], out_ar[0])
    assert m["generated_tokens"] == 16
    assert m["edge_cloud_data_bytes"] > 0
