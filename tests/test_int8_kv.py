"""INT8 KV cache: quantize/dequant roundtrip, forward closeness, engine use."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.models import forward, init_cache, init_random_params, resolve_config
from duodecoding_tpu.models.kv_quant import (
    dequantize_kv,
    init_quant_cache,
    quantize_kv,
)

CFG = resolve_config("test-tiny")
PROMPT = np.array([[5, 9, 2, 14, 27, 3, 11]], dtype=np.int32)


def test_kv_quant_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 16), jnp.float32)
    codes, scale = quantize_kv(x)
    assert codes.dtype == jnp.int8
    x2 = dequantize_kv(codes, scale, jnp.float32)
    rel = float(jnp.max(jnp.abs(x2 - x)) / jnp.max(jnp.abs(x)))
    assert rel < 0.02  # 8-bit symmetric: ~1/127 relative error


def test_forward_with_int8_cache_close_to_dense():
    params = init_random_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    tokens = jnp.array([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    dense_cache = init_cache(CFG, 1, 16, jnp.float32)
    q_cache = init_quant_cache(CFG, 1, 16)
    l_dense, dc = forward(params, CFG, tokens, dense_cache)
    l_q, qc = forward(params, CFG, tokens, q_cache)
    assert int(qc.length) == 8
    agree = float(
        jnp.mean((jnp.argmax(l_dense, -1) == jnp.argmax(l_q, -1)).astype(jnp.float32))
    )
    assert agree >= 0.75
    corr = np.corrcoef(np.asarray(l_dense).ravel(), np.asarray(l_q).ravel())[0, 1]
    assert corr > 0.99


def test_engine_int8_kv_target_runs_sd():
    t_cfg = resolve_config("test-tiny-deep")
    engine = Engine(
        target=Tier(t_cfg, init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32)),
        draft=Tier(CFG, init_random_params(CFG, jax.random.PRNGKey(3), jnp.float32)),
        config=EngineConfig(
            max_tokens=12, gamma=3, max_seq_len=128,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
            int8_kv_target=True,
        ),
    )
    out, m = engine.run("sd", PROMPT)
    assert m["generated_tokens"] == 12
    assert m["throughput"] > 0
