"""Fused QKV / gate-up projection layouts (models/quant.py::fuse_params).

Fusion concatenates per-layer projections along the output axis so decode
forwards launch one matmul kernel where there were three (QKV) or two
(gate/up). It must be EXACT: per-(group, column) quantization affines and
per-column accumulation make fused outputs bitwise identical.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.models import init_random_params, resolve_config
from duodecoding_tpu.models.quant import (
    FUSED_GROUPS,
    fuse_params,
    quantize_params,
)
from duodecoding_tpu.models.transformer import forward, init_cache

CFG = resolve_config("test-tiny")
TOKENS = np.array([[3, 1, 4, 1, 5, 9, 2, 6]], dtype=np.int32)


def _logits(params, cfg=CFG, dtype=jnp.float32):
    cache = init_cache(cfg, 1, 32, dtype)
    logits, _ = forward(params, cfg, jnp.asarray(TOKENS), cache)
    return np.asarray(logits)


def test_fused_dense_forward_identical():
    params = init_random_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    fused = fuse_params(params)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    assert "w_gateup" in fused["layers"] and "w_up" not in fused["layers"]
    np.testing.assert_array_equal(_logits(fused), _logits(params))


def test_fused_quantized_forward_identical():
    params = init_random_params(CFG, jax.random.PRNGKey(1), jnp.float32)
    q = quantize_params(params, group_size=16)
    fused = fuse_params(q)
    qkv = fused["layers"]["wqkv"]
    # concatenated quantized leaves keep the layer axis and sum the N axes
    n_total = sum(
        q["layers"][p]["packed"].shape[-1] for p in FUSED_GROUPS["wqkv"]
    )
    assert qkv["packed"].shape[-1] == n_total
    np.testing.assert_array_equal(_logits(fused), _logits(q))


def test_fuse_is_exact_vs_quantize_of_concat():
    """quantize(concat) == concat(quantize) column-for-column."""
    from duodecoding_tpu.models.quant import dequantize_int4, quantize_int4

    key = jax.random.PRNGKey(2)
    w1 = jax.random.normal(key, (32, 24), jnp.float32)
    w2 = jax.random.normal(jax.random.fold_in(key, 1), (32, 8), jnp.float32)
    qa = quantize_int4(jnp.concatenate([w1, w2], axis=-1), group_size=16)
    q1, q2 = quantize_int4(w1, 16), quantize_int4(w2, 16)
    qb = {
        k: jnp.concatenate([q1[k], q2[k]], axis=-1)
        for k in ("packed", "scales", "zeros")
    }
    for k in qa:
        np.testing.assert_array_equal(np.asarray(qa[k]), np.asarray(qb[k]))
    np.testing.assert_array_equal(
        np.asarray(dequantize_int4(qa)), np.asarray(dequantize_int4(qb))
    )


def test_fused_engine_sd_lossless():
    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier

    t_cfg = resolve_config("test-tiny-deep")
    d_cfg = resolve_config("test-tiny")
    tp = init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32)
    dp = init_random_params(d_cfg, jax.random.PRNGKey(3), jnp.float32)
    ec = EngineConfig(
        max_tokens=16, gamma=3, max_seq_len=128,
        param_dtype=jnp.float32, cache_dtype=jnp.float32,
    )
    prompt = np.array([[5, 9, 2, 14, 27, 3, 11]], dtype=np.int32)
    plain = Engine(target=Tier(t_cfg, tp), draft=Tier(d_cfg, dp), config=ec)
    fused = Engine(
        target=Tier(t_cfg, fuse_params(tp)),
        draft=Tier(d_cfg, fuse_params(dp)),
        config=ec,
    )
    out_p, _ = plain.run("sd", prompt)
    out_f, _ = fused.run("sd", prompt)
    np.testing.assert_array_equal(out_f[0], out_p[0])


def test_fused_surgery_pipeline():
    """fuse -> scale_residual -> truncate composes (bench part A order)."""
    from duodecoding_tpu.models.surgery import scale_residual, truncate_model

    cfg = resolve_config("test-tiny-deep")
    params = quantize_params(
        init_random_params(cfg, jax.random.PRNGKey(5), jnp.float32),
        group_size=16,
    )
    fused = fuse_params(params)
    a = scale_residual(fused, 0.25)
    dcfg, dp = truncate_model(cfg, a, 1)
    assert dp["layers"]["wqkv"]["packed"].shape[0] == 1
    # residual scaling only touches wo/w_down — identical either order
    b = fuse_params(truncate_model(cfg, scale_residual(params, 0.25), 1)[1])
    for k in ("wqkv", "wo", "w_gateup", "w_down"):
        for leaf in ("packed", "scales", "zeros"):
            np.testing.assert_array_equal(
                np.asarray(dp["layers"][k][leaf]),
                np.asarray(b["layers"][k][leaf]),
            )


def test_shard_params_fused_quantized():
    """Partition specs adapt to fused + quantized pytrees."""
    import os

    from duodecoding_tpu.parallel import make_mesh, shard_params

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh(model_axis=2)
    cfg = resolve_config("test-tiny")
    params = fuse_params(
        quantize_params(
            init_random_params(cfg, jax.random.PRNGKey(0), jnp.float32),
            group_size=16,
        )
    )
    sp = shard_params(params, cfg, mesh)
    assert sp["layers"]["wqkv"]["packed"].sharding.spec[-1] == "model"
