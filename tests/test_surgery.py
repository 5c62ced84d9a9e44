"""Model surgery: layer-sliced drafts, residual scaling, direct INT4 init."""

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.models import forward, init_cache, init_random_params, resolve_config
from duodecoding_tpu.models.quant import quantize_params
from duodecoding_tpu.models.surgery import (
    init_random_quant_params,
    param_bytes,
    scale_residual,
    truncate_model,
)

CFG = resolve_config("test-tiny")


def _argmax_agree(cfg_a, pa, cfg_b, pb, tokens):
    ca = init_cache(cfg_a, 1, tokens.shape[1], jnp.float32)
    cb = init_cache(cfg_b, 1, tokens.shape[1], jnp.float32)
    la, _ = forward(pa, cfg_a, tokens, ca)
    lb, _ = forward(pb, cfg_b, tokens, cb)
    return float(
        jnp.mean((jnp.argmax(la, -1) == jnp.argmax(lb, -1)).astype(jnp.float32))
    )


def test_truncate_shapes_and_share():
    params = init_random_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    dcfg, dparams = truncate_model(CFG, params, 2)
    assert dcfg.num_layers == 2
    assert dparams["layers"]["wq"].shape[0] == 2
    # embedding shared (same values)
    np.testing.assert_array_equal(
        np.asarray(dparams["embed"]), np.asarray(params["embed"])
    )
    # runs
    toks = jnp.ones((1, 4), jnp.int32)
    cache = init_cache(dcfg, 1, 8, jnp.float32)
    logits, _ = forward(dparams, dcfg, toks, cache)
    assert logits.shape[-1] == CFG.vocab_size


def test_residual_scale_drives_agreement():
    """As the residual scale shrinks, a layer-sliced draft agrees more
    with the full target (the calibration knob is monotone-ish)."""
    deep = resolve_config("test-tiny-deep")
    params = init_random_params(deep, jax.random.PRNGKey(0), jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 1, deep.vocab_size)
    agrees = {}
    for alpha in (1.0, 0.002):
        tp = scale_residual(params, alpha)
        dcfg, dp = truncate_model(deep, tp, 1)
        agrees[alpha] = _argmax_agree(deep, tp, dcfg, dp, toks)
    assert agrees[0.002] > agrees[1.0]
    assert agrees[0.002] > 0.6  # near-identity layers => slice ~= target


def test_residual_scale_quantized_equivalence():
    params = init_random_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    q = quantize_params(params, group_size=16)
    qs = scale_residual(q, 0.5)
    # scaling affine == scaling dequantized weight
    from duodecoding_tpu.models.quant import dequantize_int4

    w = dequantize_int4(q["layers"]["wo"], jnp.float32)
    ws = dequantize_int4(qs["layers"]["wo"], jnp.float32)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(w) * 0.5, rtol=1e-5)


def test_init_random_quant_runs_and_sizes():
    qp = init_random_quant_params(CFG, jax.random.PRNGKey(0), group_size=16)
    toks = jnp.ones((1, 4), jnp.int32)
    cache = init_cache(CFG, 1, 8, jnp.bfloat16)
    logits, _ = forward(qp, CFG, toks, cache)
    assert logits.shape == (1, 4, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
    # packed weights are ~4.25 bits/weight vs 16 dense
    dense = init_random_params(CFG, jax.random.PRNGKey(0), jnp.bfloat16)
    assert param_bytes(qp) < param_bytes(dense)


def test_quant_init_scale_sane():
    """Dequantized random-INT4 weights have ~fan_in^-0.5 std."""
    from duodecoding_tpu.models.quant import dequantize_int4

    qp = init_random_quant_params(CFG, jax.random.PRNGKey(0), group_size=16)
    w = np.asarray(dequantize_int4(qp["layers"]["wq"], jnp.float32))
    K = w.shape[1]
    std = w.std()
    assert 0.5 * K**-0.5 < std < 2.0 * K**-0.5
