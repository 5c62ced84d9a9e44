"""INT4 quantization + fused dequant-matmul kernel tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.models.quant import (
    dequantize_int4,
    int4_matmul_reference,
    is_quantized,
    quantize_int4,
    quantize_params,
)
from duodecoding_tpu.ops.pallas.int4_matmul import int4_matmul


def test_quantize_roundtrip_error_small():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128), jnp.float32)
    q = quantize_int4(w, group_size=64)
    assert q["packed"].shape == (128, 128)
    assert q["scales"].shape == (4, 128)
    w2 = dequantize_int4(q, dtype=jnp.float32)
    # 4-bit affine per 64-group: max error <= scale/2 ~ range/30
    err = jnp.abs(w2 - w)
    group_range = (
        jnp.max(w.reshape(4, 64, 128), 1) - jnp.min(w.reshape(4, 64, 128), 1)
    )
    assert float(jnp.max(err / jnp.repeat(group_range, 64, 0).reshape(4, 64, 128).reshape(256, 128))) < 0.05


def test_quantize_exact_at_code_points():
    # weights already at 4-bit lattice points reconstruct exactly
    codes = jax.random.randint(jax.random.PRNGKey(1), (128, 128), 0, 16)
    w = codes.astype(jnp.float32) * 0.5 - 4.0
    q = quantize_int4(w, group_size=128)
    w2 = dequantize_int4(q, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


@pytest.mark.parametrize("fused", [False, True])
def test_int4_matmul_interpret_matches_reference(fused):
    key = jax.random.PRNGKey(2)
    w = jax.random.normal(key, (256, 256), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 256), jnp.bfloat16)
    q = quantize_int4(w, group_size=64)
    ref = int4_matmul_reference(x, q)
    out = int4_matmul(x, q, interpret=True, fused=fused)
    # the fused kernel folds scales into bf16 codes: ~0.4% extra error on
    # top of int4's inherent quantization noise
    tol = 6e-2 if fused else 2e-2
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=tol, atol=tol
    )


def test_int4_matmul_3d_batch():
    w = jax.random.normal(jax.random.PRNGKey(4), (128, 128), jnp.float32) * 0.1
    q = quantize_int4(w, group_size=64)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 128), jnp.bfloat16)
    out = int4_matmul(x, q, interpret=True)
    assert out.shape == (2, 3, 128)
    ref = int4_matmul_reference(x, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=6e-2, atol=6e-2)


def test_quantize_params_structure():
    from duodecoding_tpu.models import init_random_params, resolve_config

    cfg = resolve_config("test-tiny")
    params = init_random_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qp = quantize_params(params, group_size=32)
    assert is_quantized(qp["layers"]["wq"])
    assert not is_quantized(qp["layers"]["attn_norm"])
    assert qp["embed"].dtype == jnp.float32
    # packed is ~1/8 the f32 footprint
    orig = params["layers"]["w_gate"].size * 4
    packed = qp["layers"]["w_gate"]["packed"].size
    assert packed == orig / 8


def test_int4_forward_end_to_end_close_to_dense():
    from duodecoding_tpu.models import forward, init_cache, init_random_params, resolve_config

    cfg = resolve_config("test-tiny")
    params = init_random_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qp = quantize_params(params, group_size=32)
    tokens = jnp.array([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    cache1 = init_cache(cfg, 1, 16, jnp.float32)
    cache2 = init_cache(cfg, 1, 16, jnp.float32)
    dense_logits, _ = forward(params, cfg, tokens, cache1)
    q_logits, _ = forward(qp, cfg, tokens, cache2)
    # greedy tokens mostly agree despite 4-bit error
    agree = float(
        jnp.mean(
            (jnp.argmax(dense_logits, -1) == jnp.argmax(q_logits, -1)).astype(
                jnp.float32
            )
        )
    )
    assert agree >= 0.5
    # and logits correlate strongly
    d = np.asarray(dense_logits).ravel()
    qv = np.asarray(q_logits).ravel()
    corr = np.corrcoef(d, qv)[0, 1]
    assert corr > 0.95


def test_stacked_layer_indexed_kernel_matches_reference():
    """The zero-copy stacked kernel (scalar-prefetched layer index) must
    match slicing the layer out and running the reference impl."""
    from duodecoding_tpu.models.quant import int4_matmul_reference
    from duodecoding_tpu.ops.pallas.int4_matmul import int4_matmul

    L, K, N, gs = 3, 64, 256, 16
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(key, (L, K // 2, N), 0, 256, jnp.int32).astype(
        jnp.uint8
    )
    scales = jax.random.uniform(key, (L, K // gs, N), jnp.float32, 0.01, 0.1)
    zeros = -7.5 * scales
    qs = {"packed": packed, "scales": scales, "zeros": zeros}
    x = jax.random.normal(jax.random.PRNGKey(1), (5, K), jnp.float32)

    for layer in range(L):
        want = int4_matmul_reference(
            x, {k: v[layer] for k, v in qs.items()}
        )
        got = int4_matmul(
            x, qs, layer=jnp.int32(layer), interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("chunk", [2, 4])
def test_int4_matmul_chunked_matches_reference(chunk, monkeypatch):
    """Chunked-group kernel (DUODEC_INT4_CHUNK): fewer, larger MXU dots with
    per-chunk scale folding + one batched zero-point dot."""
    monkeypatch.setenv("DUODEC_INT4_CHUNK", str(chunk))
    key = jax.random.PRNGKey(6)
    w = jax.random.normal(key, (256, 256), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 256), jnp.bfloat16)
    q = quantize_int4(w, group_size=32)  # 8 groups
    ref = int4_matmul_reference(x, q)
    out = int4_matmul(x, q, interpret=True, fused=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=6e-2, atol=6e-2
    )


def test_int4_matmul_chunked_stacked_matches_reference(monkeypatch):
    monkeypatch.setenv("DUODEC_INT4_CHUNK", "2")
    L, K, N, gs = 2, 64, 256, 16
    key = jax.random.PRNGKey(8)
    packed = jax.random.randint(key, (L, K // 2, N), 0, 256, jnp.int32).astype(
        jnp.uint8
    )
    scales = jax.random.uniform(key, (L, K // gs, N), jnp.float32, 0.01, 0.1)
    qs = {"packed": packed, "scales": scales, "zeros": -7.5 * scales}
    x = jax.random.normal(jax.random.PRNGKey(9), (5, K), jnp.float32)
    for layer in range(L):
        want = int4_matmul_reference(x, {k: v[layer] for k, v in qs.items()})
        got = int4_matmul(x, qs, layer=jnp.int32(layer), interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=6e-2, atol=6e-2
        )


def test_int4_matmul_chunk_indivisible_falls_back(monkeypatch):
    """A chunk that does not divide the group count silently degrades to
    the per-group path (still correct)."""
    monkeypatch.setenv("DUODEC_INT4_CHUNK", "3")
    w = jax.random.normal(jax.random.PRNGKey(10), (256, 256), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(11), (4, 256), jnp.bfloat16)
    q = quantize_int4(w, group_size=32)  # 8 groups, 3 does not divide
    ref = int4_matmul_reference(x, q)
    out = int4_matmul(x, q, interpret=True, fused=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_int4_matmul_streamed_matches_reference():
    """Streamed kernel (HBM-resident weights + double-buffered group-pair
    chunk DMA, DUODEC_INT4_STREAM): bit-level strategy differs from the
    grid-pipelined kernels, outputs must match the reference impl."""
    from duodecoding_tpu.models.quant import int4_matmul_reference
    from duodecoding_tpu.ops.pallas.int4_matmul import (
        _int4_matmul_2d_streamed,
    )

    L, K, N, gs = 3, 64, 256, 16
    key = jax.random.PRNGKey(2)
    packed = jax.random.randint(key, (L, K // 2, N), 0, 256, jnp.int32).astype(
        jnp.uint8
    )
    scales = jax.random.uniform(key, (L, K // gs, N), jnp.float32, 0.01, 0.1)
    zeros = -7.5 * scales
    qs = {"packed": packed, "scales": scales, "zeros": zeros}
    x = jax.random.normal(jax.random.PRNGKey(3), (8, K), jnp.bfloat16)

    for layer in range(L):
        want = int4_matmul_reference(
            x, {k: v[layer] for k, v in qs.items()}
        )
        got = _int4_matmul_2d_streamed(
            x, packed, scales, zeros, jnp.int32(layer),
            gs, 8, 128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)
