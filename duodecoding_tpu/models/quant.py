"""Groupwise INT4 weight-only quantization (gpt-fast / GGUF style).

The reference's draft tier runs INT4 via llama.cpp GGUF on CPU
(reference: src/model_cpu.py) and its vendored TP shards
``WeightOnlyInt4Linear`` scales_and_zeros (reference: src/tp.py:88-104).
Here weights are quantized to 4-bit groupwise-affine format:

- a weight matrix [K, N] is grouped along K in ``group_size`` rows;
- per group/column: ``scale = (max - min) / 15``, ``zero = min``; codes are
  ``round((w - zero) / scale)`` in [0, 15];
- codes pack two-per-byte in a split-K layout — the LOW nibbles hold rows
  [0, K/2), the HIGH nibbles rows [K/2, K) — chosen so the Pallas kernel
  unpacks with a concat instead of an interleave (TPU-lane friendly).

``quantize_params`` converts a transformer parameter pytree's matmul
weights, leaving norms/embeddings in bf16; ``forward`` consumes the result
transparently (models/transformer.py dispatches on the quantized dict).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

# projection groups that share an input activation: fusable into one matmul
FUSED_GROUPS = {"wqkv": ("wq", "wk", "wv"), "w_gateup": ("w_gate", "w_up")}


def quantize_int4(w: jax.Array, group_size: int = 128) -> dict:
    """w: [..., K, N] -> {packed [..., K/2, N] uint8, scales/zeros
    [..., K/group_size, N] f32}. K must be even and divisible by group_size."""
    *lead, K, N = w.shape
    assert K % 2 == 0, "K must be even for nibble packing"
    assert K % group_size == 0, f"K={K} not divisible by group_size={group_size}"
    w = w.astype(jnp.float32)
    g = w.reshape(*lead, K // group_size, group_size, N)
    w_min = jnp.min(g, axis=-2, keepdims=True)
    w_max = jnp.max(g, axis=-2, keepdims=True)
    scale = jnp.maximum((w_max - w_min) / 15.0, 1e-8)
    codes = jnp.clip(jnp.round((g - w_min) / scale), 0, 15).astype(jnp.uint8)
    codes = codes.reshape(*lead, K, N)
    low = codes[..., : K // 2, :]
    high = codes[..., K // 2 :, :]
    packed = (low | (high << 4)).astype(jnp.uint8)
    # arrays only (no static fields): the dict must be scannable/shardable;
    # group_size and (K, N) are derivable from the shapes (see q_meta)
    return {
        "packed": packed,
        "scales": scale[..., 0, :].astype(jnp.float32),
        "zeros": w_min[..., 0, :].astype(jnp.float32),
    }


def q_meta(q: dict) -> tuple[int, int, int]:
    """(K, N, group_size) derived from a quantized dict's shapes."""
    Kh, N = q["packed"].shape[-2:]
    K = Kh * 2
    group_size = K // q["scales"].shape[-2]
    return K, N, group_size


def dequantize_int4(q: dict, dtype=jnp.bfloat16) -> jax.Array:
    """Reference (non-Pallas) dequantization, for parity tests and CPU."""
    packed = q["packed"]
    *lead, Kh, N = packed.shape
    K = Kh * 2
    low = (packed & 0xF).astype(jnp.float32)
    high = ((packed >> 4) & 0xF).astype(jnp.float32)
    codes = jnp.concatenate([low, high], axis=-2)  # [..., K, N]
    _, _, gs = q_meta(q)
    codes = codes.reshape(*lead, K // gs, gs, N)
    w = codes * q["scales"][..., :, None, :] + q["zeros"][..., :, None, :]
    return w.reshape(*lead, K, N).astype(dtype)


def int4_matmul_reference(x: jax.Array, q: dict) -> jax.Array:
    """x [..., K] @ dequant(q) [K, N] in f32 accumulation."""
    w = dequantize_int4(q, dtype=jnp.bfloat16)
    return jnp.matmul(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )


def is_quantized(p: Any) -> bool:
    return isinstance(p, dict) and "packed" in p and "scales" in p


def quantize_params(
    params: dict, group_size: int = 128, quantize_head: bool = True
) -> dict:
    """Quantize the per-layer matmul weights of a transformer param pytree.

    Stacked [L, K, N] weights keep the layer axis; norms, biases and
    embeddings stay in their original dtype. An untied ``lm_head`` is
    quantized too by default (like the reference's GGUF drafts, which
    quantize the output projection; a bf16 head would otherwise be ~40%
    of a small sliced draft's per-forward bytes).
    """
    out = dict(params)
    layers = dict(params["layers"])
    for k in QUANT_KEYS:
        if k in layers:
            layers[k] = quantize_int4(layers[k], group_size)
    out["layers"] = layers
    if quantize_head and "lm_head" in params:
        w = params["lm_head"]
        pad = (-w.shape[-1]) % 512  # full kernel tiles (forward re-slices)
        if pad:
            w = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, pad)))
        out["lm_head"] = quantize_int4(w, group_size)
    return out


def fuse_layer_weights(layers: dict) -> dict:
    """Concatenate the QKV and gate/up projections along their output (N)
    axis — one matmul kernel launch where there were three (QKV) or two
    (gate/up).

    Decode-time forwards are dominated by per-kernel fixed costs at small
    M; fusing cuts the launches per layer from 7 to 4. EXACT for both
    dense arrays and groupwise-INT4 dicts: quantization affines are
    per-(group, column), so concatenating quantized parts along N equals
    quantizing the concatenation, and per-column accumulation order in the
    kernel is unchanged — fused outputs are bitwise identical.
    """
    out = dict(layers)
    for fused, parts in FUSED_GROUPS.items():
        if not all(p in out for p in parts):
            continue
        ws = [out[p] for p in parts]
        if all(is_quantized(w) for w in ws):
            out[fused] = {
                k: jnp.concatenate([w[k] for w in ws], axis=-1)
                for k in ("packed", "scales", "zeros")
            }
        elif any(is_quantized(w) for w in ws):
            continue  # mixed precision across the group — leave unfused
        else:
            out[fused] = jnp.concatenate(ws, axis=-1)
        for p in parts:
            del out[p]
    return out


def fuse_params(params: dict) -> dict:
    """``fuse_layer_weights`` over a transformer param pytree."""
    out = dict(params)
    out["layers"] = fuse_layer_weights(params["layers"])
    return out


def quantized_bytes(params: dict) -> int:
    """Model bytes under the quantized representation (bandwidth model)."""
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
