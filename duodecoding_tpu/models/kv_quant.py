"""INT8 KV cache (per-position, per-head symmetric scales).

The north-star target tier stores its KV cache in int8 (BASELINE.json):
halves the HBM traffic of the attention reads that dominate decode. Keys
and values quantize on write with ``scale = max|x| / 127`` per
(layer, batch, position, kv-head); the read path dequantizes into the
attention matmuls (XLA fuses the convert+scale into the dot operands).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from duodecoding_tpu.models.config import ModelConfig


class QuantKVCache(NamedTuple):
    k: jax.Array  # [L, B, S, H_kv, Dh] int8
    v: jax.Array  # [L, B, S, H_kv, Dh] int8
    k_scale: jax.Array  # [L, B, S, H_kv] f32
    v_scale: jax.Array  # [L, B, S, H_kv] f32
    length: jax.Array  # scalar int32

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_quant_cache(cfg: ModelConfig, batch: int, max_len: int) -> QuantKVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim_)
    sshape = shape[:-1]
    return QuantKVCache(
        k=jnp.zeros(shape, jnp.int8),
        v=jnp.zeros(shape, jnp.int8),
        k_scale=jnp.zeros(sshape, jnp.float32),
        v_scale=jnp.zeros(sshape, jnp.float32),
        length=jnp.int32(0),
    )


def quantize_kv(x: jax.Array):
    """x [B, T, H, Dh] -> (codes int8, scale [B, T, H] f32)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    codes = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return codes, scale


def dequantize_kv(codes: jax.Array, scale: jax.Array, dtype=jnp.bfloat16):
    """codes [B, S, H, Dh] int8, scale [B, S, H] -> [B, S, H, Dh]."""
    return codes.astype(dtype) * scale[..., None].astype(dtype)
