"""Pallas TPU kernel: fused groupwise-INT4 dequantize + matmul.

The TPU equivalent of the reference's INT4 draft-tier compute (llama.cpp
GGUF CPU kernels, reference: src/model_cpu.py; gpt-fast
``WeightOnlyInt4Linear``, reference: src/tp.py:88-104). Decode-time
matmuls are weight-bandwidth-bound, so keeping weights packed 4-bit in HBM
and dequantizing in VMEM on the fly is a ~3.5x bandwidth win over bf16.

Kernel strategy (per N-tile program):
- the packed [K/2, TILE_N] uint8 block is unpacked with a concat (the
  split-K nibble layout from models/quant.py avoids row interleaving);
- the affine dequant is NOT materialised: since scales/zeros are constant
  per (group, column),

      y = sum_g (x_g @ codes_g) * s_g  +  rowsum(x_g) ⊗ z_g

  i.e. the MXU multiplies raw 4-bit codes and the affine fixup happens on
  the [M, TILE_N] output — one cheap VPU multiply-add per group instead of
  a full K x TILE_N dequantized weight buffer.

Falls back to the jnp reference implementation off-TPU (and under
``interpret=True`` for tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from duodecoding_tpu.models.quant import int4_matmul_reference


def _kernel(x_ref, p_ref, s_ref, z_ref, o_ref, *, group_size: int, n_groups: int):
    x = x_ref[:]  # [M, K] bf16
    p = p_ref[:].astype(jnp.int32)  # [K//2, TN]
    low = (p & 0xF).astype(jnp.bfloat16)
    high = ((p >> 4) & 0xF).astype(jnp.bfloat16)
    codes = jnp.concatenate([low, high], axis=0)  # [K, TN]

    M = x.shape[0]
    acc = jnp.zeros((M, o_ref.shape[1]), jnp.float32)
    for g in range(n_groups):
        xg = x[:, g * group_size : (g + 1) * group_size]
        cg = codes[g * group_size : (g + 1) * group_size, :]
        partial = jnp.dot(xg, cg, preferred_element_type=jnp.float32)
        sg = s_ref[g, :][None, :]  # [1, TN]
        zg = z_ref[g, :][None, :]
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)  # [M, 1]
        acc = acc + partial * sg + xsum * zg
    o_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("group_size", "tile_n", "interpret")
)
def _int4_matmul_2d(
    x: jax.Array,  # [M, K] bf16
    packed: jax.Array,  # [K/2, N] uint8
    scales: jax.Array,  # [G, N] f32
    zeros: jax.Array,  # [G, N] f32
    group_size: int,
    tile_n: int,
    interpret: bool = False,
):
    M, K = x.shape
    N = packed.shape[1]
    n_groups = K // group_size
    grid = (N // tile_n,)

    kernel = functools.partial(_kernel, group_size=group_size, n_groups=n_groups)
    flops = 2 * M * K * N
    bytes_accessed = K // 2 * N + 2 * 4 * n_groups * N + M * K * 2 + M * N * 4
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), packed, scales, zeros)


def _pick_tile(n: int) -> int:
    for t in (512, 256, 128):
        if n % t == 0:
            return t
    return 0


def int4_matmul(x: jax.Array, q: dict, interpret: bool | None = None) -> jax.Array:
    """x [..., K] @ int4-groupwise-quantized W [K, N] -> [..., N] f32.

    Uses the Pallas kernel on TPU (or interpret mode when requested);
    otherwise the jnp reference path.
    """
    from duodecoding_tpu.models.quant import q_meta

    packed, scales, zeros = q["packed"], q["scales"], q["zeros"]
    K, N, gs = q_meta(q)
    tile = _pick_tile(N)
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = False
        if not on_tpu:
            return int4_matmul_reference(x, q)
    if tile == 0:
        return int4_matmul_reference(x, q)

    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    # pad M to the f32 sublane tile
    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _int4_matmul_2d(x2, packed, scales, zeros, gs, tile, interpret)
    return out[:M].reshape(*lead, N)
