"""Probe the INT4 stacked kernel's scoped-VMEM OOM threshold on-chip.

Compiles _int4_matmul_2d_stacked at the 13B w_down shape (K=13824,
N=5120) across tile_m values and reports compile ok/OOM — pins down the
real Mosaic stack model instead of guessing (the M=432 fused-prefill call
OOM'd at 15.92M > 12M with tile_m=144).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/vmem_probe.py
"""

import sys

import jax
import jax.numpy as jnp


def main():
    from duodecoding_tpu.ops.pallas.int4_matmul import _int4_matmul_2d_stacked

    K, N, L, gs = 13824, 5120, 3, 128
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(key, (L, K // 2, N), 0, 255, jnp.uint8)
    scales = jnp.ones((L, K // gs, N), jnp.float32)
    zeros = jnp.zeros((L, K // gs, N), jnp.float32)
    for tm in (72, 80, 88, 96, 104, 112, 120, 128, 144):
        x = jnp.ones((tm, K), jnp.bfloat16)
        try:
            out = _int4_matmul_2d_stacked(
                x, packed, scales, zeros, jnp.int32(0), gs, tm, 128
            )
            jax.block_until_ready(out)
            print(f"tile_m={tm}: OK", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            lim = [w for w in msg.split() if w.endswith("M") and "." in w]
            print(f"tile_m={tm}: FAIL {' '.join(lim[:4])}", flush=True)


if __name__ == "__main__":
    main()
