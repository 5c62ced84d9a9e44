"""On-chip cost of ONE draft-step forward (the SD loop's hot inner op).

Two-scan-length difference method (tools/profile_kernels.py rules): the
draft step runs inside a jitted lax.scan whose token input is perturbed by
the integer iteration index (no CSE), carrying a max-reduction; the same
program compiles at two scan lengths and the per-step time is the
difference — dispatch and prefill cancel.

Usage: PYTHONPATH=/root/repo python tools/probe_draft.py [B ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

ALPHA = 0.0005549774770204644  # bench warm calibrated value (seed 0)


def main():
    from duodecoding_tpu.models import resolve_config
    from duodecoding_tpu.models.quant import fuse_params
    from duodecoding_tpu.models.surgery import (
        init_random_quant_params, scale_residual, truncate_model,
    )
    from duodecoding_tpu.models.transformer import (
        forward, init_cache, set_cache_length,
    )

    cfg = resolve_config("llama-2-13b")
    qparams = init_random_quant_params(cfg, jax.random.PRNGKey(0), 128)
    if "nofuse" not in sys.argv:
        qparams = fuse_params(qparams)
    jax.block_until_ready(qparams["embed"])
    tp = scale_residual(qparams, ALPHA)
    dcfg, dp = truncate_model(cfg, tp, 3)
    S = 512

    # variants: "B[:S[:samp]]" with samp in {argmax, topk4, laxtopk4, none}
    variants = []
    for a in sys.argv[1:]:
        if a == "nofuse":
            continue
        parts = a.split(":")
        B = int(parts[0])
        vS = int(parts[1]) if len(parts) > 1 else S
        samp = parts[2] if len(parts) > 2 else "argmax"
        variants.append((B, vS, samp))
    if not variants:
        variants = [(1, S, "argmax"), (16, S, "argmax")]
    for B, S, samp in variants:
        cache0 = init_cache(dcfg, B, S)
        # warm the cache to a realistic decode position (jitted: eager
        # forward would dispatch hundreds of remote ops)
        warm = jnp.ones((B, 64), jnp.int32)
        _, cache0 = jax.jit(forward, static_argnames=("cfg",))(
            dp, dcfg, warm, cache0
        )
        jax.block_until_ready(cache0.k)

        def make(n_steps):
            # COMPILE-PROBE TRAP (CLAUDE.md): params/cache must be real
            # arguments — capturing them as jit constants compiles 30-60x
            # slower on the remote backend
            @jax.jit
            def run(dp, cache):
                def step(carry, i):
                    best, cache = carry
                    tok = (i % 1000 + 1).astype(jnp.int32)
                    toks = jnp.full((B, 1), tok, jnp.int32)
                    lg, cache = forward(dp, dcfg, toks, cache)
                    if samp == "topk4":
                        from duodecoding_tpu.ops.sampling import (
                            top_k_via_argmax,
                        )

                        _, topi = top_k_via_argmax(lg[:, -1, :32000], 4)
                        nxt = topi[:, 0]
                    elif samp == "laxtopk4":
                        _, topi = jax.lax.top_k(lg[:, -1, :32000], 4)
                        nxt = topi[:, 0]
                    elif samp == "none":
                        nxt = lg[:, -1, 0].astype(jnp.int32)
                    else:
                        nxt = jnp.argmax(lg[:, -1, :], axis=-1)
                    best = jnp.maximum(best, jnp.max(nxt))
                    # keep the cache length fixed so every step costs the same
                    cache = set_cache_length(cache, 64)
                    return (best, cache), None

                (best, _), _ = jax.lax.scan(
                    step, (jnp.int32(-1), cache), jnp.arange(n_steps)
                )
                return best

            return run

        outs = {}
        for n in (32, 128):
            run = make(n)
            t0 = time.time()
            int(run(dp, cache0))  # compile + first run
            print(f"  B={B} S={S} {samp} n={n}: compile+run "
                  f"{time.time()-t0:.1f}s", flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                int(run(dp, cache0))
                best = min(best, time.perf_counter() - t0)
            outs[n] = best
        per = (outs[128] - outs[32]) / (128 - 32)
        print(f"B={B} S={S} {samp}: draft step {per*1e3:.3f} ms/forward",
              flush=True)


if __name__ == "__main__":
    main()
