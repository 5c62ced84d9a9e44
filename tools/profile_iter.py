"""Marginal per-token loop cost of engine modes at 13B, on-chip.

Runs each mode at two max_new_tokens values on the same prompt and
differences the walls — prefill, dispatch and host transfers cancel,
leaving the pure device-loop marginal cost per token. Uses the bench's
calibrated pair construction (alpha from round-2's warm value).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_iter.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

ALPHA = 0.0005549774770204644  # bench warm calibrated value (seed 0)


def main():
    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
    from duodecoding_tpu.models import resolve_config
    from duodecoding_tpu.models.quant import fuse_params
    from duodecoding_tpu.models.surgery import (
        init_random_quant_params, scale_residual, truncate_model,
    )

    cfg = resolve_config("llama-2-13b")
    qparams = fuse_params(init_random_quant_params(cfg, jax.random.PRNGKey(0), 128))
    jax.block_until_ready(qparams["embed"])
    tp = scale_residual(qparams, ALPHA)
    dcfg, dp = truncate_model(cfg, tp, 3)

    rng = np.random.default_rng(0)
    prompt = rng.integers(1, cfg.vocab_size, (1, 64))

    def eng(max_new):
        ec = EngineConfig(
            max_tokens=max_new, gamma=4, temperature=0.0, max_seq_len=256,
            int8_kv_target=True,
        )
        return Engine(target=Tier(cfg, tp), draft=Tier(dcfg, dp), config=ec)

    def run(mode, max_new, **kw):
        e = eng(max_new)
        e.run(mode, prompt, **kw)  # warm/compile
        best = np.inf
        toks = acc = 0
        for _ in range(3):
            t0 = time.perf_counter()
            out, m = e.run(mode, prompt, **kw)
            dt = time.perf_counter() - t0
            best = min(best, dt)
            toks = m["generated_tokens"]
            if m["draft_generated_tokens"]:
                acc = m["draft_accepted_tokens"] / m["draft_generated_tokens"]
        return best, toks, acc

    modes = [("large", {}), ("sd", {}), ("sd_tree", {"tree_spec": (3, 1, 1, 1)}),
             ("sd_tree", {"tree_spec": (4, 2, 2, 1)})]
    if len(sys.argv) > 1:  # e.g. profile_iter.py 4,2,1,1 2,2,2,1
        modes = [("sd_tree", {"tree_spec": tuple(int(x) for x in a.split(","))})
                 for a in sys.argv[1:]]
    for mode, kw in modes:
        lo, tl, _ = run(mode, 32, **kw)
        hi, th, acc = run(mode, 128, **kw)
        per = (hi - lo) / (th - tl)
        label = mode + (f" {kw.get('tree_spec')}" if kw else "")
        print(f"{label:24s} marginal {per*1e3:6.2f} ms/token "
              f"({th-tl} extra toks, accept {acc:.3f}) -> "
              f"{1.0/per:6.1f} tok/s loop speed", flush=True)


if __name__ == "__main__":
    main()
