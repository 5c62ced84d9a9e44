"""Marginal per-token loop cost of engine modes at 13B, on-chip.

Runs each mode at two max_new_tokens values on the same prompt and
differences the walls — prefill, dispatch and host transfers cancel,
leaving the pure device-loop marginal cost per token — and also reports
the INTERCEPT (the per-run fixed cost inside the mode's stopwatch:
prefill + dispatch + completion barrier) plus per-ITERATION cost.

Uses the bench's calibrated pair construction (alpha from round-2's warm
value) at the bench's S=512 shapes.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_iter.py \
      [mode-or-spec ...]
where each arg is `large`, `sd`, or a tree spec like `4,2,2,1`
(optionally prefixed `probe=<flags>:` to set DUODEC_TREE_PROBE for that
run — probe flags are read at trace time, so probed runs must not share
a process with unprobed ones; this tool runs each arg in-process and
therefore accepts at most ONE probe setting per invocation).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ALPHA = 0.0005549774770204644  # bench warm calibrated value (seed 0)
S = 512
PROMPT = 64


def main():
    import jax
    import jax.numpy as jnp

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
    prompt = rng.integers(1, cfg.vocab_size, (1, PROMPT))

    def eng(max_new, gamma=4):
        ec = EngineConfig(
            max_tokens=max_new, gamma=gamma, temperature=0.0, max_seq_len=S,
            int8_kv_target=True,
        )
        return Engine(target=Tier(cfg, tp), draft=Tier(dcfg, dp), config=ec)

    def run(mode, max_new, gamma=4, **kw):
        e = eng(max_new, gamma)
        t0 = time.perf_counter()
        e.run(mode, prompt, **kw)  # warm/compile
        compile_s = time.perf_counter() - t0
        best_wall = np.inf
        toks = acc = iters = 0
        for _ in range(3):
            out, m = e.run(mode, prompt, **kw)
            best_wall = min(best_wall, m["wall_time"])
            toks = m["generated_tokens"]
            iters = m.get("loop_times") or toks
            if m["draft_generated_tokens"]:
                acc = m["draft_accepted_tokens"] / m["draft_generated_tokens"]
        return best_wall, toks, iters, acc, compile_s

    modes = [("large", {}), ("sd", {}),
             ("sd_tree", {"tree_spec": (3, 1, 1, 1)}),
             ("sd_tree", {"tree_spec": (4, 2, 2, 1)})]
    if len(sys.argv) > 1:
        modes = []
        for a in sys.argv[1:]:
            if a.startswith("probe="):
                pr, a = a[len("probe="):].split(":", 1)
                os.environ["DUODEC_TREE_PROBE"] = pr
            if a in ("large", "sd", "small"):
                modes.append((a, {}))
            elif ";" in a:  # dynamic width: 'specA;specB[;gap=X]'
                parts = [p for p in a.split(";") if p]
                gap = 2.0
                if parts[-1].startswith("gap="):
                    gap = float(parts.pop()[4:])
                modes.append(
                    ("sd_tree", {"tree_spec": ";".join(parts),
                                 "tree_gap": gap})
                )
            else:
                modes.append(
                    ("sd_tree",
                     {"tree_spec": tuple(int(x) for x in a.split(","))})
                )
    probe = os.environ.get("DUODEC_TREE_PROBE", "")
    for mode, kw in modes:
        if "tree_spec" in kw:
            from duodecoding_tpu.engine.modes.sd_tree import parse_specs

            g = max(len(sp) for sp in parse_specs(kw["tree_spec"]))
        else:
            g = 4
        lo, tl, il, _, c1 = run(mode, 32, gamma=g, **kw)
        hi, th, ih, acc, c2 = run(mode, 128, gamma=g, **kw)
        per = (hi - lo) / (th - tl)
        per_it = (hi - lo) / max(ih - il, 1)
        fixed = lo - tl * per
        label = mode + (f" {kw.get('tree_spec')}" if kw else "")
        if probe:
            label += f" [{probe}]"
        print(
            f"{label:28s} marginal {per*1e3:6.2f} ms/tok "
            f"({per_it*1e3:6.2f} ms/iter, {(th-tl)/max(ih-il,1):.2f} tok/it) "
            f"fixed {fixed*1e3:6.0f} ms  accept {acc:.3f} "
            f"loop {1.0/per:6.1f} tok/s  [compile {c1:.0f}s/{c2:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
