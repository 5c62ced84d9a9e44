"""Decompose the per-run fixed cost of the fused tree-generate program.

Times, separately: (a) the dispatch call (async — returns once args are
marshalled and the program is enqueued), (b) block_until_ready on the
outputs (device compute + completion round-trip), (c) the post-hoc
device_get of the records. Run at two max_new values so the loop marginal
can be subtracted from (b), leaving the true fixed remainder.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/fixed_cost_probe.py
"""

import time

import numpy as np

ALPHA = 0.0005549774770204644
S = 512
PROMPT = 64
SPEC = (3, 2, 1, 1, 1, 1, 1)


def main():
    import jax
    import jax.numpy as jnp

    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
    from duodecoding_tpu.engine.loops import prefill_plan_for
    from duodecoding_tpu.engine.tree_loops import tree_generate
    from duodecoding_tpu.models import resolve_config
    from duodecoding_tpu.models.quant import fuse_params
    from duodecoding_tpu.models.surgery import (
        init_random_quant_params, scale_residual, truncate_model,
    )

    cfg = resolve_config("llama-2-13b")
    qparams = fuse_params(
        init_random_quant_params(cfg, jax.random.PRNGKey(0), 128)
    )
    jax.block_until_ready(qparams["embed"])
    tp = scale_residual(qparams, ALPHA)
    dcfg, dp = truncate_model(cfg, tp, 3)
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, cfg.vocab_size, (1, PROMPT))

    for max_new in (32, 128):
        ec = EngineConfig(
            max_tokens=max_new, gamma=len(SPEC), temperature=0.0,
            max_seq_len=S, int8_kv_target=True,
        )
        eng = Engine(target=Tier(cfg, tp), draft=Tier(dcfg, dp), config=ec)
        eng.run("sd_tree", prompt, tree_spec=SPEC)  # compile

        d_cache = eng.new_cache(eng.draft, batch=6)
        t_cache = eng.new_cache(eng.target)
        tokens, L = eng.token_buffer(prompt)
        for rep in range(3):
            t0 = time.perf_counter()
            outs = tree_generate(
                dp, tp, tokens, jnp.int32(L), d_cache, t_cache,
                draft_cfg=dcfg, target_cfg=cfg, spec=SPEC,
                key=eng.next_key(), sampling=None, typical=(0.09, 0.3),
                max_new_tokens=max_new, eos_ids=(),
                prefill_plan=prefill_plan_for(L, cap=S),
            )
            t1 = time.perf_counter()
            jax.block_until_ready((outs[0], outs[1]))
            t2 = time.perf_counter()
            rec = jax.device_get(outs[2])
            t3 = time.perf_counter()
            print(
                f"max_new={max_new} rep={rep}: dispatch {1e3*(t1-t0):6.1f} ms"
                f"  block {1e3*(t2-t1):7.1f} ms  rec_get {1e3*(t3-t2):6.1f} ms",
                flush=True,
            )
            # fresh caches each rep (donated buffers)
            d_cache = eng.new_cache(eng.draft, batch=6)
            t_cache = eng.new_cache(eng.target)
            tokens, L = eng.token_buffer(prompt)


if __name__ == "__main__":
    main()
