"""Autoregressive baselines: modes `small` (draft tier) and `large` (target).

Reference: src/engine.py:549-608 — plain AR sampling with KV cache;
``queuing_time += batch_delay`` per forward step.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.loops import ar_generate, prefill_plan_for
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.registry import register_mode


def _autoregressive(engine, prefix, tier, which: str, use_early_stopping=False, **kw):
    from duodecoding_tpu.engine.engine import Stopwatch

    cfg = engine.config
    tokens, L = engine.token_buffer(prefix)
    cache = engine.new_cache(tier)
    eos = cfg.eos_ids if use_early_stopping else ()

    with Stopwatch() as sw:
        # prefill runs INSIDE ar_generate (prefill_plan): one dispatch,
        # specialised on the bucketed plan (not the exact prompt length)
        out_tokens, n, _, steps = ar_generate(
            tier.params,
            cfg=tier.cfg,
            tokens=tokens,
            cache=cache,
            n_tokens=jnp.int32(L),
            key=engine.next_key(),
            sampling=engine.sampling,
            max_new_tokens=cfg.max_tokens,
            eos_ids=eos,
            prefill_plan=prefill_plan_for(L, cap=cfg.max_seq_len),
        )
        # ONE transfer = the timing barrier AND the host copy of every
        # output: each separate fetch after the loop costs a ~27 ms
        # round-trip on the remote backend (engine.block docstring)
        out_tokens, n, steps = jax.device_get((out_tokens, n, steps))

    n = int(n)
    steps = int(steps)
    out = out_tokens[:, :n]

    m = get_empty_metrics()
    m["generated_tokens"] = n - L
    m[f"{which}_forward_times"] = steps
    m["loop_times"] = steps
    m["queuing_time"] = steps * cfg.batch_delay
    m["wall_time"] = sw.elapsed + m["queuing_time"]
    m["computation_time"] = sw.elapsed
    return out, finalize_throughput(m)


@register_mode("small")
def small(engine, prefix, **kw):
    tier = engine.draft or engine.target
    return _autoregressive(engine, prefix, tier, "draft", **kw)


@register_mode("large")
def large(engine, prefix, **kw):
    return _autoregressive(engine, prefix, engine.target, "target", **kw)
