"""Autoregressive baselines: modes `small` (draft tier) and `large` (target).

Reference: src/engine.py:549-608 — plain AR sampling with KV cache;
``queuing_time += batch_delay`` per forward step.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.loops import (
    ar_generate,
    ar_generate_suite,
    prefill_plan_for,
)
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.registry import register_mode, register_suite


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


@register_suite("large")
def large_suite(engine, prompts, use_early_stopping=False, **kw):
    """Fused multi-prompt AR evaluation: ONE device program for the whole
    equal-length prompt set (loops.py:ar_generate_suite). Per-prompt wall
    is the measured suite wall attributed by decode-step share — AR steps
    cost the same weight stream each, so the attribution is exact up to
    the shared one-off launch overhead the fusion exists to amortize."""
    from duodecoding_tpu.engine.engine import Stopwatch

    cfg = engine.config
    tier = engine.target
    bufs, L = engine.suite_buffer(prompts)
    cache = engine.new_cache(tier)
    eos = cfg.eos_ids if use_early_stopping else ()

    with Stopwatch() as sw:
        out_tokens, n, steps = jax.device_get(
            ar_generate_suite(
                tier.params,
                cfg=tier.cfg,
                prompts=bufs,
                cache=cache,
                n_tokens=jnp.int32(L),
                key=engine.next_key(),
                sampling=engine.sampling,
                max_new_tokens=cfg.max_tokens,
                eos_ids=eos,
                prefill_plan=prefill_plan_for(L, cap=cfg.max_seq_len),
            )
        )

    total_steps = max(int(steps.sum()), 1)
    results = []
    for p in range(prompts.shape[0]):
        np_, sp = int(n[p]), int(steps[p])
        m = get_empty_metrics()
        m["generated_tokens"] = np_ - L
        m["target_forward_times"] = sp
        m["loop_times"] = sp
        m["queuing_time"] = sp * cfg.batch_delay
        m["computation_time"] = sw.elapsed * sp / total_steps
        m["wall_time"] = m["computation_time"] + m["queuing_time"]
        m["suite_wall_time"] = sw.elapsed
        results.append((out_tokens[p][:, :np_], finalize_throughput(m)))
    return results


@register_mode("small")
def small(engine, prefix, **kw):
    tier = engine.draft or engine.target
    return _autoregressive(engine, prefix, tier, "draft", **kw)


@register_mode("large")
def large(engine, prefix, **kw):
    return _autoregressive(engine, prefix, engine.target, "target", **kw)
