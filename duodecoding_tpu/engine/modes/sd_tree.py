"""`sd_tree` — tree speculative decoding (DuoDecoding k-sequence drafting
generalised to branch-spec trees, TPU-native).

Reference parity: src/model_cpu.py:138-252 ``generate_k_seq`` — the
original DuoDecoding CPU draft proposes k candidate sequences (k in
{1,2,4,6,8}) that the target verifies together; that fork-at-root tree is
``tree_k`` here. ``tree_spec`` generalises it to branching at every level
(SpecInfer/EAGLE-2-shaped token trees). Drafting puts one lane per leaf
on the draft's batch axis and the target verifies the deduplicated tree
in one tree-attention forward (engine/tree_loops.py). Greedy only;
output is token-identical to ``large`` (losslessness contract).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.modes.common import run_sd_loop  # noqa: F401 (doc xref)
from duodecoding_tpu.engine.registry import (
    SuiteFallback,
    register_mode,
    register_suite,
)
from duodecoding_tpu.engine.loops import prefill_plan_for
from duodecoding_tpu.engine.tree_loops import tree_generate, tree_generate_suite


def parse_spec(tree_spec) -> tuple[int, ...]:
    """Normalise a branch spec: tuple/list of ints or a '4,2,2,1' string."""
    if isinstance(tree_spec, str):
        tree_spec = [int(t) for t in tree_spec.replace("x", ",").split(",") if t]
    spec = tuple(int(k) for k in tree_spec)
    if not spec or any(k < 1 for k in spec):
        raise ValueError(f"invalid tree_spec {tree_spec!r}")
    return spec


def parse_specs(tree_spec) -> tuple[tuple[int, ...], ...]:
    """Parse one or more ';'-separated branch specs (multiple specs =
    adaptive per-iteration width selection, confident-to-uncertain order)."""
    if isinstance(tree_spec, str):
        return tuple(parse_spec(s) for s in tree_spec.split(";") if s)
    if tree_spec and isinstance(tree_spec[0], (tuple, list)):
        return tuple(parse_spec(s) for s in tree_spec)
    return (parse_spec(tree_spec),)


@register_mode("sd_tree", aliases=("duodec", "sd_kseq"))
def sd_tree(engine, prefix, tree_k: int = 2, tree_spec=None, tree_gap=None,
            posterior_threshold: float = 0.09, posterior_alpha: float = 0.3,
            **kw):
    """Tree SD. ``tree_spec`` = per-level branch factors (e.g. (4, 2, 2, 1));
    ``tree_k`` alone = fork width for the k-chain special case
    ``(tree_k, 1, ..., 1)`` over ``gamma`` levels. Multiple ';'-separated
    specs enable DYNAMIC width: the draft's first-token logit gap picks a
    spec per iteration against the descending ``tree_gap`` thresholds
    (reference generate_k_seq parity, src/model_cpu.py:138-252)."""
    from duodecoding_tpu.engine.engine import Stopwatch, block

    cfg = engine.config
    # temperature 0: greedy argmax walk, token-identical to `large`.
    # temperature > 0: typical-acceptance sampled verification (reference
    # medusa evaluate_posterior, src/model/medusa/utils.py:274-320) with
    # `posterior_threshold`/`posterior_alpha` — the reference's sampled
    # tree semantics (not an exact match of AR sampling: candidates are
    # the draft's top-k, not samples).
    sampling = None if cfg.temperature == 0.0 else engine.sampling
    typical = (float(posterior_threshold), float(posterior_alpha))
    draft, target = engine.draft, engine.target
    tokens, L = engine.token_buffer(prefix)
    gamma = kw.get("gamma") or cfg.gamma
    if tree_spec is not None:
        specs = parse_specs(tree_spec)
        gamma = max(len(sp) for sp in specs)
    else:
        specs = ((int(tree_k),) + (1,) * (gamma - 1),)
    lanes = max(int(np.prod(sp)) for sp in specs)
    from duodecoding_tpu.engine.tree_loops import spec_layout

    n_rows = max(len(spec_layout(sp).offsets) for sp in specs)  # incl. root
    if L + cfg.max_tokens + n_rows > cfg.max_seq_len:
        raise ValueError(
            f"sd_tree specs {specs} verify up to {n_rows} rows per "
            f"iteration: prompt ({L}) + max_tokens ({cfg.max_tokens}) + "
            f"{n_rows} exceeds max_seq_len ({cfg.max_seq_len})"
        )
    if L < gamma + 2:
        raise ValueError(
            f"sd_tree needs prompt_len >= gamma + 2 (catch-up rewind); "
            f"got {L} < {gamma + 2}"
        )
    eos = cfg.eos_ids if kw.get("use_early_stopping") else ()

    d_cache = engine.new_cache(draft, batch=lanes)
    t_cache = engine.new_cache(target)

    if len(specs) > 1:
        from duodecoding_tpu.engine.tree_loops import tree_generate_adaptive

        if tree_gap is None:
            tree_gap = (2.0,) * (len(specs) - 1)
        elif isinstance(tree_gap, (int, float)):
            tree_gap = (float(tree_gap),) * (len(specs) - 1)
        thresholds = tuple(float(t) for t in tree_gap)

        def generate():
            return tree_generate_adaptive(
                draft.params,
                target.params,
                tokens,
                jnp.int32(L),
                d_cache,
                t_cache,
                draft_cfg=draft.cfg,
                target_cfg=target.cfg,
                specs=specs,
                gap_thresholds=thresholds,
                key=engine.next_key(),
                sampling=sampling,
                typical=typical,
                max_new_tokens=cfg.max_tokens,
                eos_ids=eos,
                prefill_plan=prefill_plan_for(L, cap=cfg.max_seq_len),
            )

    else:

        def generate():
            return tree_generate(
                draft.params,
                target.params,
                tokens,
                jnp.int32(L),
                d_cache,
                t_cache,
                draft_cfg=draft.cfg,
                target_cfg=target.cfg,
                spec=specs[0],
                key=engine.next_key(),
                sampling=sampling,
                typical=typical,
                max_new_tokens=cfg.max_tokens,
                eos_ids=eos,
                prefill_plan=prefill_plan_for(L, cap=cfg.max_seq_len),
            )

    with Stopwatch() as sw:
        # prefills run INSIDE the generate program (prefill_plan): one
        # dispatch, specialised on the bucketed plan. ONE transfer = the
        # timing barrier AND the host copy of tokens + records (each
        # separate post-loop fetch costs a ~27 ms remote round-trip).
        out_tokens, n, records, iters, d_steps, t_steps = jax.device_get(
            generate()
        )

    n, iters = int(n), int(iters)
    out = out_tokens[:, :n]

    from duodecoding_tpu.utils.debug import log_sd_alignment_replay

    log_sd_alignment_replay(
        "sd_tree", L, n, records.actual_gamma, records.accepted,
        records.emitted, iters, gamma=gamma, max_len=cfg.max_seq_len,
    )

    m = get_empty_metrics()
    m["generated_tokens"] = n - L
    m["draft_forward_times"] = int(d_steps)
    m["target_forward_times"] = int(t_steps)
    # per-lane accounting: gamma drafted per iteration (each of the k lanes
    # reuses the same weight-bound forwards), accepted = winning-chain run
    m["draft_generated_tokens"] = int(records.actual_gamma[:iters].sum())
    m["draft_accepted_tokens"] = int(records.accepted[:iters].sum())
    m["loop_times"] = iters
    if iters:
        m["each_loop_draft_tokens"] = float(records.actual_gamma[:iters].mean())
        m["avg_draft_len"] = float(records.actual_gamma[:iters].mean())
    m["queuing_time"] = int(t_steps) * cfg.batch_delay
    m["computation_time"] = sw.elapsed
    m["draft_entropy_history"] = [float(x) for x in records.draft_entropy[:iters]]
    m["draft_accept_rate_history"] = [
        float(x) for x in records.accept_rate[:iters]
    ]
    m["wall_time"] = sw.elapsed + m["queuing_time"]
    return out, finalize_throughput(m)


@register_suite("sd_tree", aliases=("duodec", "sd_kseq"))
def sd_tree_suite(engine, prompts, tree_k: int = 2, tree_spec=None,
                  posterior_threshold: float = 0.09,
                  posterior_alpha: float = 0.3, **kw):
    """Fused multi-prompt tree-SD evaluation: ONE device program for the
    whole equal-length prompt set (tree_loops.py:tree_generate_suite;
    static single spec only — dynamic-width specs fall back to run()).
    Per-prompt wall is the measured suite wall attributed by
    iteration share (every iteration runs the same catch-up + fork
    drafting + one tree verify, so iterations are the unit of cost)."""
    from duodecoding_tpu.engine.engine import Stopwatch

    cfg = engine.config
    if cfg.temperature != 0.0:
        sampling = engine.sampling
    else:
        sampling = None
    typical = (float(posterior_threshold), float(posterior_alpha))
    draft, target = engine.draft, engine.target
    prompts = np.asarray(prompts)
    gamma = kw.get("gamma") or cfg.gamma
    if tree_spec is not None:
        specs = parse_specs(tree_spec)
        if len(specs) != 1:
            raise SuiteFallback(
                "suite runner supports a single static tree_spec"
            )
        spec = specs[0]
        gamma = len(spec)
    else:
        spec = (int(tree_k),) + (1,) * (gamma - 1)
    lanes = int(np.prod(spec))
    from duodecoding_tpu.engine.tree_loops import spec_layout

    bufs, L = engine.suite_buffer(prompts)
    n_rows = len(spec_layout(spec).offsets)
    if L + cfg.max_tokens + n_rows > cfg.max_seq_len:
        raise ValueError(
            f"sd_tree spec {spec} verifies up to {n_rows} rows per "
            f"iteration: prompt ({L}) + max_tokens ({cfg.max_tokens}) + "
            f"{n_rows} exceeds max_seq_len ({cfg.max_seq_len})"
        )
    if L < gamma + 2:
        raise ValueError(
            f"sd_tree needs prompt_len >= gamma + 2 (catch-up rewind); "
            f"got {L} < {gamma + 2}"
        )
    eos = cfg.eos_ids if kw.get("use_early_stopping") else ()

    d_cache = engine.new_cache(draft, batch=lanes)
    t_cache = engine.new_cache(target)

    with Stopwatch() as sw:
        out_tokens, n, records, iters, d_steps, t_steps = jax.device_get(
            tree_generate_suite(
                draft.params,
                target.params,
                bufs,
                jnp.int32(L),
                d_cache,
                t_cache,
                draft_cfg=draft.cfg,
                target_cfg=target.cfg,
                spec=spec,
                key=engine.next_key(),
                sampling=sampling,
                typical=typical,
                max_new_tokens=cfg.max_tokens,
                eos_ids=eos,
                prefill_plan=prefill_plan_for(L, cap=cfg.max_seq_len),
            )
        )

    total_iters = max(int(iters.sum()), 1)
    results = []
    for p in range(prompts.shape[0]):
        np_, it = int(n[p]), int(iters[p])
        rec = jax.tree.map(lambda a: a[p], records)
        m = get_empty_metrics()
        m["generated_tokens"] = np_ - L
        m["draft_forward_times"] = int(d_steps[p])
        m["target_forward_times"] = int(t_steps[p])
        m["draft_generated_tokens"] = int(rec.actual_gamma[:it].sum())
        m["draft_accepted_tokens"] = int(rec.accepted[:it].sum())
        m["loop_times"] = it
        if it:
            m["each_loop_draft_tokens"] = float(rec.actual_gamma[:it].mean())
            m["avg_draft_len"] = float(rec.actual_gamma[:it].mean())
        m["queuing_time"] = int(t_steps[p]) * cfg.batch_delay
        m["computation_time"] = sw.elapsed * it / total_iters
        m["wall_time"] = m["computation_time"] + m["queuing_time"]
        m["suite_wall_time"] = sw.elapsed
        m["draft_entropy_history"] = [
            float(x) for x in rec.draft_entropy[:it]
        ]
        m["draft_accept_rate_history"] = [
            float(x) for x in rec.accept_rate[:it]
        ]
        results.append((out_tokens[p][:, :np_], finalize_throughput(m)))
    return results
