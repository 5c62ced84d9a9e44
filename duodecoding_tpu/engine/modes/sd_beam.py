"""`sd_beam` — dynamic-tree speculative decoding with beam drafting.

EAGLE-2's dynamic candidate tree (reference: src/model/eagle2/cnets.py:
660-800 ``topK_genrate`` — beam expansion + global top-N selection by
cumulative logprob) applied to the engine's standard two-model drafting:
the draft model forks a K-wide beam (one lane per beam on its batch
axis), and the global top-N nodes form the verify tree each iteration —
verify rows go where this iteration's probability mass actually is,
instead of a fixed branch spec (`sd_tree`). Greedy only; output is
token-identical to ``large`` (losslessness contract).

Everything runs inside one device-resident while-loop program
(engine/beam_tree.py) — selection, walk, and commit included.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.beam_tree import beam_tree_generate
from duodecoding_tpu.engine.loops import prefill_plan_for
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.registry import register_mode


@register_mode("sd_beam", aliases=("duodec_beam",))
def sd_beam(engine, prefix, beam_k: int = 8, beam_depth: int = 6,
            n_nodes: int = 32, **kw):
    """Dynamic-tree SD. ``beam_k`` live beams expand ``beam_depth`` levels;
    the global top-``n_nodes`` candidates by cumulative logprob are
    verified in one tree-attention forward."""
    from duodecoding_tpu.engine.engine import Stopwatch, block

    cfg = engine.config
    if cfg.temperature != 0.0:
        raise ValueError(
            "sd_beam is greedy-only (temperature 0); use sd_tree's "
            "typical-acceptance path for sampled tree verification"
        )
    draft, target = engine.draft, engine.target
    tokens, L = engine.token_buffer(prefix)
    K, D, N = int(beam_k), int(beam_depth), int(n_nodes)
    if N > K + D * K * K:
        raise ValueError(f"n_nodes {N} exceeds candidate count {K + D*K*K}")
    if L + cfg.max_tokens + N + 1 > cfg.max_seq_len:
        raise ValueError(
            f"sd_beam verifies {N + 1} rows per iteration: prompt ({L}) + "
            f"max_tokens ({cfg.max_tokens}) + {N + 1} exceeds max_seq_len "
            f"({cfg.max_seq_len})"
        )
    if L < D + 3:
        raise ValueError(
            f"sd_beam needs prompt_len >= beam_depth + 3 (catch-up rewind); "
            f"got {L} < {D + 3}"
        )
    eos = cfg.eos_ids if kw.get("use_early_stopping") else ()

    d_cache = engine.new_cache(draft, batch=K)
    t_cache = engine.new_cache(target)

    with Stopwatch() as sw:
        out_tokens, n, records, iters, d_steps, t_steps = beam_tree_generate(
            draft.params,
            target.params,
            tokens,
            jnp.int32(L),
            d_cache,
            t_cache,
            draft_cfg=draft.cfg,
            target_cfg=target.cfg,
            beam_k=K,
            beam_depth=D,
            n_nodes=N,
            max_new_tokens=cfg.max_tokens,
            eos_ids=eos,
            prefill_plan=prefill_plan_for(L, cap=cfg.max_seq_len),
        )
        # ONE transfer: timing barrier + host copy of tokens and records
        out_tokens, n, records, iters, d_steps, t_steps = jax.device_get(
            (out_tokens, n, records, iters, d_steps, t_steps)
        )

    n, iters = int(n), int(iters)
    out = out_tokens[:, :n]

    from duodecoding_tpu.utils.debug import log_sd_alignment_replay

    log_sd_alignment_replay(
        "sd_beam", L, n, records.actual_gamma, records.accepted,
        records.emitted, iters, gamma=D + 1, max_len=cfg.max_seq_len,
    )

    m = get_empty_metrics()
    m["generated_tokens"] = n - L
    m["draft_forward_times"] = int(d_steps)
    m["target_forward_times"] = int(t_steps)
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
