"""Vanilla speculative decoding (`sd`) and its bandwidth-accounted variant.

Reference: src/engine.py:610-805 (`sd`: draft gamma, one verify forward,
rejection sampling, no comm sim) and src/engine.py:807-1014
(`speculative_decoding_with_bandwidth`: the same loop + serial per-token
transfer accounting on the edge_cloud link with reject messages).
"""

from __future__ import annotations

from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.modes.common import (
    PROB_BYTES,
    TOKEN_BYTES,
    make_comm_simulator,
    run_sd_loop,
)
from duodecoding_tpu.engine.registry import register_mode, register_suite


def _base_sd_metrics(engine, run):
    from duodecoding_tpu.utils.debug import log_sd_alignment_replay

    # cache-alignment forensics (env DUODEC_DEBUG_SD_ALIGNMENT=1): the
    # reference logs per-stage cache snapshots inline
    # (src/debug_logs.py:25); the device-resident loop's equivalent is a
    # post-run replay of the same snapshot stream from the SDRecords
    log_sd_alignment_replay(
        "sd", run.prompt_len, run.n_final, run.actual_gamma, run.accepted,
        run.emitted, run.iters, gamma=engine.config.gamma,
        max_len=engine.config.max_seq_len,
    )
    m = get_empty_metrics()
    m["generated_tokens"] = run.generated
    m["draft_forward_times"] = run.draft_steps
    m["target_forward_times"] = run.target_steps
    m["draft_generated_tokens"] = int(run.actual_gamma.sum())
    m["draft_accepted_tokens"] = int(run.accepted.sum())
    m["loop_times"] = run.iters
    if run.iters:
        m["each_loop_draft_tokens"] = float(run.actual_gamma.mean())
        m["avg_draft_len"] = float(run.actual_gamma.mean())
    m["queuing_time"] = run.target_steps * engine.config.batch_delay
    m["computation_time"] = run.elapsed
    m["draft_entropy_history"] = [float(x) for x in run.draft_entropy]
    m["draft_accept_rate_history"] = [float(x) for x in run.accept_rate]
    return m


@register_mode("sd")
def speculative_decoding(engine, prefix, use_early_stopping=False, **kw):
    rebuild_top_k = kw.get("transfer_top_k") or None
    run = run_sd_loop(
        engine,
        prefix,
        rebuild_top_k=rebuild_top_k,
        use_early_stopping=use_early_stopping,
    )
    m = _base_sd_metrics(engine, run)
    m["wall_time"] = run.elapsed + m["queuing_time"]
    return run.tokens, finalize_throughput(m)


@register_suite("sd")
def sd_suite(engine, prompts, use_early_stopping=False, **kw):
    """Fused multi-prompt chain-SD evaluation: ONE device program for the
    whole equal-length prompt set (loops.py:sd_generate_suite) — same
    launch-floor amortization as the `large`/`sd_tree` suite runners.
    Per-prompt wall is the measured suite wall attributed by iteration
    share (every iteration runs gamma draft forwards + one verify, so
    iterations are the unit of cost)."""
    import jax
    import jax.numpy as jnp

    from duodecoding_tpu.engine.engine import Stopwatch
    from duodecoding_tpu.engine.loops import (
        prefill_plan_for,
        sd_generate_suite,
    )
    from duodecoding_tpu.utils.debug import log_sd_alignment_replay

    cfg = engine.config
    draft, target = engine.draft, engine.target
    rebuild_top_k = kw.get("transfer_top_k") or None
    gamma = kw.get("gamma") or cfg.gamma
    bufs, L = engine.suite_buffer(prompts)
    eos = cfg.eos_ids if use_early_stopping else ()
    d_cache = engine.new_cache(draft)
    t_cache = engine.new_cache(target)

    with Stopwatch() as sw:
        out_tokens, n, records, iters, d_steps, t_steps = jax.device_get(
            sd_generate_suite(
                draft.params,
                target.params,
                bufs,
                jnp.int32(L),
                d_cache,
                t_cache,
                engine.next_key(),
                draft_cfg=draft.cfg,
                target_cfg=target.cfg,
                gamma=gamma,
                draft_sampling=engine.sampling,
                target_sampling=engine.sampling,
                rebuild_top_k=rebuild_top_k,
                max_new_tokens=cfg.max_tokens,
                eos_ids=eos,
                prefill_plan=prefill_plan_for(L, cap=cfg.max_seq_len),
            )
        )

    import numpy as np

    total_iters = max(int(iters.sum()), 1)
    results = []
    for p in range(prompts.shape[0]):
        np_, it = int(n[p]), int(iters[p])
        rec = jax.tree.map(lambda a: a[p], records)
        log_sd_alignment_replay(
            "sd", L, np_, rec.actual_gamma, rec.accepted, rec.emitted,
            it, gamma=gamma, max_len=cfg.max_seq_len,
        )
        m = get_empty_metrics()
        m["generated_tokens"] = np_ - L
        m["draft_forward_times"] = int(d_steps[p])
        m["target_forward_times"] = int(t_steps[p])
        m["draft_generated_tokens"] = int(rec.actual_gamma[:it].sum())
        m["draft_accepted_tokens"] = int(rec.accepted[:it].sum())
        m["loop_times"] = it
        if it:
            m["each_loop_draft_tokens"] = float(
                rec.actual_gamma[:it].mean()
            )
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


@register_mode("speculative_decoding_with_bandwidth", aliases=("sd_bandwidth",))
def sd_with_bandwidth(
    engine,
    prefix,
    transfer_top_k=300,
    use_early_stopping=False,
    **kw,
):
    """`sd` + serial transfer accounting: for each verified position up to
    the first reject (inclusive), one (token id, prob row) transfer on the
    edge_cloud link; a 6-byte reject message when any draft is rejected
    (reference src/engine.py:807-1014, serial mode of
    src/decoding_ops.py:313-322)."""
    cfg = engine.config
    rebuild_top_k = transfer_top_k if (transfer_top_k or 0) > 0 else None
    run = run_sd_loop(
        engine,
        prefix,
        rebuild_top_k=rebuild_top_k,
        use_early_stopping=use_early_stopping,
    )

    comm = make_comm_simulator(engine)
    V = engine.vocab_size
    for i in range(run.iters):
        g, a = int(run.actual_gamma[i]), int(run.accepted[i])
        if g <= 0:
            continue
        rejected = a < g
        if rejected:
            comm.send_reject_message("edge_cloud")
        # serial transfers: accepted tokens + the rejected one (if any)
        for _ in range(a + (1 if rejected else 0)):
            comm.transfer(
                1,
                V,
                "edge_cloud",
                token_elem_size=TOKEN_BYTES,
                prob_elem_size=PROB_BYTES,
            )

    m = _base_sd_metrics(engine, run)
    m["communication_time"] = comm.edge_cloud_comm_time
    m["edge_cloud_data_bytes"] = comm.edge_cloud_data
    m["connect_times"] = comm.connect_times
    m["comm_energy"] = comm.total_comm_energy
    m["wall_time"] = run.elapsed + m["queuing_time"] + comm.edge_cloud_comm_time
    m["edge_cloud_bandwidth_history"] = comm.edge_cloud_bandwidth_history.copy()
    return run.tokens, finalize_throughput(m)
