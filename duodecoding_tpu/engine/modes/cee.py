"""CEE adaptive tri-tier modes: `adaptive_tridecoding` (alias `cee_sd`, the
flagship) and the `ceesd_without_arp` ablation.

Reference: src/baselines.py:2500-3075 (cee_sd) and :1741-2160 (ablation).
Per iteration the device runs one fused two-stage step
(engine/adaptive_loops.py:adaptive_tri_step); the host then:

- runs the little RL adapter (tunes the stage-1 ARP threshold) and the
  main RL adapter (tunes transfer_top_k AND the stage-2 ARP threshold)
  on live telemetry, with the reference's reward
  ``exp(min(accepted/steptime, 100)/20) * acc_rate^2`` per stage;
- replays the transfer schedule, including the merged RTT downlinks
  (index + token + reject-overhead + compressed prob row in ONE transfer,
  reference src/baselines.py:2976-2986).

In `ceesd_without_arp` the RL agents steer gamma1/gamma2 directly (their
top-k action is reinterpreted as the stage gamma, reference
src/baselines.py:1855-1859) and no ARP heads run.

Timing note: the reference times stage 1 and stage 2 separately for the
two rewards; the fused device step yields one wall time per iteration,
split between stages proportionally to their forward counts.
"""

from __future__ import annotations

import math
import time

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.adaptive_loops import adaptive_tri_step
from duodecoding_tpu.engine.loops import prefill
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.modes.common import (
    INT_SIZE,
    PROB_BYTES,
    TOKEN_BYTES,
    make_comm_simulator,
)
from duodecoding_tpu.engine.registry import register_mode
from duodecoding_tpu.engine.tri_loops import TriState, init_tri_records


def _shaped_reward(accepted, step_time, step_comm, gamma):
    tps_part = accepted / (step_time + step_comm + 1e-9)
    reward = math.exp(min(tps_part, 100) / 20.0)
    if gamma > 1:
        reward *= (accepted / gamma) ** 2
    return reward


def _run_cee_loop(
    engine,
    prefix,
    *,
    transfer_top_k,
    use_early_stopping,
    little_arp_params,
    draft_arp_params,
    little_threshold,
    draft_threshold,
    little_rl,
    main_rl,
    task_name,
    disable_rl_update,
    rl_controls_gammas,
):
    from duodecoding_tpu.engine.engine import Stopwatch, block

    cfg = engine.config
    little, draft, target = engine.little, engine.draft, engine.target
    if little is None:
        raise ValueError("cee modes require a little tier")
    tokens, L = engine.token_buffer(prefix)
    min_prompt = cfg.gamma1 + cfg.gamma2 + 2
    if L < min_prompt:
        raise ValueError(f"cee modes require prompt length >= {min_prompt}")
    eos = cfg.eos_ids if use_early_stopping else ()

    use_little_arp = little_arp_params is not None and not rl_controls_gammas
    use_draft_arp = draft_arp_params is not None and not rl_controls_gammas
    if little_arp_params is None:
        little_arp_params = __import__(
            "duodecoding_tpu.adaptive", fromlist=["init_arp_head"]
        ).init_arp_head(jax.random.PRNGKey(0), little.cfg.hidden_size, 8)
    if draft_arp_params is None:
        draft_arp_params = __import__(
            "duodecoding_tpu.adaptive", fromlist=["init_arp_head"]
        ).init_arp_head(jax.random.PRNGKey(1), draft.cfg.hidden_size, 8)

    comm = make_comm_simulator(engine, transfer_top_k=transfer_top_k)
    compressed = transfer_top_k is not None and transfer_top_k > 0

    l_cache = engine.new_cache(little)
    d_cache = engine.new_cache(draft)
    t_cache = engine.new_cache(target)
    with Stopwatch() as sw0:
        l_cache = prefill(little.params, little.cfg, l_cache, tokens[:, :L])
        d_cache = prefill(draft.params, draft.cfg, d_cache, tokens[:, :L])
        t_cache = prefill(target.params, target.cfg, t_cache, tokens[:, :L])

    comm.transfer(L, None, "edge_end", token_elem_size=TOKEN_BYTES)  # prompt

    state = TriState(
        tokens=tokens,
        n_tokens=jnp.int32(L),
        little_cache=l_cache,
        draft_cache=d_cache,
        target_cache=t_cache,
        key=engine.next_key(),
        done=jnp.zeros((1,), bool),
        it=jnp.int32(0),
        little_steps=jnp.int32(0),
        draft_steps=jnp.int32(0),
        target_steps=jnp.int32(0),
        records=init_tri_records(cfg.max_tokens),
    )
    limit = L + cfg.max_tokens

    cur_topk = int(transfer_top_k or 0)
    cur_lthr = float(little_threshold)
    cur_dthr = float(draft_threshold)
    cur_g1 = cfg.gamma1
    cur_g2 = cfg.gamma2
    compute_time = sw0.elapsed
    dra_overhead = 0.0
    iters = 0
    done = False
    n_now = L
    V = engine.vocab_size

    hist = {
        "little_entropy": [], "draft_entropy": [],
        "little_accept_rate": [], "draft_accept_rate": [],
        "topk": [], "draft_len": [],
    }
    totals = dict(
        little_fwd=0, draft_fwd=0, target_fwd=0,
        little_gen=0, draft_gen=0, little_acc=0, draft_acc=0,
        sum_top_k=0.0, sum_draft_len=0.0,
    )

    while n_now < limit and not done:
        t0 = time.perf_counter()
        ee_before = comm.edge_end_comm_time
        ec_before = comm.edge_cloud_comm_time
        state = adaptive_tri_step(
            little.params,
            draft.params,
            target.params,
            little_arp_params,
            draft_arp_params,
            state,
            jnp.int32(cur_topk),
            jnp.float32(cur_lthr),
            jnp.float32(cur_dthr),
            jnp.int32(cur_g1),
            jnp.int32(cur_g2),
            little_cfg=little.cfg,
            draft_cfg=draft.cfg,
            target_cfg=target.cfg,
            gamma1=cfg.gamma1,
            gamma2=cfg.gamma2,
            little_sampling=engine.sampling,
            draft_sampling=engine.sampling,
            target_sampling=engine.sampling,
            verify_vocab=V,
            eos_ids=eos,
            use_little_arp=use_little_arp,
            use_draft_arp=use_draft_arp,
        )
        i = iters
        rec = jax.device_get(
            jax.tree.map(lambda a: a[i], state.records)
        )
        n_now = int(state.n_tokens)
        done = bool(np.asarray(state.done).all()) if eos else False
        step_time = time.perf_counter() - t0
        compute_time += step_time
        iters += 1

        g2a, acc1 = int(rec.little_gamma), int(rec.little_accepted)
        g1a, tg, acc2 = int(rec.draft_gamma), int(rec.total_gamma), int(rec.draft_accepted)
        s1_all, s2_all = bool(rec.s1_all_accept), bool(rec.s2_all_accept)
        carried = acc1 + 1

        # split the fused step time between stages by forward counts
        fwd1, fwd2 = g2a + 1, g1a + 1
        t_stage1 = step_time * fwd1 / max(fwd1 + fwd2, 1)
        t_stage2 = step_time - t_stage1

        totals["little_fwd"] += g2a
        totals["draft_fwd"] += g1a + 1
        totals["target_fwd"] += 1
        totals["little_gen"] += g2a
        totals["draft_gen"] += tg
        totals["little_acc"] += acc1
        totals["draft_acc"] += acc2
        totals["sum_top_k"] += cur_topk
        totals["sum_draft_len"] += g2a
        hist["little_entropy"].append(float(rec.little_entropy))
        hist["draft_entropy"].append(float(rec.draft_entropy))
        hist["little_accept_rate"].append(float(rec.little_accept_rate))
        hist["draft_accept_rate"].append(float(rec.draft_accept_rate))
        hist["topk"].append(cur_topk)
        hist["draft_len"].append(tg)

        # --- RL selections (configs apply next iteration) ---
        next_topk, next_lthr, next_dthr = cur_topk, cur_lthr, cur_dthr
        next_g1, next_g2 = cur_g1, cur_g2
        if little_rl is not None:
            dt0 = time.perf_counter()
            lk, lt = little_rl.select_config(
                comm.bandwidth_edge_end,
                comm.ntt_edge_end,
                [float(rec.little_acc_prob)],
                float(rec.little_entropy),
                task_name,
            )
            dra_overhead += time.perf_counter() - dt0
            if rl_controls_gammas:
                next_g2 = max(1, min(int(lk), cfg.gamma2))
            else:
                next_lthr = lt
        if main_rl is not None:
            dt0 = time.perf_counter()
            mk, mt = main_rl.select_config(
                comm.bandwidth_edge_cloud,
                comm.ntt_edge_cloud,
                [float(rec.draft_acc_prob)],
                float(rec.draft_entropy),
                task_name,
            )
            dra_overhead += time.perf_counter() - dt0
            if rl_controls_gammas:
                next_g1 = max(1, min(int(mk), cfg.gamma1))
            else:
                next_topk = mk
                next_dthr = mt

        # --- comm replay (reference schedule, merged RTT downlinks) ---
        if g2a > 0:
            comm.transfer(
                g2a, g2a, "edge_end",
                token_elem_size=TOKEN_BYTES, prob_elem_size=PROB_BYTES,
            )
        prob_bytes = 0.0
        rej = 0.0
        if not s1_all:
            prob_bytes = (
                next_topk * PROB_BYTES if compressed and next_topk > 0 else V * PROB_BYTES
            )
            rej = 6.0
        comm.simulate_transfer(
            INT_SIZE + TOKEN_BYTES + prob_bytes + rej, "edge_end"
        )
        ee_delta = comm.edge_end_comm_time - ee_before

        if i == 0:
            comm.transfer(
                L + carried, None, "edge_cloud", token_elem_size=TOKEN_BYTES
            )
        else:
            comm.transfer(carried, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
        if g1a > 0:
            comm.transfer(
                tg, tg, "edge_cloud",
                token_elem_size=TOKEN_BYTES, prob_elem_size=PROB_BYTES,
            )
        prob_bytes = 0.0
        rej = 0.0
        if not s2_all:
            prob_bytes = (
                next_topk * PROB_BYTES if compressed and next_topk > 0 else V * PROB_BYTES
            )
            rej = 6.0
        comm.simulate_transfer(
            INT_SIZE + TOKEN_BYTES + prob_bytes + rej,
            "edge_cloud",
            topk=next_topk,
            draft_len=tg,
        )
        comm.simulate_transfer(INT_SIZE + TOKEN_BYTES, "edge_end")
        ec_delta = comm.edge_cloud_comm_time - ec_before

        # --- rewards ---
        if not disable_rl_update:
            if little_rl is not None:
                little_rl.step(_shaped_reward(acc1, t_stage1, ee_delta, g2a))
            if main_rl is not None:
                main_rl.step(_shaped_reward(acc2, t_stage2, ec_delta, tg))

        cur_topk, cur_lthr, cur_dthr = next_topk, next_lthr, next_dthr
        cur_g1, cur_g2 = next_g1, next_g2

    block(state.tokens)
    out = np.asarray(state.tokens[:, :n_now])

    m = get_empty_metrics()
    m["avg_top_k"] = totals["sum_top_k"] / iters if iters else 0.0
    m["avg_draft_len"] = totals["sum_draft_len"] / iters if iters else 0.0
    m["little_forward_times"] = totals["little_fwd"]
    m["draft_forward_times"] = totals["draft_fwd"]
    m["target_forward_times"] = totals["target_fwd"]
    m["generated_tokens"] = n_now - L
    m["little_generated_tokens"] = totals["little_gen"]
    m["draft_generated_tokens"] = totals["draft_gen"]
    m["little_accepted_tokens"] = totals["little_acc"]
    m["draft_accepted_tokens"] = totals["draft_acc"]
    m["loop_times"] = iters
    comm_time = comm.edge_cloud_comm_time + comm.edge_end_comm_time
    m["communication_time"] = comm_time
    m["computation_time"] = compute_time
    m["dra_overhead_time"] = dra_overhead
    m["edge_end_comm_time"] = comm.edge_end_comm_time
    m["edge_cloud_data_bytes"] = comm.edge_cloud_data
    m["edge_end_data_bytes"] = comm.edge_end_data
    m["cloud_end_data_bytes"] = comm.cloud_end_data
    m["comm_energy"] = comm.total_comm_energy
    m["connect_times"] = comm.connect_times
    m["queuing_time"] = totals["target_fwd"] * cfg.batch_delay
    m["wall_time"] = compute_time + comm_time + m["queuing_time"]
    m["edge_cloud_bandwidth_history"] = comm.edge_cloud_bandwidth_history.copy()
    m["edge_cloud_topk_history"] = hist["topk"]
    m["edge_cloud_draft_len_history"] = hist["draft_len"]
    m["little_entropy_history"] = hist["little_entropy"]
    m["draft_entropy_history"] = hist["draft_entropy"]
    m["little_accept_rate_history"] = hist["little_accept_rate"]
    m["draft_accept_rate_history"] = hist["draft_accept_rate"]
    m = finalize_throughput(m)
    if main_rl is not None:
        main_rl.save(m["throughput"])
    if little_rl is not None:
        little_rl.save(m["throughput"])
    return out, m


@register_mode("adaptive_tridecoding", aliases=("cee_sd",))
def adaptive_tridecoding(
    engine,
    prefix,
    transfer_top_k=300,
    use_early_stopping=False,
    little_arp_params=None,
    draft_arp_params=None,
    little_threshold=0.6,
    draft_threshold=0.6,
    little_rl=None,
    main_rl=None,
    task_name="unknown",
    disable_rl_update=False,
    **kw,
):
    return _run_cee_loop(
        engine,
        prefix,
        transfer_top_k=transfer_top_k,
        use_early_stopping=use_early_stopping,
        little_arp_params=little_arp_params,
        draft_arp_params=draft_arp_params,
        little_threshold=little_threshold,
        draft_threshold=draft_threshold,
        little_rl=little_rl,
        main_rl=main_rl,
        task_name=task_name,
        disable_rl_update=disable_rl_update,
        rl_controls_gammas=False,
    )


@register_mode("ceesd_without_arp")
def ceesd_without_arp(
    engine,
    prefix,
    transfer_top_k=300,
    use_early_stopping=False,
    little_rl=None,
    main_rl=None,
    task_name="unknown",
    disable_rl_update=False,
    **kw,
):
    """Ablation: no ARP heads; the RL agents' k-action steers gamma1/gamma2
    directly (reference src/baselines.py:1855-1859, 1982-1985)."""
    return _run_cee_loop(
        engine,
        prefix,
        transfer_top_k=transfer_top_k,
        use_early_stopping=use_early_stopping,
        little_arp_params=None,
        draft_arp_params=None,
        little_threshold=0.6,
        draft_threshold=0.6,
        little_rl=little_rl,
        main_rl=main_rl,
        task_name=task_name,
        disable_rl_update=disable_rl_update,
        rl_controls_gammas=True,
    )
