"""`adaptive_decoding` — SD with ARP draft-length control + online RL tuning.

Reference: src/baselines.py:2162-2498. Per iteration: draft up to gamma
with the ARP head stopping early; the RL adapter (if enabled) picks
(transfer_top_k, ARP threshold) for the next iteration from live telemetry
(bandwidth, latency, last ARP accept prob, draft entropy, task); the chosen
top-k also compresses the current iteration's reject-row transfer; the
reward is ``exp(min(accepted/steptime, 100)/20) * acc_rate^2``
(src/baselines.py:2375-2396) fed back online.

Serial transfer accounting: one (token id, scalar prob) transfer per
verified position up to and including the first reject, a 6-byte reject
message, the compressed prob row on reject, and a 4-byte index downlink
per iteration (src/baselines.py:2336-2452).

Faithfully replicated quirk: the reference passes bandwidth in BYTES/S and
latency in SECONDS to select_config (which normalizes as if Mbps / ms,
saturating the bandwidth feature) — kept bit-identical so trained agents
transfer (src/baselines.py:2288-2291).
"""

from __future__ import annotations

import math
import time

import numpy as np

import jax.numpy as jnp

from duodecoding_tpu.engine.adaptive_loops import AdaptiveState, adaptive_sd_step
from duodecoding_tpu.engine.loops import prefill
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.modes.common import (
    INT_SIZE,
    PROB_BYTES,
    TOKEN_BYTES,
    make_comm_simulator,
)
from duodecoding_tpu.engine.registry import register_mode
from duodecoding_tpu.engine.sampling_config import SamplingConfig


@register_mode("adaptive_decoding")
def adaptive_decoding(
    engine,
    prefix,
    transfer_top_k=300,
    use_early_stopping=False,
    arp_params=None,
    arp_threshold=0.6,
    rl_adapter=None,
    task_name="unknown",
    disable_rl_update=False,
    **kw,
):
    from duodecoding_tpu.engine.engine import Stopwatch, block

    cfg = engine.config
    draft, target = engine.draft, engine.target
    tokens, L = engine.token_buffer(prefix)
    eos = cfg.eos_ids if use_early_stopping else ()
    use_arp = arp_params is not None
    if not use_arp:
        # no head available: fall back to a pass-through head is not needed;
        # run without early stop (full gamma windows), like the reference
        # without --use_adapter
        from duodecoding_tpu.adaptive import init_arp_head
        import jax as _jax

        arp_params = init_arp_head(_jax.random.PRNGKey(0), draft.cfg.hidden_size, 8)

    comm = make_comm_simulator(engine)
    d_cache = engine.new_cache(draft)
    t_cache = engine.new_cache(target)

    with Stopwatch() as sw_total:
        d_cache = prefill(draft.params, draft.cfg, d_cache, tokens[:, :L])
        t_cache = prefill(target.params, target.cfg, t_cache, tokens[:, :L])

    state = AdaptiveState(
        tokens=tokens,
        n_tokens=jnp.int32(L),
        draft_cache=d_cache,
        target_cache=t_cache,
        key=engine.next_key(),
        done=jnp.zeros((1,), bool),
    )
    limit = L + cfg.max_tokens

    cur_topk = int(transfer_top_k or 0)
    cur_thr = float(arp_threshold)
    compute_time = sw_total.elapsed
    dra_overhead = 0.0
    iters = 0
    drafted_total = 0
    accepted_total = 0
    sum_top_k = 0.0
    sum_draft_len = 0.0
    entropy_hist, accept_rate_hist, topk_hist, draft_len_hist = [], [], [], []

    n_now = L
    done = False
    while n_now < limit and not done:
        t0 = time.perf_counter()
        comm_before = comm.edge_cloud_comm_time
        state, info = adaptive_sd_step(
            draft.params,
            target.params,
            arp_params,
            state,
            jnp.int32(cur_topk),
            jnp.float32(cur_thr),
            jnp.int32(limit),
            draft_cfg=draft.cfg,
            target_cfg=target.cfg,
            gamma=cfg.gamma,
            draft_sampling=engine.sampling,
            target_sampling=engine.sampling,
            verify_vocab=engine.vocab_size,
            eos_ids=eos,
            use_arp=use_arp,
        )
        g = int(info.actual_gamma)
        a = int(info.accepted)
        emitted = int(info.emitted)
        ent = float(info.entropy)
        last_acc = float(info.last_acc_prob)
        done = bool(np.asarray(info.done).all()) if eos else False
        step_compute = time.perf_counter() - t0
        compute_time += step_compute
        iters += 1
        drafted_total += g
        accepted_total += a
        sum_top_k += cur_topk
        sum_draft_len += g
        entropy_hist.append(ent)
        accept_rate_hist.append(a / max(g, 1))
        draft_len_hist.append(g)

        # RL: pick config for the NEXT iteration (reference quirk units kept)
        next_topk, next_thr = cur_topk, cur_thr
        if rl_adapter is not None:
            dra_t0 = time.perf_counter()
            next_topk, next_thr = rl_adapter.select_config(
                comm.bandwidth_edge_cloud,
                comm.ntt_edge_cloud,
                [last_acc],
                ent,
                task_name,
            )
            dra_overhead += time.perf_counter() - dra_t0
        topk_hist.append(cur_topk)

        # --- serial comm accounting for this iteration ---
        rejected = a < g
        for _ in range(a + (1 if rejected else 0)):
            comm.transfer(
                1, 1, "edge_cloud",
                token_elem_size=TOKEN_BYTES, prob_elem_size=PROB_BYTES,
            )
        if rejected:
            comm.send_reject_message("edge_cloud")
            comm.transfer(
                None,
                engine.vocab_size,
                "edge_cloud",
                is_compressed=next_topk > 0,
                compressed_k=next_topk if next_topk > 0 else None,
                prob_elem_size=PROB_BYTES,
                seq_len=1,
            )
        comm.simulate_transfer(INT_SIZE, "edge_cloud")  # downlink token index

        step_comm = comm.edge_cloud_comm_time - comm_before
        if rl_adapter is not None and not disable_rl_update:
            tps_part = a / (step_compute + step_comm + 1e-9)
            reward = math.exp(min(tps_part, 100) / 20.0)
            if g > 1:
                reward *= (a / g) ** 2
            rl_adapter.step(reward)

        cur_topk, cur_thr = next_topk, next_thr
        n_now = int(state.n_tokens)

    block(state.tokens)
    out = np.asarray(state.tokens[:, :n_now])

    m = get_empty_metrics()
    m["avg_top_k"] = sum_top_k / iters if iters else 0.0
    m["avg_draft_len"] = sum_draft_len / iters if iters else 0.0
    m["draft_forward_times"] = drafted_total
    m["target_forward_times"] = iters
    m["generated_tokens"] = n_now - L
    m["draft_generated_tokens"] = drafted_total
    m["draft_accepted_tokens"] = accepted_total
    m["loop_times"] = iters
    m["queuing_time"] = iters * cfg.batch_delay
    m["computation_time"] = compute_time
    m["dra_overhead_time"] = dra_overhead
    m["communication_time"] = comm.edge_cloud_comm_time
    m["wall_time"] = compute_time + comm.edge_cloud_comm_time + m["queuing_time"]
    m["edge_cloud_data_bytes"] = comm.edge_cloud_data
    m["comm_energy"] = comm.total_comm_energy
    m["connect_times"] = comm.connect_times
    m["edge_cloud_bandwidth_history"] = comm.edge_cloud_bandwidth_history.copy()
    m["edge_cloud_topk_history"] = topk_hist
    m["edge_cloud_draft_len_history"] = draft_len_hist
    m["draft_entropy_history"] = entropy_hist
    m["draft_accept_rate_history"] = accept_rate_hist
    m = finalize_throughput(m)
    if rl_adapter is not None:
        rl_adapter.save(m["throughput"])
    return out, m
