"""`cee_cuhlm` mode driver — tri-tier CUHLM uncertainty gating.

Reference: src/baselines.py:3078-3541. Device loop in
engine/cee_cuhlm_loops.py; the host replays the reference's schedule:
- per-stage uplink of drafted ids + scalar q values;
- per accepted token: an 8-byte ack payload + 6-byte accept message;
- on reject: an (8 + k*·4)-byte payload + 6-byte reject message, where k*
  is the device-computed compressed-vocabulary size for that position;
- merged per-stage downlink (index + token + compressed prob row +
  reject overhead in one RTT), plus the edge_end continuation downlink.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from duodecoding_tpu.comm.cuhlm import CUHLMPolicy
from duodecoding_tpu.engine.cee_cuhlm_loops import cee_cuhlm_generate
from duodecoding_tpu.engine.loops import prefill
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.modes.common import (
    INT_SIZE,
    PROB_BYTES,
    TOKEN_BYTES,
)
from duodecoding_tpu.engine.registry import register_mode


@register_mode("cee_cuhlm")
def cee_cuhlm(
    engine,
    prefix,
    transfer_top_k=300,
    use_early_stopping=False,
    little_threshold=None,
    draft_threshold=None,
    **kw,
):
    from duodecoding_tpu.engine.engine import Stopwatch, block

    cfg = engine.config
    little, draft, target = engine.little, engine.draft, engine.target
    if little is None:
        raise ValueError("cee_cuhlm requires a little tier")
    tokens, L = engine.token_buffer(prefix)
    if L < cfg.gamma1 + cfg.gamma2 + 2:
        raise ValueError("cee_cuhlm requires prompt length >= gamma1+gamma2+2")
    eos = cfg.eos_ids if use_early_stopping else ()
    compressed = transfer_top_k is not None and transfer_top_k > 0
    k = transfer_top_k if compressed else None
    lthr = float(
        little_threshold if little_threshold is not None else cfg.uncertainty_threshold
    )
    dthr = float(
        draft_threshold if draft_threshold is not None else cfg.uncertainty_threshold
    )

    l_cache = engine.new_cache(little)
    d_cache = engine.new_cache(draft)
    t_cache = engine.new_cache(target)
    with Stopwatch() as sw:
        l_cache = prefill(little.params, little.cfg, l_cache, tokens[:, :L])
        d_cache = prefill(draft.params, draft.cfg, d_cache, tokens[:, :L])
        t_cache = prefill(target.params, target.cfg, t_cache, tokens[:, :L])
        out_tokens, n, rec, iters = cee_cuhlm_generate(
            little.params,
            draft.params,
            target.params,
            tokens,
            jnp.int32(L),
            l_cache,
            d_cache,
            t_cache,
            engine.next_key(),
            little_cfg=little.cfg,
            draft_cfg=draft.cfg,
            target_cfg=target.cfg,
            gamma1=cfg.gamma1,
            gamma2=cfg.gamma2,
            sampling=engine.sampling,
            little_top_k=k,
            draft_top_k=k,
            little_threshold=lthr,
            draft_threshold=dthr,
            verify_vocab=engine.vocab_size,
            max_new_tokens=cfg.max_tokens,
            eos_ids=eos,
        )
        block(out_tokens, n)

    n, iters = int(n), int(iters)
    out = np.asarray(out_tokens[:, :n])
    r = {f: np.asarray(getattr(rec, f)[:iters]) for f in rec._fields}

    comm = CUHLMPolicy(
        bandwidth_edge_cloud=cfg.edge_cloud_bandwidth,
        bandwidth_edge_end=cfg.edge_end_bandwidth,
        bandwidth_cloud_end=cfg.cloud_end_bandwidth,
        uncertainty_threshold=cfg.uncertainty_threshold,
        vocab_size=engine.vocab_size,
        dimension="Mbps",
        use_stochastic=cfg.use_stochastic_comm,
        ntt_ms_edge_cloud=cfg.ntt_ms_edge_cloud,
        ntt_ms_edge_end=cfg.ntt_ms_edge_end,
    )
    V = engine.vocab_size
    comm.transfer(L, None, "edge_end", token_elem_size=TOKEN_BYTES)
    p = L
    for i in range(iters):
        for stage, link in (("1", "edge_end"), ("2", "edge_cloud")):
            if stage == "1":
                g, a = int(r["little_gamma"][i]), int(r["little_accepted"][i])
                all_acc = bool(r["s1_all_accept"][i])
                kstar = int(r["k1_star"][i])
            else:
                carried = int(r["little_accepted"][i]) + 1
                if i == 0:
                    comm.transfer(
                        p + carried, None, link, token_elem_size=TOKEN_BYTES
                    )
                else:
                    comm.transfer(carried, None, link, token_elem_size=TOKEN_BYTES)
                g, a = int(r["total_gamma"][i]), int(r["draft_accepted"][i])
                all_acc = bool(r["s2_all_accept"][i])
                kstar = int(r["k2_star"][i])
            if g > 0:
                comm.transfer(
                    g, g, link,
                    token_elem_size=TOKEN_BYTES, prob_elem_size=PROB_BYTES,
                )
                for _ in range(a):
                    comm.simulate_transfer(8, link)
                    comm.send_accept_message(link)
                if not all_acc:
                    comm.simulate_transfer(8 + kstar * PROB_BYTES, link)
                    comm.send_reject_message(link)
            prob_bytes = 0.0
            rej = 0.0
            if not all_acc:
                prob_bytes = (k or V) * PROB_BYTES if compressed else V * PROB_BYTES
                rej = 6.0
            comm.simulate_transfer(
                INT_SIZE + TOKEN_BYTES + prob_bytes + rej, link
            )
        comm.simulate_transfer(INT_SIZE + TOKEN_BYTES, "edge_end")
        p += int(r["emitted"][i])

    m = get_empty_metrics()
    m["avg_top_k"] = float(transfer_top_k or 0)
    m["avg_draft_len"] = float(r["little_gamma"].mean()) if iters else 0.0
    m["little_forward_times"] = int(r["little_gamma"].sum())
    m["draft_forward_times"] = int(r["draft_gamma"].sum()) + iters
    m["target_forward_times"] = iters
    m["generated_tokens"] = n - L
    m["little_generated_tokens"] = int(r["little_gamma"].sum())
    m["draft_generated_tokens"] = int(r["total_gamma"].sum())
    m["little_accepted_tokens"] = int(r["little_accepted"].sum())
    m["draft_accepted_tokens"] = int(r["draft_accepted"].sum())
    m["loop_times"] = iters
    comm_time = comm.edge_cloud_comm_time + comm.edge_end_comm_time
    m["communication_time"] = comm_time
    m["computation_time"] = sw.elapsed
    m["edge_end_comm_time"] = comm.edge_end_comm_time
    m["edge_cloud_data_bytes"] = comm.edge_cloud_data
    m["edge_end_data_bytes"] = comm.edge_end_data
    m["cloud_end_data_bytes"] = comm.cloud_end_data
    m["comm_energy"] = comm.total_comm_energy
    m["connect_times"] = comm.connect_times
    m["queuing_time"] = iters * cfg.batch_delay
    m["wall_time"] = sw.elapsed + comm_time + m["queuing_time"]
    m["edge_cloud_bandwidth_history"] = comm.edge_cloud_bandwidth_history.copy()
    m["edge_cloud_topk_history"] = [int(x) for x in r["k2_star"]]
    m["edge_cloud_draft_len_history"] = [int(x) for x in r["total_gamma"]]
    m["little_entropy_history"] = [float(x) for x in r["little_entropy"]]
    m["draft_entropy_history"] = [float(x) for x in r["draft_entropy"]]
    return out, finalize_throughput(m)
