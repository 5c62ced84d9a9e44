"""`uncertainty_decoding` / `cuhlm` mode driver.

Reference: src/baselines.py:1063-1348. The device loop lives in
engine/cuhlm_loops.py; transfer pricing is replayed per iteration:
- iteration 1 uplinks the prompt;
- every iteration uplinks the whole running sequence x;
- opportunistic accept: 6-byte accept message + token downlink;
- verified reject: 6-byte reject message + k*-compressed prob row;
- every iteration downlinks the continuation token.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from duodecoding_tpu.comm.cuhlm import CUHLMPolicy, PreciseCUHLM
from duodecoding_tpu.engine.cuhlm_loops import cuhlm_generate
from duodecoding_tpu.engine.loops import prefill
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.modes.common import TOKEN_BYTES
from duodecoding_tpu.engine.registry import register_mode
from duodecoding_tpu.engine.sampling_config import SamplingConfig


@register_mode("uncertainty_decoding", aliases=("cuhlm",))
def uncertainty_decoding(
    engine,
    prefix,
    transfer_top_k=300,
    use_early_stopping=False,
    **kw,
):
    from duodecoding_tpu.engine.engine import Stopwatch, block

    cfg = engine.config
    draft, target = engine.draft, engine.target
    tokens, L = engine.token_buffer(prefix)
    eos = cfg.eos_ids if use_early_stopping else ()
    compressed = transfer_top_k is not None and transfer_top_k > 0
    draft_sampling = SamplingConfig(
        cfg.temperature,
        transfer_top_k if compressed else cfg.top_k,
        cfg.top_p,
    )

    d_cache = engine.new_cache(draft)
    t_cache = engine.new_cache(target)
    with Stopwatch() as sw:
        d_cache = prefill(draft.params, draft.cfg, d_cache, tokens[:, :L])
        t_cache = prefill(target.params, target.cfg, t_cache, tokens[:, :L])
        out_tokens, n, rec, iters = cuhlm_generate(
            draft.params,
            target.params,
            tokens,
            jnp.int32(L),
            d_cache,
            t_cache,
            engine.next_key(),
            draft_cfg=draft.cfg,
            target_cfg=target.cfg,
            draft_sampling=draft_sampling,
            target_sampling=engine.sampling,
            verify_vocab=engine.vocab_size,
            uncertainty_threshold=cfg.uncertainty_threshold,
            max_new_tokens=cfg.max_tokens,
            eos_ids=eos,
        )
        block(out_tokens, n)

    n, iters = int(n), int(iters)
    out = np.asarray(out_tokens[:, :n])
    opp = np.asarray(rec.opportunistic[:iters])
    acc = np.asarray(rec.accepted[:iters])
    kstar = np.asarray(rec.k_star[:iters])
    emitted = np.asarray(rec.emitted[:iters])
    unc = np.asarray(rec.uncertainty[:iters])

    if cfg.use_precise_comm_sim:
        comm = PreciseCUHLM(
            bandwidth_hz=1e7,
            channel_gain=1e-8,
            send_power_watt=0.5,
            noise_power_watt=1e-10,
            ntt_ms_edge_cloud=cfg.ntt_ms_edge_cloud,
            ntt_ms_edge_end=cfg.ntt_ms_edge_end,
            vocab_size=engine.vocab_size,
        )
    else:
        comm = CUHLMPolicy(
            bandwidth_edge_cloud=cfg.edge_cloud_bandwidth,
            uncertainty_threshold=cfg.uncertainty_threshold,
            vocab_size=engine.vocab_size,
            dimension="Mbps",
            use_stochastic=cfg.use_stochastic_comm,
            ntt_ms_edge_cloud=cfg.ntt_ms_edge_cloud,
            ntt_ms_edge_end=cfg.ntt_ms_edge_end,
        )

    p = L
    target_forward_times = 0
    prev_opp = False
    for i in range(iters):
        if i == 0:
            comm.transfer(p, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
        # uplink: whole running sequence + this draft token
        comm.transfer(p + 1, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
        if not prev_opp:
            target_forward_times += 1  # the reference's accounting quirk
        if opp[i]:
            comm.send_accept_message("edge_cloud")
        else:
            if not acc[i]:
                comm.send_reject_message("edge_cloud")
                comm.transfer(
                    None,
                    engine.vocab_size,
                    "edge_cloud",
                    is_compressed=True,
                    compressed_k=int(kstar[i]),
                    prob_elem_size=4,
                    seq_len=1,
                )
        comm.transfer(1, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
        prev_opp = bool(opp[i])
        p += int(emitted[i])

    m = get_empty_metrics()
    m["draft_forward_times"] = iters
    m["target_forward_times"] = target_forward_times
    m["generated_tokens"] = n - L
    m["draft_generated_tokens"] = iters
    m["draft_accepted_tokens"] = int(acc.sum())
    m["loop_times"] = iters
    m["queuing_time"] = iters * cfg.batch_delay
    m["computation_time"] = sw.elapsed
    m["communication_time"] = comm.edge_cloud_comm_time
    m["wall_time"] = sw.elapsed + m["queuing_time"] + comm.edge_cloud_comm_time
    m["edge_end_comm_time"] = comm.edge_end_comm_time
    m["edge_cloud_data_bytes"] = comm.edge_cloud_data
    m["edge_end_data_bytes"] = comm.edge_end_data
    m["cloud_end_data_bytes"] = comm.cloud_end_data
    m["comm_energy"] = comm.total_comm_energy
    m["connect_times"] = comm.connect_times
    m["edge_cloud_bandwidth_history"] = comm.edge_cloud_bandwidth_history.copy()
    m["edge_cloud_topk_history"] = comm.edge_cloud_topk_history.copy()
    m["edge_cloud_draft_len_history"] = comm.edge_cloud_draft_len_history.copy()
    m["draft_entropy_history"] = [float(x) for x in unc]
    return out, finalize_throughput(m)
