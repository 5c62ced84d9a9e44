"""DSD — Distributed Speculative Decoding (`dist_spec` / `dsd`).

Reference: src/baselines.py:780-1061. Protocol per iteration:
- iteration 1 uplinks the prompt;
- uplink: the whole token sequence x plus the (top-k-compressed) draft
  probability window for the gamma drafted positions;
- cloud verifies in one batched forward; on reject it resamples from the
  residual locally; a 6-byte reject message is sent when any draft is
  rejected (or the window was budget-clamped);
- downlink: a 4-byte token index per iteration.

The device loop runs entirely on TPU; the transfers are replayed exactly
from the per-iteration records (they depend only on counts).
"""

from __future__ import annotations

from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.modes.common import (
    INT_SIZE,
    PROB_BYTES,
    TOKEN_BYTES,
    make_comm_simulator,
    run_sd_loop,
)
from duodecoding_tpu.engine.registry import register_mode
from duodecoding_tpu.engine.sampling_config import SamplingConfig


@register_mode("dist_spec", aliases=("dsd",))
def dist_spec(
    engine,
    prefix,
    transfer_top_k=300,
    use_early_stopping=False,
    **kw,
):
    cfg = engine.config
    compressed = transfer_top_k is not None and transfer_top_k > 0
    rebuild_top_k = transfer_top_k if compressed else None
    # the reference also sets the draft's sampling top_k filter to
    # transfer_top_k (src/baselines.py:548-558 equivalent in dist_spec)
    draft_sampling = SamplingConfig(
        cfg.temperature,
        transfer_top_k if compressed else cfg.top_k,
        cfg.top_p,
    )
    run = run_sd_loop(
        engine,
        prefix,
        rebuild_top_k=rebuild_top_k,
        draft_sampling=draft_sampling,
        use_early_stopping=use_early_stopping,
    )

    comm = make_comm_simulator(engine)
    V = engine.vocab_size
    prefix_lens = run.prefix_lens()
    sum_top_k = 0.0
    for i in range(run.iters):
        g, a = int(run.actual_gamma[i]), int(run.accepted[i])
        if i == 0:
            comm.transfer(
                run.prompt_len, None, "edge_cloud", token_elem_size=TOKEN_BYTES
            )
        if g <= 0:
            continue  # single-target-step fallback: no transfers
        sum_top_k += transfer_top_k if compressed else cfg.top_k
        # uplink 1: the whole running sequence x
        comm.transfer(
            int(prefix_lens[i]) + g,
            None,
            "edge_cloud",
            token_elem_size=TOKEN_BYTES,
        )
        # uplink 2: the draft prob window (compressed to top-k entries/row)
        comm.transfer(
            None,
            g * V,
            "edge_cloud",
            is_compressed=compressed,
            compressed_k=transfer_top_k,
            prob_elem_size=PROB_BYTES,
            seq_len=g,
        )
        if a < g:
            comm.send_reject_message("edge_cloud")
        last = i == run.iters - 1
        if not (last and run.stopped_early):
            comm.simulate_transfer(INT_SIZE, "edge_cloud")  # downlink index

    m = get_empty_metrics()
    steps = int((run.actual_gamma > 0).sum())
    m["avg_top_k"] = sum_top_k / steps if steps else 0.0
    m["avg_draft_len"] = float(run.actual_gamma.sum()) / steps if steps else 0.0
    m["draft_forward_times"] = run.draft_steps
    m["target_forward_times"] = run.target_steps
    m["generated_tokens"] = run.generated
    m["draft_generated_tokens"] = int(run.actual_gamma.sum())
    m["draft_accepted_tokens"] = int(run.accepted.sum())
    m["loop_times"] = run.iters
    m["communication_time"] = comm.edge_cloud_comm_time
    m["edge_cloud_data_bytes"] = comm.edge_cloud_data
    m["comm_energy"] = comm.total_comm_energy
    m["connect_times"] = comm.connect_times
    m["queuing_time"] = run.target_steps * cfg.batch_delay
    m["computation_time"] = run.elapsed
    m["wall_time"] = run.elapsed + m["queuing_time"] + comm.edge_cloud_comm_time
    m["edge_cloud_bandwidth_history"] = comm.edge_cloud_bandwidth_history.copy()
    m["edge_cloud_topk_history"] = comm.edge_cloud_topk_history.copy()
    m["edge_cloud_draft_len_history"] = comm.edge_cloud_draft_len_history.copy()
    m["draft_entropy_history"] = [float(x) for x in run.draft_entropy]
    m["draft_accept_rate_history"] = [float(x) for x in run.accept_rate]
    return run.tokens, finalize_throughput(m)
