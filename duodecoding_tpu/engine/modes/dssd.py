"""DSSD — Distributed Split Speculative Decoding (`dist_split_spec` / `dssd`).

Reference: src/baselines.py:491-778. Protocol per iteration:
- uplink: draft token ids + the scalar q_j(x_j) of each drafted token only
  (collect_verification_payload, src/decoding_ops.py:21-47);
- reject path: a 4-byte position index + the FULL target probability row
  P_j(x) downlink; the device resamples max(P-Q, 0) locally;
- all-accept path: no extra row;
- downlink epilogue: the continuation token + a 4-byte index.

Drafting samples from the top-k rebuilt proposal
(src/baselines.py:612-621 via proposal_top_k).
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


@register_mode("dist_split_spec", aliases=("dssd",))
def dist_split_spec(
    engine,
    prefix,
    transfer_top_k=300,
    use_early_stopping=False,
    **kw,
):
    cfg = engine.config
    compressed = transfer_top_k is not None and transfer_top_k > 0
    rebuild_top_k = transfer_top_k if compressed else None
    # reference: draft top-k filter = transfer_top_k (src/baselines.py:548-552)
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

    # the reference's other links are infinite-bandwidth in this mode
    # (src/baselines.py:528-536)
    comm = make_comm_simulator(
        engine,
        bandwidth_edge_end=float("inf"),
        bandwidth_cloud_end=float("inf"),
    )
    V = engine.vocab_size
    sum_top_k = 0.0
    for i in range(run.iters):
        g, a = int(run.actual_gamma[i]), int(run.accepted[i])
        if g <= 0:
            continue  # single-target-step fallback: no transfers
        sum_top_k += transfer_top_k if compressed else 0
        # uplink: token ids + scalar q(x) per drafted token
        comm.transfer(
            g,
            g,
            "edge_cloud",
            token_elem_size=TOKEN_BYTES,
            prob_elem_size=PROB_BYTES,
        )
        rejected = a < g
        if rejected:
            # reject downlink: position index + full target row
            comm.simulate_transfer(INT_SIZE, "edge_cloud")
            comm.transfer(None, V, "edge_cloud", prob_elem_size=PROB_BYTES)
        last = i == run.iters - 1
        if not (last and run.stopped_early):
            # downlink epilogue: continuation token + index
            comm.transfer(1, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
            comm.simulate_transfer(INT_SIZE, "edge_cloud")

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
