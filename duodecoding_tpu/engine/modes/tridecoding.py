"""`tridecoding` — three-tier staged speculative decoding mode driver.

Reference: src/baselines.py:1350-1739. The device loop lives in
engine/tri_loops.py; this driver replays the reference's per-link transfer
schedule from the iteration records:

- prompt uplink on edge_end before the loop;
- stage 1 (edge_end): gamma2 ids + scalar q values up; compressed little
  prob row down on reject; index + token down always;
- stage 2 (edge_cloud): carried-token ids up (whole prefix on iteration 1),
  total_gamma ids + scalar q values up, compressed draft prob row down on
  reject, index + token down on BOTH links (the end tier also needs the
  verified continuation).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

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
from duodecoding_tpu.engine.tri_loops import tridecoding_generate


@dataclasses.dataclass
class TriRun:
    tokens: np.ndarray
    prompt_len: int
    n_final: int
    iters: int
    little_gamma: np.ndarray
    little_accepted: np.ndarray
    draft_gamma: np.ndarray
    total_gamma: np.ndarray
    draft_accepted: np.ndarray
    emitted: np.ndarray
    s1_all_accept: np.ndarray
    s2_all_accept: np.ndarray
    little_entropy: np.ndarray
    draft_entropy: np.ndarray
    little_accept_rate: np.ndarray
    draft_accept_rate: np.ndarray
    little_steps: int
    draft_steps: int
    target_steps: int
    elapsed: float

    @property
    def generated(self) -> int:
        return self.n_final - self.prompt_len


def run_tri_loop(engine, prefix, *, rebuild_top_k, use_early_stopping=False) -> TriRun:
    from duodecoding_tpu.engine.engine import Stopwatch, block

    cfg = engine.config
    little, draft, target = engine.little, engine.draft, engine.target
    if little is None:
        raise ValueError("tridecoding requires a little tier")
    tokens, L = engine.token_buffer(prefix)
    min_prompt = cfg.gamma1 + cfg.gamma2 + 2
    if L < min_prompt:
        raise ValueError(
            f"tridecoding requires prompt length >= gamma1+gamma2+2 ({min_prompt})"
        )
    eos = cfg.eos_ids if use_early_stopping else ()
    sampling = engine.sampling

    l_cache = engine.new_cache(little)
    d_cache = engine.new_cache(draft)
    t_cache = engine.new_cache(target)

    with Stopwatch() as sw:
        l_cache = prefill(little.params, little.cfg, l_cache, tokens[:, :L])
        d_cache = prefill(draft.params, draft.cfg, d_cache, tokens[:, :L])
        t_cache = prefill(target.params, target.cfg, t_cache, tokens[:, :L])
        out_tokens, n, rec, iters, l_steps, d_steps, t_steps = tridecoding_generate(
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
            little_sampling=SamplingConfig(
                cfg.temperature,
                rebuild_top_k or cfg.top_k,
                cfg.top_p,
            ),
            draft_sampling=sampling,
            target_sampling=sampling,
            rebuild_top_k=rebuild_top_k,
            verify_vocab=engine.vocab_size,
            max_new_tokens=cfg.max_tokens,
            eos_ids=eos,
        )
        block(out_tokens, n)

    n, iters = int(n), int(iters)
    return TriRun(
        tokens=np.asarray(out_tokens[:, :n]),
        prompt_len=L,
        n_final=n,
        iters=iters,
        little_gamma=np.asarray(rec.little_gamma[:iters]),
        little_accepted=np.asarray(rec.little_accepted[:iters]),
        draft_gamma=np.asarray(rec.draft_gamma[:iters]),
        total_gamma=np.asarray(rec.total_gamma[:iters]),
        draft_accepted=np.asarray(rec.draft_accepted[:iters]),
        emitted=np.asarray(rec.emitted[:iters]),
        s1_all_accept=np.asarray(rec.s1_all_accept[:iters]),
        s2_all_accept=np.asarray(rec.s2_all_accept[:iters]),
        little_entropy=np.asarray(rec.little_entropy[:iters]),
        draft_entropy=np.asarray(rec.draft_entropy[:iters]),
        little_accept_rate=np.asarray(rec.little_accept_rate[:iters]),
        draft_accept_rate=np.asarray(rec.draft_accept_rate[:iters]),
        little_steps=int(l_steps),
        draft_steps=int(d_steps),
        target_steps=int(t_steps),
        elapsed=sw.elapsed,
    )


def replay_tri_comm(engine, run: TriRun, comm, transfer_top_k):
    """Replay the reference's transfer schedule (src/baselines.py:1426-1680)."""
    compressed = transfer_top_k is not None and transfer_top_k > 0
    comm.transfer(run.prompt_len, None, "edge_end", token_elem_size=TOKEN_BYTES)
    p = run.prompt_len
    for i in range(run.iters):
        g2 = int(run.little_gamma[i])
        acc1 = int(run.little_accepted[i])
        tg = int(run.total_gamma[i])
        # --- stage 1 (edge_end) ---
        if g2 > 0:
            comm.transfer(
                g2,
                g2,
                "edge_end",
                token_elem_size=TOKEN_BYTES,
                prob_elem_size=PROB_BYTES,
            )
        if not run.s1_all_accept[i]:
            comm.transfer(
                None,
                engine.vocab_size,
                "edge_end",
                is_compressed=compressed,
                compressed_k=transfer_top_k,
                prob_elem_size=PROB_BYTES,
                seq_len=1,
            )
        comm.simulate_transfer(INT_SIZE, "edge_end")
        comm.transfer(1, None, "edge_end", token_elem_size=TOKEN_BYTES)
        # --- stage 2 (edge_cloud) ---
        carried = acc1 + 1
        if i == 0:
            comm.transfer(
                p + carried, None, "edge_cloud", token_elem_size=TOKEN_BYTES
            )
        else:
            comm.transfer(carried, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
        if tg > 0:
            comm.transfer(
                tg,
                tg,
                "edge_cloud",
                token_elem_size=TOKEN_BYTES,
                prob_elem_size=PROB_BYTES,
            )
        if not run.s2_all_accept[i]:
            comm.transfer(
                None,
                engine.vocab_size,
                "edge_cloud",
                is_compressed=compressed,
                compressed_k=transfer_top_k,
                prob_elem_size=PROB_BYTES,
                seq_len=1,
            )
        comm.simulate_transfer(INT_SIZE, "edge_cloud")
        comm.transfer(1, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
        comm.simulate_transfer(INT_SIZE, "edge_end")
        comm.transfer(1, None, "edge_end", token_elem_size=TOKEN_BYTES)
        p += int(run.emitted[i])
    return comm


def tri_metrics(engine, run: TriRun, comm, transfer_top_k):
    cfg = engine.config
    m = get_empty_metrics()
    steps = run.iters
    m["avg_top_k"] = float(transfer_top_k or 0)
    m["avg_draft_len"] = float(run.little_gamma.mean()) if steps else 0.0
    m["little_forward_times"] = run.little_steps
    m["draft_forward_times"] = run.draft_steps
    m["target_forward_times"] = run.target_steps
    m["generated_tokens"] = run.generated
    m["little_generated_tokens"] = int(run.little_gamma.sum())
    m["draft_generated_tokens"] = int(run.total_gamma.sum())
    m["little_accepted_tokens"] = int(run.little_accepted.sum())
    m["draft_accepted_tokens"] = int(run.draft_accepted.sum())
    m["loop_times"] = run.iters
    comm_time = comm.edge_cloud_comm_time + comm.edge_end_comm_time
    m["communication_time"] = comm_time
    m["computation_time"] = run.elapsed
    m["edge_end_comm_time"] = comm.edge_end_comm_time
    m["edge_cloud_data_bytes"] = comm.edge_cloud_data
    m["edge_end_data_bytes"] = comm.edge_end_data
    m["cloud_end_data_bytes"] = comm.cloud_end_data
    m["comm_energy"] = comm.total_comm_energy
    m["connect_times"] = comm.connect_times
    m["queuing_time"] = run.target_steps * cfg.batch_delay
    m["wall_time"] = run.elapsed + comm_time + m["queuing_time"]
    m["edge_cloud_bandwidth_history"] = comm.edge_cloud_bandwidth_history.copy()
    m["edge_cloud_topk_history"] = comm.edge_cloud_topk_history.copy()
    m["edge_cloud_draft_len_history"] = comm.edge_cloud_draft_len_history.copy()
    m["little_entropy_history"] = [float(x) for x in run.little_entropy]
    m["draft_entropy_history"] = [float(x) for x in run.draft_entropy]
    m["little_accept_rate_history"] = [float(x) for x in run.little_accept_rate]
    m["draft_accept_rate_history"] = [float(x) for x in run.draft_accept_rate]
    return finalize_throughput(m)


@register_mode("tridecoding")
def tridecoding(
    engine,
    prefix,
    transfer_top_k=300,
    use_early_stopping=False,
    **kw,
):
    compressed = transfer_top_k is not None and transfer_top_k > 0
    run = run_tri_loop(
        engine,
        prefix,
        rebuild_top_k=transfer_top_k if compressed else None,
        use_early_stopping=use_early_stopping,
    )
    comm = make_comm_simulator(engine, transfer_top_k=transfer_top_k)
    replay_tri_comm(engine, run, comm, transfer_top_k if compressed else None)
    return run.tokens, tri_metrics(engine, run, comm, transfer_top_k)
