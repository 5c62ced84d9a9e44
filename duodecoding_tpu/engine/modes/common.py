"""Shared host-side runner for the two-tier SD device loop + replay helpers."""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from duodecoding_tpu.engine.loops import prefill_plan_for, sd_generate
from duodecoding_tpu.engine.sampling_config import SamplingConfig

TOKEN_BYTES = 8  # reference token tensors are torch.long (8 B/elem)
# Probability payloads are priced at the model dtype's element size, like
# the reference's `prob.element_size()` (src/communication.py:413-414);
# the reference loads every model in bfloat16 (src/engine.py:261), so its
# prob rows are 2 B/elem.
PROB_BYTES = 2
INT_SIZE = 4  # reference src/metrics.py:3 (index/control scalars)


@dataclasses.dataclass
class SDRun:
    tokens: np.ndarray  # [1, n_final]
    prompt_len: int
    n_final: int
    iters: int
    actual_gamma: np.ndarray  # [iters]
    accepted: np.ndarray  # [iters]
    emitted: np.ndarray  # [iters]
    draft_entropy: np.ndarray
    target_entropy: np.ndarray
    accept_rate: np.ndarray
    draft_steps: int
    target_steps: int
    elapsed: float
    stopped_early: bool  # EOS fired inside the last iteration

    @property
    def generated(self) -> int:
        return self.n_final - self.prompt_len

    def prefix_lens(self) -> np.ndarray:
        """prefix length at the start of each iteration."""
        return self.prompt_len + np.concatenate(
            [[0], np.cumsum(self.emitted[:-1])]
        ).astype(np.int64)


def run_sd_loop(
    engine,
    prefix,
    *,
    gamma: int | None = None,
    rebuild_top_k: int | None = None,
    draft_sampling: SamplingConfig | None = None,
    use_early_stopping: bool = False,
) -> SDRun:
    from duodecoding_tpu.engine.engine import Stopwatch

    cfg = engine.config
    draft, target = engine.draft, engine.target
    tokens, L = engine.token_buffer(prefix)
    gamma = gamma if gamma is not None else cfg.gamma
    eos = cfg.eos_ids if use_early_stopping else ()

    d_cache = engine.new_cache(draft)
    t_cache = engine.new_cache(target)

    with Stopwatch() as sw:
        # prefills run INSIDE sd_generate (prefill_plan): one dispatch,
        # specialised on the bucketed plan (not the exact prompt length)
        out_tokens, n, records, iters, d_steps, t_steps = sd_generate(
            draft.params,
            target.params,
            tokens,
            jnp.int32(L),
            d_cache,
            t_cache,
            engine.next_key(),
            draft_cfg=draft.cfg,
            target_cfg=target.cfg,
            gamma=gamma,
            draft_sampling=draft_sampling or engine.sampling,
            target_sampling=engine.sampling,
            rebuild_top_k=rebuild_top_k,
            max_new_tokens=cfg.max_tokens,
            eos_ids=eos,
            prefill_plan=prefill_plan_for(L, cap=cfg.max_seq_len),
        )
        # ONE transfer = the timing barrier AND the host copy of every
        # output (tokens + all records): each separate post-loop fetch
        # costs a ~27 ms round-trip on the remote backend, and this path
        # paid ~10 of them per run before being fused
        import jax

        out_tokens, n, records, iters, d_steps, t_steps = jax.device_get(
            (out_tokens, n, records, iters, d_steps, t_steps)
        )

    n, iters = int(n), int(iters)
    out = out_tokens[:, :n]
    stopped_early = bool(eos) and any(int(t) in eos for t in out[0, L:])
    return SDRun(
        tokens=out,
        prompt_len=L,
        n_final=n,
        iters=iters,
        actual_gamma=np.asarray(records.actual_gamma[:iters]),
        accepted=np.asarray(records.accepted[:iters]),
        emitted=np.asarray(records.emitted[:iters]),
        draft_entropy=np.asarray(records.draft_entropy[:iters]),
        target_entropy=np.asarray(records.target_entropy[:iters]),
        accept_rate=np.asarray(records.accept_rate[:iters]),
        draft_steps=int(d_steps),
        target_steps=int(t_steps),
        elapsed=sw.elapsed,
        stopped_early=stopped_early,
    )


def make_comm_simulator(engine, kind: str = "standard", **overrides):
    """Build the comm simulator a distributed mode uses, mirroring the
    per-mode constructor calls in the reference (src/baselines.py:519-547,
    796-813)."""
    from duodecoding_tpu.comm import CommSimulator, PreciseCommSimulator

    cfg = engine.config
    if cfg.use_precise_comm_sim:
        return PreciseCommSimulator(
            bandwidth_hz=1e7,
            channel_gain=1e-8,
            send_power_watt=0.5,
            noise_power_watt=1e-10,
            ntt_ms_edge_cloud=cfg.ntt_ms_edge_cloud,
            ntt_ms_edge_end=cfg.ntt_ms_edge_end,
        )
    kwargs = dict(
        bandwidth_edge_cloud=cfg.edge_cloud_bandwidth,
        bandwidth_edge_end=cfg.edge_end_bandwidth,
        bandwidth_cloud_end=cfg.cloud_end_bandwidth,
        dimension="Mbps",
        ntt_ms_edge_cloud=cfg.ntt_ms_edge_cloud,
        ntt_ms_edge_end=cfg.ntt_ms_edge_end,
        use_stochastic=cfg.use_stochastic_comm,
    )
    kwargs.update(overrides)
    return CommSimulator(**kwargs)
