"""`eagle2_fused` — device-resident EAGLE-2 decoding.

The host-driven `eagle2` mode (engine/modes/eagle.py) pays several host
round-trips per iteration (beam-array fetch for selection, window build,
hidden fetch) — ~27 ms each on a remote TPU backend, i.e. more than a
whole 13B tree-SD iteration. This mode runs the ENTIRE loop as one
device-resident while program (engine/beam_tree.py::eagle_beam_generate):
feature-net beam expansion (adaptive/eagle.py, reference
src/model/eagle2/cnets.py:660-800 ``topK_genrate``), global top-N
selection by cumulative logprob (cnets.py:755-760), one tree-attention
verify exposing hidden states, greedy walk, commit.

Greedy only; output is token-identical to ``large`` — the same
losslessness contract as `sd_tree`/`sd_beam` (verified in tests against
the host-driven `eagle2`, which shares the beam expansion code path).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.adaptive.eagle import eagle_catchup, init_eagle_cache
from duodecoding_tpu.engine.beam_tree import eagle_beam_generate
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.modes.eagle import _head_matrix, prefill_with_hidden
from duodecoding_tpu.engine.registry import register_mode

SEED_CHUNK = 64  # prompt-pair catch-up chunk (one compile per bucket)


@register_mode("eagle2_fused", aliases=("eagle_fused",))
def eagle2_fused(
    engine,
    prefix,
    eagle_params=None,
    depth: int = 6,
    top_k: int = 8,
    n_nodes: int = 32,
    use_early_stopping=False,
    **kw,
):
    """EAGLE-2 with the full loop on device. ``depth`` beam levels x
    ``top_k`` beams; global top-``n_nodes`` candidates are verified."""
    from duodecoding_tpu.engine.engine import Stopwatch, block

    if eagle_params is None:
        raise ValueError(
            "eagle2_fused requires a trained draft network (eagle_params); "
            "train one with adaptive.eagle.train_eagle"
        )
    cfg = engine.config
    if cfg.temperature != 0.0:
        raise ValueError(
            "eagle2_fused is greedy-only; use the host-driven eagle2 for "
            "typical-acceptance sampling"
        )
    target = engine.target
    tokens, L = engine.token_buffer(prefix)
    K, D, N = int(top_k), int(depth), int(n_nodes)
    if N > K + D * K * K:
        raise ValueError(f"n_nodes {N} exceeds candidate count {K + D*K*K}")
    S = cfg.max_seq_len
    if L + cfg.max_tokens + N + 1 > S:
        raise ValueError(
            f"eagle2_fused verifies {N + 1} rows per iteration: prompt "
            f"({L}) + max_tokens ({cfg.max_tokens}) + {N + 1} exceeds "
            f"max_seq_len ({S})"
        )
    if L + cfg.max_tokens + D * K + D + 2 > S:
        raise ValueError(
            "max_seq_len too small for eagle beam scratch: need >= "
            f"{L + cfg.max_tokens + D * K + D + 2}, have {S}"
        )
    if L < 2:
        raise ValueError("eagle modes need a prompt of at least 2 tokens")
    eos = cfg.eos_ids if use_early_stopping else ()
    d = target.cfg.hidden_size
    embed = target.params["embed"]
    head = _head_matrix(target)
    e_dtype = eagle_params["fc_w"].dtype
    num_layers = eagle_params["layers"]["wq"].shape[0]
    Wc = D + 2

    cache = engine.new_cache(target)
    e_cache = init_eagle_cache(
        target.cfg, 1, S, num_layers=num_layers, dtype=e_dtype
    )

    with Stopwatch() as sw:
        cache, prompt_hid = prefill_with_hidden(
            target.params, target.cfg, cache, tokens[:, :L]
        )
        # seed the feature cache over prompt pairs 0..M-2; the final pair
        # becomes the loop's initial catch-up window (valid = 1)
        host_tokens = np.asarray(tokens[0, :L])
        M = L - 1
        pos = 0
        while pos < M - 1:
            take = min(SEED_CHUNK, M - 1 - pos)
            pt = np.zeros((1, SEED_CHUNK), np.int32)
            ph = np.zeros((1, SEED_CHUNK, d), np.float32)
            pt[0, :take] = host_tokens[pos + 1 : pos + 1 + take]
            ph[0, :take] = prompt_hid[pos : pos + take]
            e_cache = eagle_catchup(
                eagle_params,
                embed,
                target.cfg,
                e_cache,
                jnp.asarray(pt),
                jnp.asarray(ph, e_dtype),
                jnp.int32(take),
            )
            pos += take
        pt = np.zeros((1, Wc), np.int32)
        ph = np.zeros((1, Wc, d), np.float32)
        pt[0, 0] = host_tokens[L - 1]
        ph[0, 0] = prompt_hid[L - 2]

        out_tokens, n, records, iters, d_steps, t_steps = (
            eagle_beam_generate(
                eagle_params,
                embed,
                head,
                target.params,
                tokens,
                e_cache,
                cache,
                jnp.int32(L),
                jnp.asarray(pt),
                jnp.asarray(ph, e_dtype),
                jnp.int32(1),
                target_cfg=target.cfg,
                beam_k=K,
                beam_depth=D,
                n_nodes=N,
                max_new_tokens=cfg.max_tokens,
                eos_ids=eos,
            )
        )
        # ONE transfer: timing barrier + host copy of tokens and records
        out_tokens, n, records, iters, d_steps, t_steps = jax.device_get(
            (out_tokens, n, records, iters, d_steps, t_steps)
        )

    n, iters = int(n), int(iters)
    out = out_tokens[:, :n]

    from duodecoding_tpu.utils.debug import log_sd_alignment_replay

    log_sd_alignment_replay(
        "eagle2_fused", L, n, records.actual_gamma, records.accepted,
        records.emitted, iters, gamma=D + 1, max_len=S,
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
