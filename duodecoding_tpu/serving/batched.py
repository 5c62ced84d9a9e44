"""Batched decode steps with PER-SLOT sequence lengths.

The reference is strictly batch-1 (SURVEY appendix: `int(x.item())`
scalarization throughout); continuous batching is a new TPU-native
capability (BASELINE.json north star). The single-scalar ``cache.length``
of models/transformer.py generalizes to a per-row ``length [B]`` vector
(models/transformer.py:forward handles both): decode steps write each
row's new KV at its own offset and mask attention per row, so slots at
different positions decode together in one forward — and the serving path
shares ONE forward implementation with the engine modes, inheriting INT4
weights (fused/stacked Pallas kernels) and INT8 KV caches for free.

Speculative batched serving additionally drafts gamma tokens per slot and
verifies them in one batched T=gamma+1 forward with per-row offsets —
batched rejection sampling reuses ops/verify.compute_acceptance, which was
batch-first from the start.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.kv_quant import QuantKVCache, init_quant_cache
from duodecoding_tpu.models.transformer import KVCache, forward, init_cache
from duodecoding_tpu.ops.sampling import norm_logits, sample

# serving caches ARE the engine caches — only the length is a [B] vector
BatchedCache = KVCache


def init_batched_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
    quantized: bool = False,
):
    cache = (
        init_quant_cache(cfg, batch, max_len)
        if quantized
        else init_cache(cfg, batch, max_len, dtype)
    )
    return cache._replace(length=jnp.zeros((batch,), jnp.int32))


def forward_batched(
    params,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T] — T new tokens per row, at row offsets
    cache,
    active: jax.Array | None = None,  # [B] bool — inactive rows don't advance
):
    """Forward T tokens per row starting at each row's own length — the
    shared transformer forward with a per-row ``cache.length``."""
    return forward(params, cfg, tokens, cache, active=active)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "eos_ids"),
    donate_argnames=("token_buf", "cache"),
)
def batched_decode_step(
    params,
    token_buf: jax.Array,  # [B, S]
    n_tokens: jax.Array,  # [B]
    cache: BatchedCache,
    active: jax.Array,  # [B] bool
    key: jax.Array,
    *,
    cfg: ModelConfig,
    sampling: SamplingConfig,
    eos_ids: tuple[int, ...] = (),
):
    """One continuous-batching AR step: every active slot decodes one token
    at its own position."""
    B = token_buf.shape[0]
    rows = jnp.arange(B)
    last = token_buf[rows, n_tokens - 1][:, None]  # [B, 1]
    logits, cache = forward_batched(params, cfg, last, cache, active)
    probs = norm_logits(
        logits[:, -1, :], sampling.temperature, sampling.top_k, sampling.top_p
    )
    key, k_s = jax.random.split(key)
    if sampling.greedy:
        tok = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    else:
        tok = sample(k_s, probs)[:, 0]
    token_buf = token_buf.at[rows, n_tokens].set(
        jnp.where(active, tok, token_buf[rows, n_tokens])
    )
    n_tokens = jnp.where(active, n_tokens + 1, n_tokens)
    finished = jnp.zeros((B,), bool)
    for e in eos_ids:
        finished = finished | (tok == e)
    finished = finished & active
    return token_buf, n_tokens, cache, key, tok, finished


@functools.partial(jax.jit, static_argnames=("slot",), donate_argnames=("cache",))
def insert_slot(cache, slot_cache, slot: int, length: jax.Array):
    """Insert a freshly prefilled single-request cache ([L, 1, S, H, D],
    dense or int8-quantized) into batch slot ``slot``."""

    def ins(buf, sl):
        return jax.lax.dynamic_update_slice(
            buf, sl, (0, slot) + (0,) * (buf.ndim - 2)
        )

    kw = {"k": ins(cache.k, slot_cache.k), "v": ins(cache.v, slot_cache.v)}
    if isinstance(cache, QuantKVCache):
        kw["k_scale"] = ins(cache.k_scale, slot_cache.k_scale)
        kw["v_scale"] = ins(cache.v_scale, slot_cache.v_scale)
    kw["length"] = cache.length.at[slot].set(length)
    return cache._replace(**kw)


@functools.partial(
    jax.jit, static_argnames=("row0",), donate_argnames=("cache",)
)
def insert_lane_block(cache, block_cache, row0: int, length: jax.Array):
    """Insert a freshly prefilled multi-lane cache ([L, lanes, S, ...])
    at batch rows [row0, row0 + lanes) — tree-serving admission, where a
    slot owns a contiguous block of draft lane rows."""

    def ins(buf, sl):
        return jax.lax.dynamic_update_slice(
            buf, sl, (0, row0) + (0,) * (buf.ndim - 2)
        )

    lanes = block_cache.k.shape[1]
    kw = {"k": ins(cache.k, block_cache.k), "v": ins(cache.v, block_cache.v)}
    if isinstance(cache, QuantKVCache):
        kw["k_scale"] = ins(cache.k_scale, block_cache.k_scale)
        kw["v_scale"] = ins(cache.v_scale, block_cache.v_scale)
    kw["length"] = jax.lax.dynamic_update_slice(
        cache.length,
        jnp.full((lanes,), length, jnp.int32),
        (row0,),
    )
    return cache._replace(**kw)


@functools.partial(
    jax.jit,
    static_argnames=("draft_cfg", "target_cfg", "gamma", "sampling", "eos_ids"),
    donate_argnames=("token_buf", "d_cache", "t_cache"),
)
def spec_batched_step(
    draft_params,
    target_params,
    token_buf: jax.Array,  # [B, S]
    n_tokens: jax.Array,  # [B]
    d_cache: BatchedCache,
    t_cache: BatchedCache,
    active: jax.Array,  # [B] bool
    key: jax.Array,
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    gamma: int,
    sampling: SamplingConfig,
    eos_ids: tuple[int, ...] = (),
):
    """One batched speculative iteration for every active slot: draft gamma
    tokens per row, verify them in one batched T=gamma+1 target forward,
    and commit per-row accepted prefixes + continuation tokens. This is the
    fully vectorized generalization of engine/loops.sd_iteration — no
    row-0 scalarization anywhere, so slots at different depths speculate
    together.
    """
    from duodecoding_tpu.ops.sampling import max_fn
    from duodecoding_tpu.ops.verify import compute_acceptance

    B, S = token_buf.shape
    rows = jnp.arange(B)
    p = n_tokens  # [B]
    Vd = draft_cfg.vocab_size
    verify_vocab = min(draft_cfg.vocab_size, target_cfg.vocab_size)

    # --- draft catch-up: rewind every row to p-2 and forward T=2 ---
    d_cache = d_cache._replace(length=jnp.minimum(d_cache.length, p - 2))
    catch_idx = p[:, None] - 2 + jnp.arange(2)[None, :]
    catch = token_buf[rows[:, None], catch_idx]
    logits, d_cache = forward_batched(draft_params, draft_cfg, catch, d_cache, active)
    q_cur = norm_logits(
        logits[:, -1, :], sampling.temperature, sampling.top_k, sampling.top_p
    )

    # --- drafting as ONE lax.scan (gamma-1 forwards; the last token needs
    # no forward) instead of an unrolled Python loop: one traced body =
    # fast compiles at any gamma (engine/loops.py-style device residency)
    def emit(q, k_s):
        if sampling.greedy:
            return jnp.argmax(q, axis=-1).astype(jnp.int32)
        return sample(k_s, q)[:, 0]

    def draft_step(carry, _):
        q, dc, k = carry
        k, k_s = jax.random.split(k)
        tok = emit(q, k_s)
        logits, dc = forward_batched(
            draft_params, draft_cfg, tok[:, None], dc, active
        )
        q_next = norm_logits(
            logits[:, -1, :], sampling.temperature, sampling.top_k,
            sampling.top_p,
        )
        return (q_next, dc, k), (tok, q)

    (q_last, d_cache, key), (toks_seq, q_seq) = jax.lax.scan(
        draft_step, (q_cur, d_cache, key), None, length=gamma - 1
    )
    key, k_s = jax.random.split(key)
    tok_last = emit(q_last, k_s)
    draft_toks_all = jnp.concatenate(
        [toks_seq.transpose(1, 0), tok_last[:, None]], axis=1
    )  # [B, gamma]
    q_window = jnp.concatenate(
        [q_seq.transpose(1, 0, 2), q_last[:, None, :]], axis=1
    )  # [B, gamma, Vd]

    def write_drafts(buf_row, dr, pos, act):
        cur = jax.lax.dynamic_slice(buf_row, (pos,), (gamma,))
        return jax.lax.dynamic_update_slice(
            buf_row, jnp.where(act, dr, cur), (pos,)
        )

    token_buf = jax.vmap(write_drafts)(token_buf, draft_toks_all, p, active)

    # --- batched verify: T = gamma+1 per row from p-1 ---
    ver_idx = p[:, None] - 1 + jnp.arange(gamma + 1)[None, :]
    ver = token_buf[rows[:, None], ver_idx]
    t_logits, t_cache = forward_batched(target_params, target_cfg, ver, t_cache, active)
    p_window = norm_logits(
        t_logits, sampling.temperature, sampling.top_k, sampling.top_p
    )

    draft_toks = token_buf[rows[:, None], p[:, None] + jnp.arange(gamma)[None, :]]
    key, k_r, k_t = jax.random.split(key, 3)
    r = jax.random.uniform(k_r, (B, gamma))
    acc = compute_acceptance(
        q_window[:, :, :verify_vocab],
        p_window[:, :, :verify_vocab],
        draft_toks,
        r,
        p,
        gamma,
    )
    all_accepted = acc.accepted_count >= gamma
    off = acc.accepted_count
    tgt_row = jnp.take_along_axis(p_window, off[:, None, None], axis=1)[:, 0, :]
    drf_row = jnp.take_along_axis(
        q_window, jnp.minimum(off, gamma - 1)[:, None, None], axis=1
    )[:, 0, :]
    residual = max_fn(tgt_row[:, :verify_vocab] - drf_row[:, :verify_vocab])
    if verify_vocab < target_cfg.vocab_size:
        residual = jnp.concatenate(
            [residual, jnp.zeros((B, target_cfg.vocab_size - verify_vocab))], axis=-1
        )
    final = jnp.where(all_accepted[:, None], tgt_row, residual)
    if sampling.greedy:
        t = jnp.argmax(final, axis=-1).astype(jnp.int32)
    else:
        t = sample(k_t, final)[:, 0]

    n = acc.n  # [B]
    token_buf = token_buf.at[rows, n + 1].set(
        jnp.where(active, t, token_buf[rows, n + 1])
    )
    new_n = jnp.where(active, n + 2, n_tokens)
    d_cache = d_cache._replace(length=jnp.where(active, n + 1, d_cache.length))
    t_cache = t_cache._replace(length=jnp.where(active, n + 1, t_cache.length))

    # per-row EOS over the emitted region [p, new_n)
    finished = jnp.zeros((B,), bool)
    for i in range(gamma + 1):
        pos = p + i
        tok_i = token_buf[rows, pos]
        in_range = pos < new_n
        for e in eos_ids:
            finished = finished | (in_range & (tok_i == e))
    finished = finished & active
    emitted = jnp.where(active, new_n - p, 0)
    accepted = jnp.where(active, acc.accepted_count, 0)
    return token_buf, new_n, d_cache, t_cache, key, emitted, accepted, finished


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampling", "eos_ids", "max_steps"),
    donate_argnames=("token_buf", "cache"),
)
def batched_decode_multi_step(
    params,
    token_buf: jax.Array,  # [B, S]
    n_tokens: jax.Array,  # [B]
    cache: BatchedCache,
    active: jax.Array,  # [B] bool
    deadlines: jax.Array,  # [B] int32 per-slot token limits
    key: jax.Array,
    *,
    cfg: ModelConfig,
    sampling: SamplingConfig,
    eos_ids: tuple[int, ...] = (),
    max_steps: int = 8,
):
    """Fuse up to ``max_steps`` AR steps in ONE dispatch: the device loop
    exits as soon as any slot finishes (EOS or deadline) so the host can
    retire/admit. Amortizes host-dispatch latency ~max_steps-fold when the
    batch is in steady state."""
    B = token_buf.shape[0]
    rows = jnp.arange(B)

    def cond(carry):
        token_buf, n_tokens, cache, act, key, finished, i = carry
        return jnp.logical_and(
            jnp.logical_and(i < max_steps, ~jnp.any(finished)),
            jnp.any(act),
        )

    def body(carry):
        token_buf, n_tokens, cache, act, key, finished, i = carry
        last = token_buf[rows, n_tokens - 1][:, None]
        logits, cache = forward_batched(params, cfg, last, cache, act)
        probs = norm_logits(
            logits[:, -1, :], sampling.temperature, sampling.top_k, sampling.top_p
        )
        key, k_s = jax.random.split(key)
        if sampling.greedy:
            tok = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        else:
            tok = sample(k_s, probs)[:, 0]
        token_buf = token_buf.at[rows, n_tokens].set(
            jnp.where(act, tok, token_buf[rows, n_tokens])
        )
        n_tokens = jnp.where(act, n_tokens + 1, n_tokens)
        fin = jnp.zeros((B,), bool)
        for e in eos_ids:
            fin = fin | (tok == e)
        fin = (fin | (n_tokens >= deadlines)) & act
        return (token_buf, n_tokens, cache, act, key, finished | fin, i + 1)

    init = (
        token_buf,
        n_tokens,
        cache,
        active,
        key,
        jnp.zeros((B,), bool),
        jnp.int32(0),
    )
    token_buf, n_tokens, cache, _, key, finished, steps = jax.lax.while_loop(
        cond, body, init
    )
    return token_buf, n_tokens, cache, key, finished, steps


@functools.partial(
    jax.jit,
    static_argnames=("draft_cfg", "target_cfg", "lanes"),
    donate_argnames=("token_buf", "n_tokens", "d_cache", "t_cache"),
)
def admit_prefill_tree(
    draft_params,
    target_params,
    token_buf: jax.Array,  # [B, S]
    n_tokens: jax.Array,  # [B]
    d_cache,  # [_, B*lanes, S, ...]
    t_cache,  # [_, B, S, ...]
    prompts: jax.Array,  # [B, Lp] int32 — row b valid iff admit[b]
    plens: jax.Array,  # [B] int32 actual prompt lengths (<= Lp)
    admit: jax.Array,  # [B] bool — slots being (re)initialized
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    lanes: int,
):
    """Fused admission: prefill newly-admitted slots DIRECTLY into the
    batched target + draft-lane caches and update the token buffer, all
    in ONE dispatch. The scheduler's original admit path (off-batch
    prefill into a fresh single-slot cache + insert_slot copy + host
    .at[] updates) costs ~8 separate dispatches per request; on remote
    backends each dispatch carries ~85-100 ms of launch/completion
    overhead (tools/fixed_cost_probe.py), which made ADMISSION — not the
    decode loop — the dominant serving cost (the decode iteration itself
    measures 39 ms additive, tools/serving_stage_probe.py).

    Inactive (non-admitted) rows neither write KV nor advance their
    lengths (models/transformer.py forward's ``active`` contract), so
    occupied slots are untouched. Rows are right-padded to the static
    bucket length Lp; KV written past ``plens`` is invisible (attention
    clamps to ``length``) and gets overwritten as decode proceeds."""
    B, S = token_buf.shape
    Lp = prompts.shape[1]

    t_cache = t_cache._replace(
        length=jnp.where(admit, 0, t_cache.length)
    )
    _, t_cache = forward(
        target_params, target_cfg, prompts, t_cache, active=admit
    )
    t_cache = t_cache._replace(
        length=jnp.where(admit, plens - 1, t_cache.length)
    )

    lane_admit = jnp.repeat(admit, lanes)
    d_cache = d_cache._replace(
        length=jnp.where(lane_admit, 0, d_cache.length)
    )
    _, d_cache = forward(
        draft_params, draft_cfg, jnp.repeat(prompts, lanes, axis=0),
        d_cache, active=lane_admit,
    )
    d_cache = d_cache._replace(
        length=jnp.where(lane_admit, jnp.repeat(plens, lanes) - 1,
                         d_cache.length)
    )

    padded = jnp.zeros((B, S), jnp.int32).at[:, :Lp].set(prompts)
    token_buf = jnp.where(admit[:, None], padded, token_buf)
    n_tokens = jnp.where(admit, plens, n_tokens)
    return token_buf, n_tokens, d_cache, t_cache


def _spec_tree_core(
    draft_params,
    target_params,
    token_buf: jax.Array,  # [B, S]
    n_tokens: jax.Array,  # [B]
    d_cache,  # [L, B*lanes, S, ...] per-row lengths (lane rows per slot)
    t_cache,  # [L, B, S, ...] per-row lengths
    active: jax.Array,  # [B] bool
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    spec: tuple[int, ...],
    eos_ids: tuple[int, ...] = (),
):
    """One batched TREE speculative iteration (greedy): every active slot
    fork-drafts the branch-spec tree on its own lane rows, all slots
    verify in ONE tree-attention target forward (shared [T, T] ancestor
    mask + per-row lengths), and each slot commits its own winning chain.

    The vectorized-over-slots generalization of
    engine/tree_loops._tree_branch — the multi-slot serving form of the
    reference's k-sequence drafting (src/model_cpu.py:138-252), which is
    strictly batch-1. Greedy only, like the engine mode's losslessness
    contract; sampled multi-slot serving uses the chain
    ``spec_batched_step``.
    """
    import os

    import numpy as np

    from duodecoding_tpu.engine.tree_loops import spec_layout
    from duodecoding_tpu.ops.sampling import top_k_via_argmax

    # perf-bisect diagnostics (read at TRACE time, like DUODEC_TREE_PROBE):
    # comma-separated stage skips - "nodraft" fakes the chains without the
    # draft forwards, "noverify" fakes target logits, "noreloc" skips the
    # target-cache relocation. Output is WRONG under any probe; only for
    # locating iteration cost on-chip.
    probe = os.environ.get("DUODEC_SERVE_PROBE", "")

    B, S = token_buf.shape
    gamma = len(spec)
    lanes = int(np.prod(spec))
    kmax = max(spec)
    lay = spec_layout(spec)
    T = int(lay.offsets.shape[0])
    verify_vocab = min(draft_cfg.vocab_size, target_cfg.vocab_size)
    rows = jnp.arange(B)
    p = n_tokens  # [B]
    CU = gamma + 2
    lane_active = jnp.repeat(active, lanes)

    if "nodraft" in probe:
        d_cache = d_cache._replace(
            length=jnp.minimum(d_cache.length, jnp.repeat(p, lanes))
        )
        chains = (
            (jnp.arange(B * lanes, dtype=jnp.int32)[:, None] * 7
             + jnp.arange(gamma, dtype=jnp.int32)[None, :] + p[0]) % 1000
        ).reshape(B, lanes, gamma)
        return _tree_verify_commit(
            target_params, token_buf, p, d_cache, t_cache, active, chains,
            target_cfg=target_cfg, spec=spec, eos_ids=eos_ids, probe=probe,
        )

    chains, d_cache = _draft_tree(
        draft_params, token_buf, p, d_cache, lane_active,
        draft_cfg=draft_cfg, spec=spec, verify_vocab=verify_vocab,
    )
    return _tree_verify_commit(
        target_params, token_buf, p, d_cache, t_cache, active, chains,
        target_cfg=target_cfg, spec=spec, eos_ids=eos_ids, probe=probe,
        verify_vocab=verify_vocab,
    )


def _draft_tree(
    draft_params, token_buf, p, d_cache, lane_active, *,
    draft_cfg, spec, verify_vocab,
):
    """Draft half of the batched tree iteration: lane catch-up forward +
    fork-drafting the branch-spec tree on the lane axis. Split out so the
    stage probe (tools/serving_stage_probe.py) times the same code object
    the production step runs."""
    import numpy as np

    from duodecoding_tpu.engine.tree_loops import spec_layout
    from duodecoding_tpu.ops.sampling import top_k_via_argmax

    B, S = token_buf.shape
    gamma = len(spec)
    lanes = int(np.prod(spec))
    kmax = max(spec)
    lay = spec_layout(spec)
    rows = jnp.arange(B)
    CU = gamma + 2

    # --- draft catch-up: rewind every slot's lanes to p-CU, forward CU ---
    lane_p = jnp.repeat(p, lanes)  # [B*lanes]
    d_cache = d_cache._replace(
        length=jnp.minimum(d_cache.length, lane_p - CU)
    )
    catch_idx = p[:, None] - CU + jnp.arange(CU)[None, :]
    catch = token_buf[rows[:, None], catch_idx]  # [B, CU]
    catch_l = jnp.repeat(catch, lanes, axis=0)  # [B*lanes, CU]
    logits, d_cache = forward(
        draft_params, draft_cfg, catch_l, d_cache, active=lane_active
    )

    # --- fork-draft the tree on the lane axis ---
    q0 = logits[::lanes, -1, :verify_vocab]  # [B, Vv] (lanes identical)
    _, top0 = top_k_via_argmax(q0, spec[0])  # [B, spec0]
    pick = jnp.asarray(lay.pick)  # [gamma, lanes]
    chain0 = jnp.take_along_axis(
        top0, jnp.broadcast_to(pick[0][None, :], (B, lanes)), axis=1
    ).reshape(B * lanes).astype(jnp.int32)

    def draft_step(carry, pick_i):
        last, d_cache = carry
        lg, d_cache = forward(
            draft_params, draft_cfg, last[:, None], d_cache,
            active=lane_active,
        )
        _, topi = top_k_via_argmax(lg[:, -1, :verify_vocab], kmax)
        pk = jnp.tile(pick_i, (B,))  # [B*lanes]
        nxt = jnp.take_along_axis(topi, pk[:, None], axis=1)[:, 0].astype(
            jnp.int32
        )
        return (nxt, d_cache), nxt

    (_, d_cache), rest = jax.lax.scan(
        draft_step, (chain0, d_cache), jnp.asarray(lay.pick[1:])
    )  # rest: [gamma-1, B*lanes]
    chains = jnp.concatenate([chain0[None], rest], axis=0)  # [gamma, B*lanes]
    chains = chains.reshape(gamma, B, lanes).transpose(1, 2, 0)  # [B, lanes, g]
    return chains, d_cache


def _tree_verify_commit(
    target_params, token_buf, p, d_cache, t_cache, active, chains, *,
    target_cfg, spec, eos_ids, probe="", verify_vocab=None,
):
    """Verify + walk + commit + relocation half of the batched tree
    iteration (shared with the DUODEC_SERVE_PROBE diagnostics)."""
    import numpy as np

    from duodecoding_tpu.engine.tree_loops import spec_layout

    B, S = token_buf.shape
    gamma = len(spec)
    lanes = int(np.prod(spec))
    lay = spec_layout(spec)
    T = int(lay.offsets.shape[0])
    rows = jnp.arange(B)
    if verify_vocab is None:
        verify_vocab = target_cfg.vocab_size

    # --- verify: ONE batched tree-attention forward ---
    t_cache = t_cache._replace(length=p - 1)
    last_tok = token_buf[rows, p - 1]  # [B]
    ver_nodes = chains[:, lay.node_from_lane, lay.node_level]  # [B, T-1]
    ver_in = jnp.concatenate([last_tok[:, None], ver_nodes], axis=1)  # [B, T]
    if "noverify" in probe:
        preds = (ver_in * 3 + 1) % 997  # fake target argmax (diagnostics)
        t_cache = t_cache._replace(length=t_cache.length + T)
    else:
        t_logits, t_cache = forward(
            target_params,
            target_cfg,
            ver_in,
            t_cache,
            position_offsets=jnp.asarray(lay.offsets),
            window_mask=jnp.asarray(lay.mask),
            active=active,
        )
        preds = jnp.argmax(t_logits[:, :, :verify_vocab], axis=-1).astype(
            jnp.int32
        )  # [B, T]

    # --- greedy walk per slot ---
    preds_parent = jnp.take_along_axis(
        preds[:, None, :].repeat(lanes, axis=1),
        jnp.broadcast_to(jnp.asarray(lay.parent_rows)[None], (B, lanes, gamma)),
        axis=2,
    )  # [B, lanes, gamma]
    cons = chains == preds_parent
    m_l = jnp.sum(jnp.cumprod(cons.astype(jnp.int32), axis=2), axis=2)
    w = jnp.argmax(m_l, axis=1).astype(jnp.int32)  # [B]
    m = jnp.take_along_axis(m_l, w[:, None], axis=1)[:, 0]  # [B]
    win_rows = jnp.take(jnp.asarray(lay.lane_nodes), w, axis=0)  # [B, gamma]
    win_chain = jnp.take_along_axis(
        chains, w[:, None, None], axis=1
    )[:, 0, :]  # [B, gamma]
    preds_at_w = jnp.take_along_axis(preds, win_rows, axis=1)  # [B, gamma]
    bonus = jnp.where(
        m == 0,
        preds[:, 0],
        jnp.take_along_axis(
            preds_at_w, jnp.maximum(m - 1, 0)[:, None], axis=1
        )[:, 0],
    )  # [B]

    # --- commit: winning chain + bonus at each slot's own offset ---
    def commit_row(buf, chain, b, pos, mm, act):
        cur = jax.lax.dynamic_slice(buf, (pos,), (gamma + 1,))
        newv = jnp.where(jnp.arange(gamma + 1) == mm, b, 
                         jnp.concatenate([chain, chain[-1:]]))
        newv = jnp.where(jnp.arange(gamma + 1) <= mm, newv, cur)
        return jax.lax.dynamic_update_slice(
            buf, jnp.where(act, newv, cur), (pos,)
        )

    token_buf = jax.vmap(commit_row)(token_buf, win_chain, bonus, p, m, active)
    new_n = jnp.where(active, p + m + 1, p)

    # --- target cache: relocate the winning rows into chain order ---
    start = p - 1
    perm = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None], (B, T)
    ).at[:, 1 : gamma + 1].set(win_rows)

    def move_row(a, st, pm):  # a: [L, S, ...] one slot
        win = jax.lax.dynamic_slice_in_dim(a, st, T, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(
            a, jnp.take(win, pm, axis=1), st, axis=1
        )

    kw = {}
    for f in t_cache._fields:
        if f == "length":
            continue
        if "noreloc" in probe:
            break
        kw[f] = jax.vmap(move_row, in_axes=(1, 0, 0), out_axes=1)(
            getattr(t_cache, f), start, perm
        )
    kw["length"] = jnp.where(active, new_n - 1, t_cache.length)
    t_cache = t_cache._replace(**kw)
    d_cache = d_cache._replace(
        length=jnp.minimum(d_cache.length, jnp.repeat(new_n - 1, lanes))
    )

    # --- per-slot EOS over the emitted region [p, new_n) ---
    finished = jnp.zeros((B,), bool)
    for i in range(gamma + 1):
        pos = p + i
        tok_i = token_buf[rows, jnp.minimum(pos, S - 1)]
        in_range = pos < new_n
        for e in eos_ids:
            finished = finished | (in_range & (tok_i == e))
    finished = finished & active
    emitted = jnp.where(active, new_n - p, 0)
    accepted = jnp.where(active, m, 0)
    drafted = jnp.where(active, gamma, 0)
    return (
        token_buf, new_n, d_cache, t_cache, emitted, accepted, drafted,
        finished,
    )


spec_tree_batched_step = functools.partial(
    jax.jit,
    static_argnames=("draft_cfg", "target_cfg", "spec", "eos_ids"),
    donate_argnames=("token_buf", "d_cache", "t_cache"),
)(_spec_tree_core)


@functools.partial(
    jax.jit,
    static_argnames=("draft_cfg", "target_cfg", "spec", "eos_ids", "max_steps"),
    donate_argnames=("token_buf", "d_cache", "t_cache"),
)
def spec_tree_batched_multi_step(
    draft_params,
    target_params,
    token_buf: jax.Array,  # [B, S]
    n_tokens: jax.Array,  # [B]
    d_cache,
    t_cache,
    active: jax.Array,  # [B] bool
    deadlines: jax.Array,  # [B] int32 per-slot token limits
    *,
    draft_cfg: ModelConfig,
    target_cfg: ModelConfig,
    spec: tuple[int, ...],
    eos_ids: tuple[int, ...] = (),
    max_steps: int = 8,
):
    """Fuse up to ``max_steps`` tree-speculative iterations in ONE
    dispatch (a device-resident lax.while around _spec_tree_core). Slots
    that hit EOS or their deadline go inactive INSIDE the loop (no
    buffer overrun past the admission budget) and the loop exits early
    so the host can retire/admit. On remote backends each dispatch costs
    ~85-100 ms of execute/completion overhead (tools/fixed_cost_probe.py)
    against ~tens of ms of device work per iteration — fusing is the
    difference between dispatch-bound and compute-bound serving."""

    def cond(c):
        _tb, _n, _dc, _tc, act, fin, _em, _ac, _dr, i = c
        return jnp.logical_and(
            jnp.logical_and(i < max_steps, ~jnp.any(fin)), jnp.any(act)
        )

    def body(c):
        tb, n, dc, tc, act, fin, em, ac, dr, i = c
        tb, n, dc, tc, e, a, d, f = _spec_tree_core(
            draft_params, target_params, tb, n, dc, tc, act,
            draft_cfg=draft_cfg, target_cfg=target_cfg, spec=spec,
            eos_ids=eos_ids,
        )
        f = (f | (n >= deadlines)) & act
        return (
            tb, n, dc, tc, act & ~f, fin | f, em + e, ac + a, dr + d, i + 1
        )

    B = token_buf.shape[0]
    zeros = jnp.zeros((B,), jnp.int32)
    init = (
        token_buf, n_tokens, d_cache, t_cache, active,
        jnp.zeros((B,), bool), zeros, zeros, zeros, jnp.int32(0),
    )
    (
        token_buf, n_tokens, d_cache, t_cache, _act, finished,
        emitted, accepted, drafted, steps,
    ) = jax.lax.while_loop(cond, body, init)
    return (
        token_buf, n_tokens, d_cache, t_cache, emitted, accepted, drafted,
        finished, steps,
    )
