"""Batched decode steps with PER-SLOT sequence lengths.

The reference is strictly batch-1 (SURVEY appendix: `int(x.item())`
scalarization throughout); continuous batching is a new TPU-native
capability (BASELINE.json north star). The single-scalar ``cache.length``
of models/transformer.py generalizes here to a per-row ``lengths [B]``
vector: decode steps scatter each row's new KV at its own offset
(``at[arange(B), lengths]``) and mask attention per row, so slots at
different positions decode together in one forward.

Speculative batched serving additionally drafts gamma tokens per slot and
verifies them in one batched T=gamma+1 forward with per-row offsets —
batched rejection sampling reuses ops/verify.compute_acceptance, which was
batch-first from the start.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import _rms_norm, _rope
from duodecoding_tpu.ops.sampling import norm_logits, sample


class BatchedCache(NamedTuple):
    k: jax.Array  # [L, B, S, H_kv, Dh]
    v: jax.Array
    lengths: jax.Array  # [B] int32 per-slot valid lengths


def init_batched_cache(cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim_)
    return BatchedCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


def forward_batched(
    params,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T] — T new tokens per row, at row offsets
    cache: BatchedCache,
    active: jax.Array | None = None,  # [B] bool — inactive rows don't advance
):
    """Forward T tokens per row starting at each row's own length."""
    B, T = tokens.shape
    S = cache.k.shape[2]
    lengths = cache.lengths
    if active is None:
        active = jnp.ones((B,), bool)

    h = jnp.take(params["embed"], tokens, axis=0)
    positions = lengths[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    q_pos = positions  # [B, T]
    k_pos = jnp.arange(S, dtype=jnp.int32)
    mask = k_pos[None, None, :] <= q_pos[:, :, None]  # [B, T, S]
    scale = cfg.head_dim_**-0.5
    n_rep = cfg.num_heads // cfg.num_kv_heads
    rows = jnp.arange(B)

    def mm(x, w):
        if isinstance(w, dict):
            from duodecoding_tpu.ops.pallas.int4_matmul import int4_matmul

            return int4_matmul(x, w).astype(x.dtype)
        return x @ w

    def layer_fn(h, xs):
        lp, k_cache, v_cache = xs
        x = _rms_norm(h, lp["attn_norm"], cfg.rms_norm_eps)
        q = mm(x, lp["wq"])
        k = mm(x, lp["wk"])
        v = mm(x, lp["wv"])
        if cfg.qkv_bias:
            q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
        q = q.reshape(B, T, cfg.num_heads, cfg.head_dim_)
        k = k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim_)
        v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim_)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)

        # per-row write at [b, lengths[b] + t]: a vmapped
        # dynamic_update_slice instead of an advanced-indexing scatter —
        # gather/scatter-in-while compiles pathologically slowly on the
        # TPU compiler (>9 min at serving shapes), while batched DUS
        # lowers to a simple masked store
        def write_row(kc, vc, kr, vr, pos, act):
            cur_k = jax.lax.dynamic_slice(
                kc, (pos, 0, 0), (T, kc.shape[1], kc.shape[2])
            )
            cur_v = jax.lax.dynamic_slice(
                vc, (pos, 0, 0), (T, vc.shape[1], vc.shape[2])
            )
            kr = jnp.where(act, kr, cur_k)
            vr = jnp.where(act, vr, cur_v)
            return (
                jax.lax.dynamic_update_slice(kc, kr, (pos, 0, 0)),
                jax.lax.dynamic_update_slice(vc, vr, (pos, 0, 0)),
            )

        k_cache, v_cache = jax.vmap(write_row)(
            k_cache, v_cache, k, v, lengths, active
        )

        qg = q.reshape(B, T, cfg.num_kv_heads, n_rep, cfg.head_dim_)
        scores = jnp.einsum(
            "btgrd,bsgd->bgrts", qg, k_cache, preferred_element_type=jnp.float32
        ) * scale
        scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bgrts,bsgd->btgrd",
            probs.astype(v_cache.dtype),
            v_cache,
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        ctx = ctx.reshape(B, T, cfg.num_heads * cfg.head_dim_)
        h = h + mm(ctx, lp["wo"])
        x = _rms_norm(h, lp["mlp_norm"], cfg.rms_norm_eps)
        gate = jax.nn.silu(mm(x, lp["w_gate"]).astype(jnp.float32)).astype(x.dtype)
        h = h + mm(gate * mm(x, lp["w_up"]), lp["w_down"])
        return h, (k_cache, v_cache)

    h, (new_k, new_v) = jax.lax.scan(layer_fn, h, (params["layers"], cache.k, cache.v))
    h = _rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    head = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    logits = jnp.matmul(h, head, preferred_element_type=jnp.float32)
    new_lengths = jnp.where(active, lengths + T, lengths)
    return logits, BatchedCache(k=new_k, v=new_v, lengths=new_lengths)


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
def insert_slot(cache: BatchedCache, slot_cache, slot: int, length: jax.Array):
    """Insert a freshly prefilled single-request cache ([L, 1, S, H, D])
    into batch slot ``slot``."""
    k = jax.lax.dynamic_update_slice(
        cache.k, slot_cache.k, (0, slot, 0, 0, 0)
    )
    v = jax.lax.dynamic_update_slice(
        cache.v, slot_cache.v, (0, slot, 0, 0, 0)
    )
    lengths = cache.lengths.at[slot].set(length)
    return BatchedCache(k=k, v=v, lengths=lengths)


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
    d_cache = BatchedCache(
        d_cache.k, d_cache.v, jnp.minimum(d_cache.lengths, p - 2)
    )
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
    d_cache = BatchedCache(
        d_cache.k, d_cache.v, jnp.where(active, n + 1, d_cache.lengths)
    )
    t_cache = BatchedCache(
        t_cache.k, t_cache.v, jnp.where(active, n + 1, t_cache.lengths)
    )

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
