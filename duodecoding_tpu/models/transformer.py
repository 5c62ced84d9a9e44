"""Functional Llama/Qwen-family transformer with a fixed-shape KV cache.

TPU-first re-design of the reference's stateful ``KVCacheModel``
(reference: src/model_gpu.py:54-422):

- parameters are a pytree of stacked-by-layer arrays so the forward pass is
  a single ``lax.scan`` over layers (one XLA While op instead of L unrolled
  blocks — fast compiles at 13B depth);
- the KV cache is a fixed-shape pytree ``(k, v, length)``; "rollback" is a
  pure function that resets ``length`` (the reference crops HF cache
  tensors, src/model_gpu.py:362-383 — here stale positions are simply
  masked/overwritten, no reallocation);
- prefill and gamma-token verify steps are the same function at different
  static sequence lengths; single-token decode is T=1.

All matmuls run in bf16 (MXU native); logits are returned in float32 for
the sampling math.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from duodecoding_tpu.models.config import ModelConfig


class KVCache(NamedTuple):
    k: jax.Array  # [L, B, S, H_kv, Dh]
    v: jax.Array  # [L, B, S, H_kv, Dh]
    length: jax.Array  # scalar int32 — number of valid positions

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim_)
    return KVCache(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype), length=jnp.int32(0)
    )


def set_cache_length(cache, length):
    """Reset a (dense or int8-quantized) cache's valid length — the
    universal rollback primitive (pure bookkeeping, no data movement)."""
    return cache._replace(length=jnp.asarray(length, jnp.int32))


def rollback(cache: KVCache, end_pos: jax.Array) -> KVCache:
    """Reset the cache to ``end_pos`` valid positions (pure index bookkeeping).

    Equivalent to the reference's ``KVCacheModel.rollback``
    (src/model_gpu.py:362-383) without any data movement: the next forward
    starts at ``length`` and overwrites/masks stale positions.
    """
    end = jnp.minimum(jnp.asarray(end_pos, jnp.int32), cache.length)
    return set_cache_length(cache, end)


def init_random_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16):
    """Random-init parameters at the true architecture (bench/test use).

    Runs as ONE jitted program — a single dispatch/compile even on
    remote-compile backends."""
    return _init_random_params_jit(cfg, jnp.dtype(dtype).name, key)


@functools.partial(jax.jit, static_argnames=("cfg", "dtype_name"))
def _init_random_params_jit(cfg: ModelConfig, dtype_name: str, key: jax.Array):
    return _init_random_params_impl(cfg, key, jnp.dtype(dtype_name))


def _init_random_params_impl(cfg: ModelConfig, key: jax.Array, dtype):
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    hd, h, hkv, L = cfg.head_dim_, cfg.num_heads, cfg.num_kv_heads, cfg.num_layers
    ks = jax.random.split(key, 10)

    def norm(k, *shape, scale=None):
        scale = scale if scale is not None else (shape[-2] ** -0.5)
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, d), dtype),
        "wq": norm(ks[0], L, d, h * hd),
        "wk": norm(ks[1], L, d, hkv * hd),
        "wv": norm(ks[2], L, d, hkv * hd),
        "wo": norm(ks[3], L, h * hd, d),
        "mlp_norm": jnp.ones((L, d), dtype),
        "w_gate": norm(ks[4], L, d, f),
        "w_up": norm(ks[5], L, d, f),
        "w_down": norm(ks[6], L, f, d),
    }
    if cfg.qkv_bias:
        layers["bq"] = jnp.zeros((L, h * hd), dtype)
        layers["bk"] = jnp.zeros((L, hkv * hd), dtype)
        layers["bv"] = jnp.zeros((L, hkv * hd), dtype)
    params = {
        "embed": norm(ks[7], v, d, scale=0.02),
        "final_norm": jnp.ones((d,), dtype),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = norm(ks[8], d, v)
    return params


def _rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding, HF 'half-split' layout. x: [B, T, H, Dh]."""
    dh = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    angles = positions[:, :, None].astype(jnp.float32) * inv_freq[None, None, :]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, T, 1, Dh/2]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., : dh // 2], x[..., dh // 2 :]
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate(
        [x1f * cos - x2f * sin, x2f * cos + x1f * sin], axis=-1
    )
    return out.astype(x.dtype)


def forward(
    params,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T] int32
    cache: KVCache,
    return_hidden: bool = False,
    position_offsets: jax.Array | None = None,  # [T] rope offsets from start
    window_mask: jax.Array | None = None,  # [T, T] intra-window visibility
    active: jax.Array | None = None,  # [B] bool — per-row caches only
):
    """Run the transformer over ``tokens`` starting at ``cache.length``.

    Returns ``(logits_f32 [B, T, V], new_cache)`` (plus final-layer hidden
    states when ``return_hidden`` — used by acceptance-prediction heads,
    the reference's ``hidden_states`` exposure in src/model_gpu.py).

    ``position_offsets`` / ``window_mask`` enable tree attention (Medusa /
    REST-style multi-path verification, reference
    src/model/medusa/utils.py:233): token i gets rope position
    ``start + position_offsets[i]`` (its tree depth) and attends the prefix
    plus the window positions where ``window_mask[i, j]`` (its ancestors).

    ``cache.length`` may be a scalar (engine modes — all rows share one
    position) or a per-row ``[B]`` vector (continuous batching,
    serving/batched.py): row b's window starts at ``length[b]``, its KV
    rows are written at its own offset, and ``active=False`` rows neither
    write the cache nor advance — the vectorized generalization of the
    reference's strictly batch-1 loops (SURVEY appendix scalarization).
    """
    from duodecoding_tpu.models.kv_quant import (
        QuantKVCache,
        dequantize_kv,
        quantize_kv,
    )

    quantized_kv = isinstance(cache, QuantKVCache)
    B, T = tokens.shape
    S = cache.max_len
    h = jnp.take(params["embed"], tokens, axis=0)
    start = jnp.asarray(cache.length, jnp.int32)
    per_row = start.ndim == 1
    if per_row and active is None:
        active = jnp.ones((B,), bool)
    offsets = (
        jnp.arange(T, dtype=jnp.int32)
        if position_offsets is None
        else position_offsets.astype(jnp.int32)
    )
    positions = jnp.reshape(start, (-1, 1)) + offsets[None, :]
    positions = jnp.broadcast_to(positions, (B, T))

    # Attention is split into a PREFIX part (cache positions < start, read
    # via fused scan-xs slices) and a WINDOW part (the T fresh tokens,
    # held in registers) joined under one softmax. This keeps the fresh
    # keys/values OUT of the cache read path, so the scan emits only the
    # [B, T] new rows as ys and the cache buffers are written once after
    # the scan (dynamic_update_slice of T positions) instead of being
    # restacked wholesale every forward — at 13B that restack was a full
    # cache write per step, and for multi-lane tree drafting (B = 16
    # lanes, engine/tree_loops.py) ~0.5 GB of HBM traffic per draft step.
    k_pos = jnp.arange(S, dtype=jnp.int32)  # [S]
    # prefix visibility: [1, S] (scalar length) or [B, S] (per-row lengths)
    mask_pre = k_pos[None, :] < jnp.reshape(start, (-1, 1))
    if window_mask is None:
        # fresh token j sits at position start + j; query i is at
        # start + offsets[i] — causal within the window
        win_mask = jnp.arange(T, dtype=jnp.int32)[None, :] <= offsets[:, None]
    else:
        win_mask = window_mask.astype(bool)  # [T, T] tree ancestors
    scale = cfg.head_dim_**-0.5
    n_rep = cfg.num_heads // cfg.num_kv_heads

    # Flash decode attention (ops/pallas/flash_decode.py): O(valid length)
    # HBM traffic instead of O(S) for causal decode/verify windows on TPU;
    # int8 caches dequantize IN-kernel (scores/probs scale folding).
    # Dense fallback for tree-masked windows, large windows, non-TPU.
    from duodecoding_tpu.ops.pallas.flash_decode import pick_flash_block

    flash_block = pick_flash_block(S, cfg.num_kv_heads, cfg.head_dim_)
    # tree windows (ancestor-masked, offset rope positions) can run the
    # SAME stacked kernel with the [T, T] mask as an operand: rope happens
    # on the q/k operands outside the kernel and every window row sees the
    # whole valid prefix, so only the intra-window visibility changes.
    # OPT-IN (DUODEC_TREE_FLASH=1): measured on-chip at the 13B bench
    # shapes (S=512, T=40 verify) the kernel is iteration-neutral
    # (30.5 vs 29.7 ms/iter) but the nested-while remote compile cost 4x
    # (427 s vs 112 s) — the dense path stays the default until caches
    # are long enough for O(valid) reads to pay for that.
    is_tree = window_mask is not None or position_offsets is not None
    tree_flash = (
        is_tree
        and T >= 8  # T=1/2 catch-up windows keep the proven dense path
        and os.environ.get("DUODEC_TREE_FLASH") == "1"
    )
    flash_ok = (
        (not is_tree or tree_flash)
        and T * n_rep <= 128
        and flash_block > 0
        and jax.default_backend() == "tpu"
        # at B=1 on short caches the dense masked path beats the kernel's
        # fixed cost (measured: 1.24 vs 1.50 ms on a 3-layer draft step at
        # S=256); flash wins from B>=2 (tree-draft lanes: the dense einsum
        # measured ~5x raw cache bandwidth at 16 lanes, and the stacked
        # kernel took the B=16 draft forward 4.9 -> 1.7 ms) or once the
        # cache is long enough that O(valid) traffic matters. B=1 keeps
        # dense also to stay OUT of the nested-while modes' compile path
        # (dssd/cee catch-up forwards are B=1, T=2). Tree windows are
        # T>=8 with per-row masks — the kernel wins there at any B.
        and (B >= 2 or S > 2048 or tree_flash)
        # per-row lengths (continuous batching) use the same kernel with
        # per-row block clamping (nb[b]/ln[b] in the index maps) — each
        # row reads only ITS valid prefix
        and os.environ.get("DUODEC_NO_FLASH") != "1"
    )
    # Both cache dtypes use the STACKED kernel (whole cache +
    # scalar-prefetched layer index + fresh-window operands): zero-copy
    # layer reads, O(valid) traffic, no in-scan cache writes
    # (ops/pallas/flash_decode.py::flash_decode_stacked). For int8 caches
    # the kernel folds K scales into score columns / V scales into prob
    # rows in-kernel (exact) — this replaced the round-2 non-stacked
    # write-then-read int8 path, whose scan-sliced cache operand forced a
    # per-layer slice materialisation and whose composition inside nested
    # while programs hit a pathological remote compile.
    # DUODEC_INT8_FLASH=0 is the int8 kill-switch.
    use_stacked_flash = flash_ok and (
        not quantized_kv or os.environ.get("DUODEC_INT8_FLASH") != "0"
    )

    # INT4-quantized weights (dicts of stacked [L, ...] leaves) are NOT fed
    # through scan xs: a pallas call cannot consume a scan-sliced operand
    # without XLA materialising the slice (a full per-layer weight copy in
    # HBM per step — measured 2.3x the kernel time at 13B shapes). They stay
    # whole, and the kernel indexes layer blocks via a scalar-prefetched
    # layer index (ops/pallas/int4_matmul.py::_int4_matmul_2d_stacked).
    # Array leaves (norms, biases) and the KV cache still scan as xs — XLA
    # fuses those slices for free.
    all_layers = params["layers"]
    q_names = tuple(k for k, v in all_layers.items() if isinstance(v, dict))
    arr_layers = {k: v for k, v in all_layers.items() if k not in q_names}

    def mm(x, w, idx=None):
        """Dense or INT4-groupwise matmul (models/quant.py dicts dispatch to
        the fused Pallas dequant+matmul kernel; with ``idx`` the dict's
        leaves are layer-stacked and read zero-copy)."""
        if isinstance(w, dict):
            from duodecoding_tpu.ops.pallas.int4_matmul import int4_matmul

            return int4_matmul(x, w, layer=idx).astype(x.dtype)
        return x @ w

    def layer_fn(h, xs):
        if use_stacked_flash:
            idx, lp = xs  # cache read via the stacked kernel (closure)
            k_cache = v_cache = None
        elif quantized_kv:
            idx, lp, k_cache, v_cache, k_sc, v_sc = xs
        else:
            idx, lp, k_cache, v_cache = xs

        def w(name):
            return lp[name] if name in lp else all_layers[name]

        def wmm(x, name):
            return mm(x, w(name), idx if name in q_names else None)

        x = _rms_norm(h, w("attn_norm"), cfg.rms_norm_eps)
        if "wqkv" in all_layers:
            # fused projection (models/quant.py::fuse_layer_weights): one
            # kernel launch; the split is free (fused into consumers)
            nq = cfg.num_heads * cfg.head_dim_
            nkv = cfg.num_kv_heads * cfg.head_dim_
            qkv = wmm(x, "wqkv")
            q = qkv[..., :nq]
            k = qkv[..., nq : nq + nkv]
            v = qkv[..., nq + nkv :]
        else:
            q = wmm(x, "wq")
            k = wmm(x, "wk")
            v = wmm(x, "wv")
        if cfg.qkv_bias:
            q = q + w("bq")
            k = k + w("bk")
            v = v + w("bv")
        q = q.reshape(B, T, cfg.num_heads, cfg.head_dim_)
        k = k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim_)
        v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim_)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)

        def finish(ctx, h):
            ctx = ctx.reshape(B, T, cfg.num_heads * cfg.head_dim_)
            h = h + wmm(ctx, "wo")
            x = _rms_norm(h, w("mlp_norm"), cfg.rms_norm_eps)
            if "w_gateup" in all_layers:
                gu = wmm(x, "w_gateup")
                f = cfg.intermediate_size
                g, u = gu[..., :f], gu[..., f:]
            else:
                g, u = wmm(x, "w_gate"), wmm(x, "w_up")
            gate = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype)
            return h + wmm(gate * u, "w_down")

        if use_stacked_flash:
            from duodecoding_tpu.ops.pallas.flash_decode import (
                flash_decode_stacked,
            )

            wm = win_mask if is_tree else None
            if quantized_kv:
                k_codes, k_s = quantize_kv(k)
                v_codes, v_s = quantize_kv(v)
                # window keys/values round-trip through int8 so the math
                # matches reading them back from the quantized cache
                k_win = dequantize_kv(k_codes, k_s, h.dtype)
                v_win = dequantize_kv(v_codes, v_s, h.dtype)
                ctx = flash_decode_stacked(
                    q, cache.k, cache.v, k_win, v_win, start, idx,
                    cache.k_scale, cache.v_scale, wm, block_k=flash_block,
                ).astype(h.dtype)
                return finish(ctx, h), (k_codes, v_codes, k_s, v_s)
            ctx = flash_decode_stacked(
                q, cache.k, cache.v, k, v, start, idx, window_mask=wm,
                block_k=flash_block,
            ).astype(h.dtype)
            return finish(ctx, h), (k, v)

        # dense path: prefix (cache) and window (fresh) attention under one
        # softmax; the cache is read-only here (fused xs slice) and the
        # fresh rows return as small ys
        if quantized_kv:
            k_codes, k_s = quantize_kv(k)
            v_codes, v_s = quantize_kv(v)
            # window keys/values round-trip through int8 so the math is
            # identical to reading them back from the quantized cache
            k_win = dequantize_kv(k_codes, k_s, h.dtype)
            v_win = dequantize_kv(v_codes, v_s, h.dtype)
            # prefix: scales factor OUT of the attention dots exactly —
            # sum_d q_d (c_d * sigma_s) = sigma_s * sum_d q_d c_d — so K
            # scales fold into score columns and V scales into probability
            # rows; a dequantized bf16 cache copy never materialises
            # (~840 MB/step of saved HBM traffic at 13B, the same folding
            # the int8-flash kernel does in-VMEM)
            k_pre = k_cache.astype(h.dtype)
            v_pre = v_cache.astype(h.dtype)
            k_colscale = jnp.moveaxis(k_sc, -1, 1)[:, :, None, None, :]
            v_rowscale = jnp.moveaxis(v_sc, -1, 1)[:, :, None, None, :]
            ys_out = (k_codes, v_codes, k_s, v_s)
        else:
            k_win, v_win = k, v
            k_pre, v_pre = k_cache, v_cache
            k_colscale = v_rowscale = None
            ys_out = (k, v)

        # GQA: group query heads over kv heads; MXU matmuls with f32 accum
        qg = q.reshape(B, T, cfg.num_kv_heads, n_rep, cfg.head_dim_)
        scores_pre = jnp.einsum(
            "btgrd,bsgd->bgrts", qg, k_pre,
            preferred_element_type=jnp.float32,
        ) * scale
        if k_colscale is not None:
            scores_pre = scores_pre * k_colscale
        scores_win = jnp.einsum(
            "btgrd,bwgd->bgrtw", qg, k_win,
            preferred_element_type=jnp.float32,
        ) * scale
        scores_pre = jnp.where(
            mask_pre[:, None, None, None, :], scores_pre, -1e30
        )
        scores_win = jnp.where(
            win_mask[None, None, None, :, :], scores_win, -1e30
        )
        probs = jax.nn.softmax(
            jnp.concatenate([scores_pre, scores_win], axis=-1), axis=-1
        )
        p_pre = probs[..., :S]
        if v_rowscale is not None:
            p_pre = p_pre * v_rowscale
        ctx = (
            jnp.einsum(
                "bgrts,bsgd->btgrd", p_pre.astype(v_pre.dtype), v_pre,
                preferred_element_type=jnp.float32,
            )
            + jnp.einsum(
                "bgrtw,bwgd->btgrd",
                probs[..., S:].astype(v_win.dtype), v_win,
                preferred_element_type=jnp.float32,
            )
        ).astype(h.dtype)
        h = finish(ctx.reshape(B, T, cfg.num_heads, cfg.head_dim_), h)
        return h, ys_out

    idxs = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    # shallow (draft-slice) models: unroll the layer loop — removes the
    # scan's per-layer xs/ys bookkeeping and lets XLA schedule across layer
    # boundaries; deep models stay rolled (compile time at 13B depth)
    unroll = cfg.num_layers if cfg.num_layers <= 4 else 1

    def write_rows(buf, rows):
        # rows [L, B, T, ...] -> one in-place window write into the cache
        if not per_row:
            idx = (0, 0, start) + (0,) * (buf.ndim - 3)
            return jax.lax.dynamic_update_slice(buf, rows, idx)

        # per-row offsets: direct per-row DMA (ops/pallas/cache_write.py).
        # The vmapped dynamic_update_slice alternative lowers to a masked
        # store over the WHOLE buffer — measured 807 us vs 15 us per write
        # at serving draft-cache shapes, and it dominated the batched
        # tree-serving iteration. Inactive rows skip their DMA.
        from duodecoding_tpu.ops.pallas.cache_write import window_write

        return window_write(buf, rows, start, active)

    new_length = (
        jnp.where(active, start + T, start) if per_row else start + T
    )

    if quantized_kv:
        xs = (
            (idxs, arr_layers)
            if use_stacked_flash
            else (
                idxs, arr_layers, cache.k, cache.v,
                cache.k_scale, cache.v_scale,
            )
        )
        h, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
            layer_fn, h, xs, unroll=unroll
        )
        # ys are the [L, B, T] fresh rows; one post-scan window write
        new_k = write_rows(cache.k, new_k)
        new_v = write_rows(cache.v, new_v)
        new_ks = write_rows(cache.k_scale, new_ks)
        new_vs = write_rows(cache.v_scale, new_vs)
        new_cache = QuantKVCache(
            k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs, length=new_length
        )
    else:
        xs = (
            (idxs, arr_layers)
            if use_stacked_flash
            else (idxs, arr_layers, cache.k, cache.v)
        )
        h, (new_k, new_v) = jax.lax.scan(layer_fn, h, xs, unroll=unroll)
        new_k = write_rows(cache.k, new_k)
        new_v = write_rows(cache.v, new_v)
        new_cache = KVCache(k=new_k, v=new_v, length=new_length)
    h = _rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    head = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    if isinstance(head, dict):  # INT4 lm_head (unstacked — no scan slicing)
        from duodecoding_tpu.ops.pallas.int4_matmul import int4_matmul

        logits = int4_matmul(h, head)  # f32
        if logits.shape[-1] > cfg.vocab_size:  # tile-padded head columns
            logits = logits[..., : cfg.vocab_size]
    else:
        logits = jnp.matmul(h, head, preferred_element_type=jnp.float32)
    if return_hidden:
        return logits, new_cache, h
    return logits, new_cache
