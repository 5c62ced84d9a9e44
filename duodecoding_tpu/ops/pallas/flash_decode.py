"""Pallas TPU kernel: flash decode attention over a fixed-shape KV cache.

The engine's caches are fixed-shape ``[B, S, Hkv, D]`` with a scalar valid
``length`` (models/transformer.py) — the dense path computes scores over
all S positions and masks the dead tail, which reads the whole cache from
HBM every step (the reference pays the same with its growable buffers,
src/model_gpu.py:62 max_length=16384). This kernel makes decode-time
attention O(valid length):

- grid = (B, S/block_k); the KV-block index map clamps trailing blocks to
  the last VALID block (scalar-prefetched ``n_blocks``), and Pallas skips
  the DMA when consecutive grid steps map to the same block — the dead
  cache tail is never fetched;
- KV blocks keep the cache's native ``[block_k, Hkv, D]`` layout (no
  transposes of the cache in HBM); heads are iterated inside the kernel;
- online softmax (running m/l/acc in VMEM scratch, guide
  boom_attention_tricks.md §2-4) across KV blocks; accumulators finalise
  on the last grid step.

Used for causal decode/verify windows (T small); prefill and tree-masked
windows keep the dense path (prefill is compute-bound; tree masks need
arbitrary [T, S] visibility).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _rt_pad(rt: int) -> int:
    return max(8, ((rt + 7) // 8) * 8)


def _kernel(
    n_blocks_ref,  # scalar prefetch: [1] int32 — number of valid KV blocks
    length_ref,  # scalar prefetch: [1] int32 — cache length before window
    q_ref,  # [1, Hkv, RT, D]
    k_ref,  # [1, block_k, Hkv, D] (bf16/f32 dense, or int8 codes)
    v_ref,  # [1, block_k, Hkv, D]
    *rest,  # quantized: ks_ref [1, block_k, Hkv], vs_ref, then outputs
    block_k: int,
    T: int,
    scale: float,
    quant: bool,
):
    if quant:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    Hkv = q_ref.shape[1]
    RT = q_ref.shape[2]
    RTp = _rt_pad(RT)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    @pl.when(j < n_blocks_ref[0])
    def _block():
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (RT, block_k), 1
        )
        t_row = jax.lax.broadcasted_iota(jnp.int32, (RT, block_k), 0) % T
        visible = k_pos <= length_ref[0] + t_row  # [RT, block_k] causal

        # per-head loop: a batched-dim dot_general variant compiled faster
        # standalone but hit a pathological (>9 min) Mosaic path inside
        # lax.while_loop programs; the unrolled form compiles in seconds
        # in both contexts
        for h in range(Hkv):
            q = q_ref[0, h].astype(jnp.float32)  # [RT, D]
            k = k_ref[0, :, h].astype(jnp.float32)  # [block_k, D]
            v = v_ref[0, :, h].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [RT, block_k]
            if quant:
                # int8 dequant folded into the score columns
                # (per-position-per-head scales, models/kv_quant.py)
                s = s * ks_ref[0, :, h][None, :]
            s = jnp.where(visible, s, NEG_INF)

            a, b = h * RTp, h * RTp + RT
            m_prev = m_scr[a:b, :1]  # [RT, 1]
            l_prev = l_scr[a:b, :1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            if quant:
                p = p * vs_ref[0, :, h][None, :]  # fold V scales into probs
            acc_scr[a:b, :] = acc_scr[a:b, :] * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[a:b, :] = jnp.broadcast_to(m_next, (RT, m_scr.shape[1]))
            l_scr[a:b, :] = jnp.broadcast_to(l_next, (RT, l_scr.shape[1]))

    @pl.when(j == nj - 1)
    def _finalize():
        for h in range(Hkv):
            a, b = h * RTp, h * RTp + RT
            l = l_scr[a:b, :1]
            o_ref[0, h] = (
                acc_scr[a:b, :] / jnp.maximum(l, 1e-30)
            ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_k", "interpret")
)
def flash_decode_attention(
    q: jax.Array,  # [B, T, H, D]
    k_cache: jax.Array,  # [B, S, Hkv, D] (bf16/f32, or int8 codes)
    v_cache: jax.Array,  # [B, S, Hkv, D]
    length: jax.Array,  # scalar int32 — valid positions BEFORE this window
    k_scale: jax.Array | None = None,  # [B, S, Hkv] f32 (int8 caches)
    v_scale: jax.Array | None = None,
    *,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Causal attention of a T-token decode window (already written into
    the cache at [length, length+T)) over the valid prefix. Returns
    [B, T, H, D] in q.dtype.

    With ``k_scale``/``v_scale`` given, the caches hold int8 codes
    (models/kv_quant.py) and dequantization happens in-kernel: K scales
    fold into the score columns, V scales into the probability rows — the
    bf16 cache never materialises, so int8 halves the attention HBM
    traffic for real."""
    B, T, H, D = q.shape
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    rep = H // Hkv
    RT = rep * T
    block_k = min(block_k, S)
    if S % block_k:
        raise ValueError(f"S={S} must be divisible by block_k={block_k}")
    scale = D**-0.5
    quant = k_scale is not None

    # [B, T, H, D] -> [B, Hkv, rep*T, D] (row = r*T + t)
    qg = q.reshape(B, T, Hkv, rep, D).transpose(0, 2, 3, 1, 4).reshape(
        B, Hkv, RT, D
    )
    length = jnp.asarray(length, jnp.int32)
    n_blocks = jnp.maximum((length + T + block_k - 1) // block_k, 1)
    scalars = jnp.stack([n_blocks, length]).astype(jnp.int32)

    grid = (B, S // block_k)
    RTp = _rt_pad(RT)

    def q_map(b, j, nb, ln):
        return (b, 0, 0, 0)

    def kv_map(b, j, nb, ln):
        return (b, jnp.minimum(j, nb[0] - 1), 0, 0)

    def s_map(b, j, nb, ln):
        return (b, jnp.minimum(j, nb[0] - 1), 0)

    in_specs = [
        pl.BlockSpec((1, Hkv, RT, D), q_map),
        pl.BlockSpec((1, block_k, Hkv, D), kv_map),
        pl.BlockSpec((1, block_k, Hkv, D), kv_map),
    ]
    args = [scalars[:1], scalars[1:], qg, k_cache, v_cache]
    if quant:
        in_specs += [
            pl.BlockSpec((1, block_k, Hkv), s_map),
            pl.BlockSpec((1, block_k, Hkv), s_map),
        ]
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]

    out = pl.pallas_call(
        functools.partial(
            _kernel, block_k=block_k, T=T, scale=scale, quant=quant
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, Hkv, RT, D), q_map),
            scratch_shapes=[
                pltpu.VMEM((Hkv * RTp, 128), jnp.float32),
                pltpu.VMEM((Hkv * RTp, 128), jnp.float32),
                pltpu.VMEM((Hkv * RTp, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, RT, D), q.dtype),
        interpret=interpret,
    )(*args)

    # [B, Hkv, rep*T, D] -> [B, T, H, D]
    return out.reshape(B, Hkv, rep, T, D).transpose(0, 3, 1, 2, 4).reshape(
        B, T, H, D
    )


def _kernel_stacked(
    nb_ref,  # scalar prefetch: [B] int32 — per-row valid KV block counts
    ln_ref,  # scalar prefetch: [B] int32 — per-row prefix lengths
    lidx_ref,  # scalar prefetch: [1] int32 — layer index (used in index_map)
    q_ref,  # [1, Hkv, RT, D]
    k_ref,  # [1, 1, block_k, Hkv, D] — layer block of the stacked cache
    v_ref,  # [1, 1, block_k, Hkv, D]
    *rest,  # quant: ks_ref/vs_ref [1, 1, block_k, Hkv]; masked: wm_ref
    # [T, T]; then kn/vn/outputs
    block_k: int,
    T: int,
    scale: float,
    quant: bool = False,
    masked: bool = False,
    row_ln: bool = False,  # per-row prefix lengths ([B] prefetch arrays)
):
    rest = list(rest)
    ks_ref = vs_ref = wm_ref = None
    if quant:
        ks_ref, vs_ref = rest[:2]
        rest = rest[2:]
    if masked:
        wm_ref = rest[0]
        rest = rest[1:]
    kn_ref, vn_ref, o_ref, m_scr, l_scr, acc_scr = rest
    del lidx_ref
    # scalar lengths index [1] prefetch arrays at 0 — the per-row form
    # compiles 8x slower inside nested while programs and measured ~5%
    # slower in the engine loop, so it is opt-in via row_ln
    bi = pl.program_id(0) if row_ln else 0
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    Hkv = q_ref.shape[1]
    RT = q_ref.shape[2]
    RTp = _rt_pad(RT)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    # prefix blocks: every window row sees the whole valid prefix
    # (positions < length), so visibility is row-independent. Skipped
    # entirely for an empty prefix (an all-masked block would poison the
    # online softmax: exp(NEG_INF - NEG_INF) = 1).
    @pl.when((j < nb_ref[bi]) & (ln_ref[bi] > 0))
    def _block():
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (RT, block_k), 1
        )
        visible = k_pos < ln_ref[bi]  # [RT, block_k]

        for h in range(Hkv):
            q = q_ref[0, h].astype(jnp.float32)  # [RT, D]
            k = k_ref[0, 0, :, h].astype(jnp.float32)  # [block_k, D]
            v = v_ref[0, 0, :, h].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if quant:
                # int8 dequant folded into score columns / prob rows —
                # exact (per-position scales factor out of the dots), the
                # same folding as the non-stacked quant kernel
                s = s * ks_ref[0, 0, :, h][None, :]
            s = jnp.where(visible, s, NEG_INF)

            a, b = h * RTp, h * RTp + RT
            m_prev = m_scr[a:b, :1]
            l_prev = l_scr[a:b, :1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_scr[a:b, :] = jnp.broadcast_to(
                alpha * l_prev + jnp.sum(p, axis=1, keepdims=True),
                (RT, l_scr.shape[1]),
            )
            if quant:
                p = p * vs_ref[0, 0, :, h][None, :]
            acc_scr[a:b, :] = acc_scr[a:b, :] * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[a:b, :] = jnp.broadcast_to(m_next, (RT, m_scr.shape[1]))

    # window block (the T fresh tokens) + output. Visibility within the
    # window: causal by default, or an arbitrary [T, T] ancestor mask
    # (tree attention — Medusa/REST-style multi-path verification).
    @pl.when(j == nj - 1)
    def _finalize():
        if masked:
            rep = RT // T
            # int32 operand: Mosaic lacks sub-word vector compares on some
            # targets ("Target does not support this comparison" for int8)
            wm = wm_ref[...] > 0  # [T, T]
            visible = jnp.concatenate([wm] * rep, axis=0) if rep > 1 else wm
        else:
            t_row = jax.lax.broadcasted_iota(jnp.int32, (RT, T), 0) % T
            w_col = jax.lax.broadcasted_iota(jnp.int32, (RT, T), 1)
            visible = w_col <= t_row  # fresh token t sees window cols <= t
        for h in range(Hkv):
            q = q_ref[0, h].astype(jnp.float32)  # [RT, D]
            kw = kn_ref[0, :, h].astype(jnp.float32)  # [T, D]
            vw = vn_ref[0, :, h].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, kw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(visible, s, NEG_INF)

            a, b = h * RTp, h * RTp + RT
            m_prev = m_scr[a:b, :1]
            l_prev = l_scr[a:b, :1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            acc = acc_scr[a:b, :] * alpha + jax.lax.dot_general(
                p, vw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, h] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def flash_decode_stacked(
    q: jax.Array,  # [B, T, H, D]
    k_all: jax.Array,  # [L, B, S, Hkv, D] — the WHOLE stacked cache
    v_all: jax.Array,  # [L, B, S, Hkv, D]
    k_new: jax.Array,  # [B, T, Hkv, D] — fresh window keys (post-rope)
    v_new: jax.Array,  # [B, T, Hkv, D]
    length: jax.Array,  # scalar int32 — valid prefix positions
    layer: jax.Array,  # scalar int32 — layer index into the stacked cache
    k_scale_all: jax.Array | None = None,  # [L, B, S, Hkv] f32 (int8 cache)
    v_scale_all: jax.Array | None = None,
    window_mask: jax.Array | None = None,  # [T, T] intra-window visibility
    *,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Layer-indexed flash decode attention over a STACKED cache plus the
    window's fresh keys/values, under one online softmax.

    ``window_mask`` replaces the default causal intra-window visibility
    with an arbitrary [T, T] ancestor mask — tree attention for
    multi-path verification (models/transformer.py tree forwards); every
    window row still sees the whole valid prefix.

    Two traps this kills at once (both measured on-chip, CLAUDE.md):
    - a pallas call consuming a scan-sliced cache forces XLA to
      MATERIALISE the slice (a full per-layer cache copy per call — ~1 GB
      per draft forward at 16 tree lanes); the whole stack + a
      scalar-prefetched layer index DMAs layer blocks zero-copy, the same
      pattern as ops/pallas/int4_matmul.py::_int4_matmul_2d_stacked;
    - keeping the fresh window OUT of the cache means the layer scan
      writes the cache once per forward (models/transformer.py
      write_rows) instead of restacking it, and the kernel reads only
      ceil(length/block_k) blocks — O(valid) HBM traffic.

    With ``k_scale_all``/``v_scale_all`` the stacked cache holds int8
    codes (models/kv_quant.py): K scales fold into score columns and V
    scales into probability rows in-kernel (exact — scales factor out of
    the dots), halving prefix HBM traffic; the fresh window stays the
    caller-provided (already dequantized) bf16 k/v so numerics match the
    dense int8 path bit-for-bit.

    Returns [B, T, H, D] in q.dtype.
    """
    B, T, H, D = q.shape
    S = k_all.shape[2]
    Hkv = k_all.shape[3]
    rep = H // Hkv
    RT = rep * T
    block_k = min(block_k, S)
    if S % block_k:
        raise ValueError(f"S={S} must be divisible by block_k={block_k}")
    scale = D**-0.5

    qg = q.reshape(B, T, Hkv, rep, D).transpose(0, 2, 3, 1, 4).reshape(
        B, Hkv, RT, D
    )
    # per-row prefix lengths (continuous batching: [B] vector) or one
    # scalar length; the scalar form keeps [1] prefetch arrays and
    # row-independent index maps (measurably faster in nested programs)
    length = jnp.asarray(length, jnp.int32)
    row_ln = length.ndim == 1
    length = length.reshape(-1)
    n_blocks = jnp.maximum((length + block_k - 1) // block_k, 1)
    layer = jnp.asarray(layer, jnp.int32)
    RTp = _rt_pad(RT)
    quant = k_scale_all is not None
    bsel = (lambda nb, b: nb[b]) if row_ln else (lambda nb, b: nb[0])

    def q_map(b, j, nb, ln, l):
        return (b, 0, 0, 0)

    def kv_map(b, j, nb, ln, l):
        return (l[0], b, jnp.minimum(j, bsel(nb, b) - 1), 0, 0)

    def sc_map(b, j, nb, ln, l):
        return (l[0], b, jnp.minimum(j, bsel(nb, b) - 1), 0)

    def w_map(b, j, nb, ln, l):
        return (b, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, Hkv, RT, D), q_map),
        pl.BlockSpec((1, 1, block_k, Hkv, D), kv_map),
        pl.BlockSpec((1, 1, block_k, Hkv, D), kv_map),
    ]
    args = [qg, k_all, v_all]
    if quant:
        in_specs += [
            pl.BlockSpec((1, 1, block_k, Hkv), sc_map),
            pl.BlockSpec((1, 1, block_k, Hkv), sc_map),
        ]
        args += [
            k_scale_all.astype(jnp.float32), v_scale_all.astype(jnp.float32)
        ]
    masked = window_mask is not None
    if masked:
        in_specs += [pl.BlockSpec((T, T), lambda b, j, nb, ln, l: (0, 0))]
        args += [window_mask.astype(jnp.int32)]
    in_specs += [
        pl.BlockSpec((1, T, Hkv, D), w_map),
        pl.BlockSpec((1, T, Hkv, D), w_map),
    ]
    args += [k_new, v_new]

    out = pl.pallas_call(
        functools.partial(
            _kernel_stacked, block_k=block_k, T=T, scale=scale, quant=quant,
            masked=masked, row_ln=row_ln,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, S // block_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, Hkv, RT, D), q_map),
            scratch_shapes=[
                pltpu.VMEM((Hkv * RTp, 128), jnp.float32),
                pltpu.VMEM((Hkv * RTp, 128), jnp.float32),
                pltpu.VMEM((Hkv * RTp, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, RT, D), q.dtype),
        interpret=interpret,
    )(
        n_blocks, length, layer.reshape(1), *args
    )

    return out.reshape(B, Hkv, rep, T, D).transpose(0, 3, 1, 2, 4).reshape(
        B, T, H, D
    )


def pick_flash_block(S: int, Hkv: int, D: int) -> int:
    """Largest block_k dividing S whose K+V VMEM footprint (double
    buffered) stays within ~6 MB."""
    budget = 6 * 1024 * 1024
    for b in (512, 256, 128):
        if S % b == 0 and 4 * b * Hkv * D * 2 <= budget:
            return b
    return 128 if S % 128 == 0 else 0


def flash_decode_reference(q, k_cache, v_cache, length):
    """Dense jnp reference (mirrors models/transformer.py's masked path)."""
    B, T, H, D = q.shape
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    rep = H // Hkv
    qg = q.reshape(B, T, Hkv, rep, D)
    scores = jnp.einsum(
        "btgrd,bsgd->bgrts", qg, k_cache, preferred_element_type=jnp.float32
    ) * (D**-0.5)
    k_pos = jnp.arange(S)
    q_pos = length + jnp.arange(T)
    mask = k_pos[None, :] <= q_pos[:, None]
    scores = jnp.where(mask[None, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum(
        "bgrts,bsgd->btgrd", probs.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    )
    return ctx.reshape(B, T, H, D).astype(q.dtype)
