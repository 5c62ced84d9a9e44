"""INT4 stacked-kernel variant lab — on-chip A/B sweeps.

Round-3 perf work: the production stacked kernel
(ops/pallas/int4_matmul.py::_int4_matmul_2d_stacked) measured 65/64/49%
of the HBM roof at M=8/40/72 under TRUE streaming (8 distinct stacked
weights scanned by index — see tools/profile_kernels.py for why any other
measurement lies). bf16 dense hits ~100% of its own roof on the same
harness, so DMA pipelining is fine; the gap is in-body compute (VPU
nibble unpack + per-group affine fixup + many small MXU dots).

Each variant here is a full stacked, layer-indexed pallas kernel taking
(x [M, K], packed [L, K/2, N], scales [L, G, N], zeros [L, G, N], layer)
-> [M, N] f32, numerically equal (up to f32 reassociation) to
models/quant.py::int4_matmul_reference.

Usage: python tools/kernel_lab.py [M ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from duodecoding_tpu.models.quant import quantize_int4  # noqa: E402
from duodecoding_tpu.utils.profiler import PerformanceProfiler  # noqa: E402

F32_MAGIC = 0x3F800000  # f32 1.0 — nibble at mantissa bits [19,23) = 1 + n/16


# ---------------------------------------------------------------- bodies
# Each body: (x [TM, K] bf16, p_ref view fns, s/z view fns, o_ref) with
# static group_size/K. read_p(lo, hi) -> packed rows [lo, hi) of the
# layer's [K/2, TN] block; read_s/read_z(a, b) -> [b-a, TN] f32.
#
# Mosaic cast/shift support (measured the hard way): uint8->bf16 casts and
# 16-bit vector shifts DO NOT lower; the int32 widen is the known-good
# path, and the bitcast trick must build an f32 (mantissa magic) and
# convert f32->bf16.


def _u_i32(p, which):
    """Known-good unpack: uint8 -> int32 widen -> mask/shift -> bf16."""
    p32 = p.astype(jnp.int32)
    if which == 0:
        return (p32 & 0xF).astype(jnp.bfloat16)
    return ((p32 >> 4) & 0xF).astype(jnp.bfloat16)


def _u_f32cast(p, which):
    """Mantissa-magic unpack: value becomes 1 + n/16 (exact in bf16).
    int32 and/shift/or + bitcast-to-f32 + f32->bf16 convert — replaces the
    int32->bf16 convert with cheaper bit ops when that convert is slow."""
    p32 = p.astype(jnp.int32)
    n = (p32 & 0xF) if which == 0 else ((p32 >> 4) & 0xF)
    bits = F32_MAGIC | (n << 19)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def _per_group(x, read_p, read_s, read_z, o_ref, *, gs, K, unpack, magic):
    """Per-group dot + output affine (production structure)."""
    n_groups = K // gs
    half = K // 2
    g_half = half // gs
    TM = x.shape[0]
    acc = jnp.zeros((TM, o_ref.shape[1]), jnp.float32)
    for g in range(n_groups):
        a = g * gs if g < g_half else g * gs - half
        cg = unpack(read_p(a, a + gs), 0 if g < g_half else 1)
        xg = x[:, g * gs : (g + 1) * gs]
        partial = jnp.dot(xg, cg, preferred_element_type=jnp.float32)
        sg = read_s(g, g + 1)
        zg = read_z(g, g + 1)
        if magic:  # code value is 1 + n/16: y = partial*(16 s) + xsum*(z - 16 s)
            sg = sg * 16.0
            zg = zg - sg
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + partial * sg + xsum * zg
    o_ref[:] = acc


def body_base(x, rp, rs, rz, o, *, gs, K):
    _per_group(x, rp, rs, rz, o, gs=gs, K=K, unpack=_u_i32, magic=False)


def body_f32cast(x, rp, rs, rz, o, *, gs, K):
    _per_group(x, rp, rs, rz, o, gs=gs, K=K, unpack=_u_f32cast, magic=True)


def _body_fold(x, read_p, read_s, read_z, o_ref, *, gs, K, chunk, unpack,
               magic):
    """Scale-fold into codes (VPU pass over [rows, TN]) + ONE batched zero
    dot [TM, G] @ [G, TN]; `chunk` groups share each MXU dot."""
    n_groups = K // gs
    half = K // 2
    g_half = half // gs
    assert g_half % chunk == 0 and (n_groups - g_half) % chunk == 0
    TM = x.shape[0]
    TN = o_ref.shape[1]
    rows = chunk * gs
    acc = jnp.zeros((TM, TN), jnp.float32)
    for c in range(n_groups // chunk):
        g0 = c * chunk
        a = g0 * gs if g0 < g_half else g0 * gs - half
        cg = unpack(read_p(a, a + rows), 0 if g0 < g_half else 1)
        s = read_s(g0, g0 + chunk)  # [chunk, TN]
        if magic:
            s = s * 16.0
        sr = jnp.broadcast_to(s[:, None, :], (chunk, gs, TN)).reshape(rows, TN)
        cg = cg * sr.astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            x[:, g0 * gs : g0 * gs + rows], cg,
            preferred_element_type=jnp.float32,
        )
    xg = jnp.sum(
        x.astype(jnp.float32).reshape(TM, n_groups, gs), axis=-1
    )  # [TM, G]
    z = read_z(0, n_groups)
    if magic:
        z = z - 16.0 * read_s(0, n_groups)
    acc = acc + jnp.dot(
        xg.astype(jnp.bfloat16), z.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = acc


def body_fold1(x, rp, rs, rz, o, *, gs, K):
    _body_fold(x, rp, rs, rz, o, gs=gs, K=K, chunk=1, unpack=_u_i32,
               magic=False)


def body_fold2(x, rp, rs, rz, o, *, gs, K):
    _body_fold(x, rp, rs, rz, o, gs=gs, K=K, chunk=2, unpack=_u_i32,
               magic=False)


def body_foldb2(x, rp, rs, rz, o, *, gs, K):
    _body_fold(x, rp, rs, rz, o, gs=gs, K=K, chunk=2, unpack=_u_f32cast,
               magic=True)


def body_twoacc(x, read_p, read_s, read_z, o_ref, *, gs, K):
    """Per-group with TWO independent accumulator chains (break the serial
    acc dependency so even/odd group pipelines can overlap)."""
    n_groups = K // gs
    half = K // 2
    g_half = half // gs
    TM = x.shape[0]
    TN = o_ref.shape[1]
    accs = [jnp.zeros((TM, TN), jnp.float32) for _ in range(2)]
    for g in range(n_groups):
        a = g * gs if g < g_half else g * gs - half
        cg = _u_i32(read_p(a, a + gs), 0 if g < g_half else 1)
        xg = x[:, g * gs : (g + 1) * gs]
        partial = jnp.dot(xg, cg, preferred_element_type=jnp.float32)
        sg = read_s(g, g + 1)
        zg = read_z(g, g + 1)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        accs[g % 2] = accs[g % 2] + partial * sg + xsum * zg
    o_ref[:] = accs[0] + accs[1]


def body_pair(x, read_p, read_s, read_z, o_ref, *, gs, K):
    """Paired unpack: each packed byte is widened to i32 ONCE and yields
    BOTH nibbles (low group g, high group g + g_half); the high nibble
    needs no mask after >>4 (u8 widen zero-extends). Halves the widen
    passes and the packed VMEM reads vs base."""
    half = K // 2
    g_half = half // gs
    TM = x.shape[0]
    acc = jnp.zeros((TM, o_ref.shape[1]), jnp.float32)
    for g in range(g_half):
        a = g * gs
        w = read_p(a, a + gs).astype(jnp.int32)
        lo = (w & 0xF).astype(jnp.bfloat16)
        hi = (w >> 4).astype(jnp.bfloat16)
        gl, gh = g, g + g_half
        xl = x[:, a : a + gs]
        xh = x[:, half + a : half + a + gs]
        pl_ = jnp.dot(xl, lo, preferred_element_type=jnp.float32)
        ph_ = jnp.dot(xh, hi, preferred_element_type=jnp.float32)
        xsl = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
        xsh = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + (pl_ * read_s(gl, gl + 1) + xsl * read_z(gl, gl + 1))
        acc = acc + (ph_ * read_s(gh, gh + 1) + xsh * read_z(gh, gh + 1))
    o_ref[:] = acc


def body_pair2(x, read_p, read_s, read_z, o_ref, *, gs, K):
    """pair + two accumulator chains (low/high)."""
    half = K // 2
    g_half = half // gs
    TM = x.shape[0]
    TN = o_ref.shape[1]
    acc_l = jnp.zeros((TM, TN), jnp.float32)
    acc_h = jnp.zeros((TM, TN), jnp.float32)
    for g in range(g_half):
        a = g * gs
        w = read_p(a, a + gs).astype(jnp.int32)
        lo = (w & 0xF).astype(jnp.bfloat16)
        hi = (w >> 4).astype(jnp.bfloat16)
        gl, gh = g, g + g_half
        xl = x[:, a : a + gs]
        xh = x[:, half + a : half + a + gs]
        pl_ = jnp.dot(xl, lo, preferred_element_type=jnp.float32)
        ph_ = jnp.dot(xh, hi, preferred_element_type=jnp.float32)
        xsl = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
        xsh = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
        acc_l = acc_l + (pl_ * read_s(gl, gl + 1) + xsl * read_z(gl, gl + 1))
        acc_h = acc_h + (ph_ * read_s(gh, gh + 1) + xsh * read_z(gh, gh + 1))
    o_ref[:] = acc_l + acc_h


def body_diag_noaffine(x, read_p, read_s, read_z, o_ref, *, gs, K):
    """DIAGNOSTIC (wrong results): pair without the output affine."""
    half = K // 2
    g_half = half // gs
    TM = x.shape[0]
    acc = jnp.zeros((TM, o_ref.shape[1]), jnp.float32)
    for g in range(g_half):
        a = g * gs
        w = read_p(a, a + gs).astype(jnp.int32)
        lo = (w & 0xF).astype(jnp.bfloat16)
        hi = (w >> 4).astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            x[:, a : a + gs], lo, preferred_element_type=jnp.float32
        )
        acc = acc + jnp.dot(
            x[:, half + a : half + a + gs], hi,
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = acc


def body_diag_nodot(x, read_p, read_s, read_z, o_ref, *, gs, K):
    """DIAGNOSTIC (wrong results): unpack + affine, dots replaced by a
    cheap reduction of the codes (keeps the unpack live)."""
    half = K // 2
    g_half = half // gs
    TM = x.shape[0]
    TN = o_ref.shape[1]
    acc = jnp.zeros((TM, TN), jnp.float32)
    for g in range(g_half):
        a = g * gs
        w = read_p(a, a + gs).astype(jnp.int32)
        lo = (w & 0xF).astype(jnp.bfloat16)
        hi = (w >> 4).astype(jnp.bfloat16)
        red = (
            jnp.sum(lo.astype(jnp.float32), axis=0, keepdims=True)
            + jnp.sum(hi.astype(jnp.float32), axis=0, keepdims=True)
        )  # [1, TN]
        gl, gh = g, g + g_half
        acc = acc + (red * read_s(gl, gl + 1) + read_z(gh, gh + 1))
    o_ref[:] = acc


def body_diag_dotonly(x, read_p, read_s, read_z, o_ref, *, gs, K):
    """DIAGNOSTIC (wrong results): dots on bitcast planes, no unpack VPU
    work (packed bytes pair-bitcast to bf16 = garbage values)."""
    half = K // 2
    g_half = half // gs
    TM = x.shape[0]
    acc = jnp.zeros((TM, o_ref.shape[1]), jnp.float32)
    for g in range(g_half):
        a = g * gs
        w = read_p(a, a + gs)  # [gs, TN] u8
        cg = jax.lax.bitcast_convert_type(
            w.reshape(gs // 2, 2, w.shape[1]).transpose(0, 2, 1), jnp.bfloat16
        ).transpose(0, 2, 1).reshape(gs // 2, w.shape[1])  # [gs/2, TN]
        cg = jnp.concatenate([cg, cg], axis=0)
        gl, gh = g, g + g_half
        xl = x[:, a : a + gs]
        partial = jnp.dot(xl, cg, preferred_element_type=jnp.float32)
        xsl = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + (partial * read_s(gl, gl + 1) + xsl * read_z(gl, gl + 1))
        acc = acc + (partial * read_s(gh, gh + 1) + xsl * read_z(gh, gh + 1))
    o_ref[:] = acc


def body_zdot(x, read_p, read_s, read_z, o_ref, *, gs, K):
    """Per-group dot + SINGLE scale multiply on the output; ALL zero-point
    terms batched into one [TM, G] @ [G, TN] MXU dot at the end (the
    per-group xsum*z VPU op — half the affine cost — moves to the MXU,
    and xsums are one pass over x instead of one per group)."""
    n_groups = K // gs
    half = K // 2
    g_half = half // gs
    TM = x.shape[0]
    acc = jnp.zeros((TM, o_ref.shape[1]), jnp.float32)
    for g in range(n_groups):
        a = g * gs if g < g_half else g * gs - half
        cg = _u_i32(read_p(a, a + gs), 0 if g < g_half else 1)
        xg = x[:, g * gs : (g + 1) * gs]
        partial = jnp.dot(xg, cg, preferred_element_type=jnp.float32)
        acc = acc + partial * read_s(g, g + 1)
    xsums = jnp.sum(
        x.astype(jnp.float32).reshape(TM, n_groups, gs), axis=-1
    ).astype(jnp.bfloat16)  # [TM, G]
    acc = acc + jnp.dot(
        xsums, read_z(0, n_groups).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = acc


def body_zdot_pair(x, read_p, read_s, read_z, o_ref, *, gs, K):
    """zdot + paired unpack (each packed byte widened once, no mask on the
    high nibble)."""
    n_groups = K // gs
    half = K // 2
    g_half = half // gs
    TM = x.shape[0]
    acc = jnp.zeros((TM, o_ref.shape[1]), jnp.float32)
    for g in range(g_half):
        a = g * gs
        w = read_p(a, a + gs).astype(jnp.int32)
        lo = (w & 0xF).astype(jnp.bfloat16)
        hi = (w >> 4).astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            x[:, a : a + gs], lo, preferred_element_type=jnp.float32
        ) * read_s(g, g + 1)
        acc = acc + jnp.dot(
            x[:, half + a : half + a + gs], hi,
            preferred_element_type=jnp.float32,
        ) * read_s(g + g_half, g + g_half + 1)
    xsums = jnp.sum(
        x.astype(jnp.float32).reshape(TM, n_groups, gs), axis=-1
    ).astype(jnp.bfloat16)  # [TM, G]
    acc = acc + jnp.dot(
        xsums, read_z(0, n_groups).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = acc


def _u_u8mask(p, which):
    """Mask/shift in uint8 (4x denser VPU vectors), then widen+convert."""
    if which == 0:
        n = p & jnp.uint8(0xF)
    else:
        n = p >> jnp.uint8(4)
    return n.astype(jnp.int32).astype(jnp.bfloat16)


def body_u8mask(x, rp, rs, rz, o, *, gs, K):
    _per_group(x, rp, rs, rz, o, gs=gs, K=K, unpack=_u_u8mask, magic=False)


def body_pair_u8(x, read_p, read_s, read_z, o_ref, *, gs, K):
    """pair structure + uint8 mask/shift before the widen."""
    half = K // 2
    g_half = half // gs
    TM = x.shape[0]
    acc = jnp.zeros((TM, o_ref.shape[1]), jnp.float32)
    for g in range(g_half):
        a = g * gs
        w = read_p(a, a + gs)
        lo = (w & jnp.uint8(0xF)).astype(jnp.int32).astype(jnp.bfloat16)
        hi = (w >> jnp.uint8(4)).astype(jnp.int32).astype(jnp.bfloat16)
        gl, gh = g, g + g_half
        xl = x[:, a : a + gs]
        xh = x[:, half + a : half + a + gs]
        pl_ = jnp.dot(xl, lo, preferred_element_type=jnp.float32)
        ph_ = jnp.dot(xh, hi, preferred_element_type=jnp.float32)
        xsl = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
        xsh = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + (pl_ * read_s(gl, gl + 1) + xsl * read_z(gl, gl + 1))
        acc = acc + (ph_ * read_s(gh, gh + 1) + xsh * read_z(gh, gh + 1))
    o_ref[:] = acc


BODIES = {
    "base": body_base,
    "f32cast": body_f32cast,
    "fold1": body_fold1,
    "fold2": body_fold2,
    "foldb2": body_foldb2,
    "twoacc": body_twoacc,
    "pair": body_pair,
    "zdot": body_zdot,
    "u8mask": body_u8mask,
    "pair_u8": body_pair_u8,
    "zdot_pair": body_zdot_pair,
    "pair2": body_pair2,
    "diag_noaffine": body_diag_noaffine,
    "diag_nodot": body_diag_nodot,
    "diag_dotonly": body_diag_dotonly,
}


# ------------------------------------------------------------- wrappers


def _pick_tile_n(n: int, k: int) -> int:
    for t in (512, 256, 128):
        if n % t == 0 and (k // 2) * t <= 1536 * 1024:
            return t
    return 128


def make_stacked(body_name: str, tile_n: int | None = None,
                 parallel: bool = False, vmem_mb: int | None = None,
                 xblock_mb: int = 2):
    body = BODIES[body_name]
    cp = {}
    if parallel:
        cp["dimension_semantics"] = ("parallel", "parallel")
    if vmem_mb:
        cp["vmem_limit_bytes"] = vmem_mb * 1024 * 1024
    compiler_params = pltpu.CompilerParams(**cp) if cp else None

    @functools.partial(jax.jit, static_argnames=("gs", "tn"))
    def run(x, packed, scales, zeros, layer, gs, tn):  # noqa: B023
        M, K = x.shape
        N = packed.shape[2]
        n_groups = K // gs
        TM = max(8, ((M + 7) // 8) * 8)
        TM = min(TM, max(8, (xblock_mb * 1024 * 1024 // (2 * K)) // 8 * 8))
        Mp = ((M + TM - 1) // TM) * TM
        if Mp != M:
            x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        lidx = jnp.asarray(layer, jnp.int32).reshape(1)

        def kernel(l_ref, x_ref, p_ref, s_ref, z_ref, o_ref):
            del l_ref
            body(
                x_ref[:],
                lambda lo, hi: p_ref[0, lo:hi, :],
                lambda a, b: s_ref[0, a:b, :],
                lambda a, b: z_ref[0, a:b, :],
                o_ref,
                gs=gs,
                K=K,
            )

        grid = (Mp // TM, N // tn)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((TM, K), lambda i, j, l: (i, 0)),
                    pl.BlockSpec((1, K // 2, tn), lambda i, j, l: (l[0], 0, j)),
                    pl.BlockSpec((1, n_groups, tn), lambda i, j, l: (l[0], 0, j)),
                    pl.BlockSpec((1, n_groups, tn), lambda i, j, l: (l[0], 0, j)),
                ],
                out_specs=pl.BlockSpec((TM, tn), lambda i, j, l: (i, j)),
            ),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * K * N,
                bytes_accessed=K // 2 * N + 8 * n_groups * N + Mp * K * 2,
                transcendentals=0,
            ),
            compiler_params=compiler_params,
        )(lidx, x.astype(jnp.bfloat16), packed, scales, zeros)
        return out[:M]

    def call(x, q, layer, gs):
        K = x.shape[-1]
        N = q["packed"].shape[2]
        tn = tile_n or _pick_tile_n(N, K)
        return run(x, q["packed"], q["scales"], q["zeros"], layer, gs, tn)

    return call


def make_kgrid(nk: int = 4, tile_n: int | None = None):
    """3D-grid variant: K split into `nk` chunks iterated as the innermost
    'arbitrary' grid dim with output accumulation — finer DMA pipelining
    (small packed blocks stream while previous chunks compute). Each k-step
    covers packed rows [a, a+R), i.e. code rows [a, a+R) (low nibbles) AND
    [K/2+a, ...) (high nibbles); scales/zeros ride as full-G blocks (same
    index across k -> fetched once) and are sliced in-body."""

    @functools.partial(jax.jit, static_argnames=("gs", "tn", "nk_"))
    def run(x, packed, scales, zeros, layer, gs, tn, nk_):
        M, K = x.shape
        N = packed.shape[2]
        half = K // 2
        g_half = half // gs
        assert g_half % nk_ == 0, (g_half, nk_)
        cg = g_half // nk_  # groups per k-step per nibble
        R = cg * gs  # packed rows per k-step
        n_groups = K // gs
        TM = max(8, ((M + 7) // 8) * 8)
        Mp = ((M + TM - 1) // TM) * TM
        if Mp != M:
            x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        lidx = jnp.asarray(layer, jnp.int32).reshape(1)

        def kernel(l_ref, x_ref, p_ref, sl_ref, sh_ref, zl_ref, zh_ref,
                   o_ref):
            del l_ref
            k = pl.program_id(2)
            TMk = x_ref.shape[0]
            p = p_ref[0]  # [R, tn]
            lo = _u_i32(p, 0)
            hi = _u_i32(p, 1)
            # [cg, tn] — blocked by the k index map; the affine arrays
            # ride as [L, G, 1, N] so the cg block dim is NOT minor-2
            # (Mosaic requires minor-2 block dims divisible by 8, and
            # G=108 at the 13B w_down shape has no 8-multiple divisor)
            sl = sl_ref[0, :, 0, :]
            sh = sh_ref[0, :, 0, :]
            srl = jnp.broadcast_to(sl[:, None, :], (cg, gs, tn)).reshape(R, tn)
            srh = jnp.broadcast_to(sh[:, None, :], (cg, gs, tn)).reshape(R, tn)
            lo = lo * srl.astype(jnp.bfloat16)
            hi = hi * srh.astype(jnp.bfloat16)
            xl = x_ref[:, pl.ds(k * R, R)]
            xh = x_ref[:, pl.ds(half + k * R, R)]
            part = jnp.dot(
                xl, lo, preferred_element_type=jnp.float32
            ) + jnp.dot(xh, hi, preferred_element_type=jnp.float32)
            xgl = jnp.sum(
                xl.astype(jnp.float32).reshape(TMk, cg, gs), axis=-1
            ).astype(jnp.bfloat16)
            xgh = jnp.sum(
                xh.astype(jnp.float32).reshape(TMk, cg, gs), axis=-1
            ).astype(jnp.bfloat16)
            zl = zl_ref[0, :, 0, :].astype(jnp.bfloat16)
            zh = zh_ref[0, :, 0, :].astype(jnp.bfloat16)
            part = part + jnp.dot(xgl, zl, preferred_element_type=jnp.float32)
            part = part + jnp.dot(xgh, zh, preferred_element_type=jnp.float32)

            @pl.when(k == 0)
            def _():
                o_ref[:] = part

            @pl.when(k > 0)
            def _():
                o_ref[:] = o_ref[:] + part

        grid = (Mp // TM, N // tn, nk_)
        affine_lo = pl.BlockSpec(
            (1, cg, 1, tn), lambda i, j, k, l: (l[0], k, 0, j)
        )
        affine_hi = pl.BlockSpec(
            (1, cg, 1, tn), lambda i, j, k, l: (l[0], nk_ + k, 0, j)
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((TM, K), lambda i, j, k, l: (i, 0)),
                    pl.BlockSpec((1, R, tn), lambda i, j, k, l: (l[0], k, j)),
                    affine_lo,
                    affine_hi,
                    affine_lo,
                    affine_hi,
                ],
                out_specs=pl.BlockSpec((TM, tn), lambda i, j, k, l: (i, j)),
            ),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * K * N,
                bytes_accessed=K // 2 * N + 8 * n_groups * N + Mp * K * 2,
                transcendentals=0,
            ),
            interpret=jax.default_backend() != "tpu",
        )(lidx, x.astype(jnp.bfloat16), packed,
          scales[:, :, None, :], scales[:, :, None, :],
          zeros[:, :, None, :], zeros[:, :, None, :])
        return out[:M]

    def call(x, q, layer, gs):
        K = x.shape[-1]
        N = q["packed"].shape[2]
        tn = tile_n or _pick_tile_n(N, K)
        return run(x, q["packed"], q["scales"], q["zeros"], layer, gs, tn, nk)

    return call


def make_epipe(nk: int = 6, tile_n: int | None = None):
    """emit_pipeline variant (VERDICT r4 item 2 candidate b): outer 2D
    PARALLEL grid (M, N tiles) with packed weights HBM-resident
    (memory_space=ANY); inside the kernel a Mosaic-managed inner pipeline
    (pltpu.emit_pipeline, grid=(nk,)) double-buffers R-row packed chunks
    into VMEM while the MXU consumes the previous chunk; partials
    accumulate in a VMEM scratch and the out block is written once.
    Affine rows ride as full-G VMEM blocks shaped [1, G, 1, tn] so the
    in-body chunk slice lands on an UNTILED dim (Mosaic rejects dynamic
    sublane slices not provably 8-aligned).

    MEASURED (round 5, w_down shape K=13824 N=5120, M=8/40/88): 22.4 /
    21.2 / 22.8 % of roof — IDENTICAL to the arbitrary-dim kgrid
    (23.8/21.8/23.3) and to kgrid9/epipe9. Together with round 4's
    manual-DMA streamed kernel (DMA-latency-bound) this closes VERDICT
    r4 item 2 with a negative: EVERY K-chunked restructuring of this
    kernel — grid-level accumulation, Mosaic-managed inner pipeline, or
    manual double-buffered DMA — collapses to the same ~150 GB/s
    packed-stream wall regardless of mechanism and of chunk count,
    ~3x slower than the production full-K single-pass grid (72.6/64.3/
    54.9% at the same Ms). The production structure (whole-K blocks,
    Mosaic prefetching across the parallel N grid) is the right one on
    this Mosaic version; the residual M-scaling gap is unpack VPU
    volume, which no chunking addresses."""

    @functools.partial(jax.jit, static_argnames=("gs", "tn", "nk_"))
    def run(x, packed, scales, zeros, layer, gs, tn, nk_):
        M, K = x.shape
        N = packed.shape[2]
        half = K // 2
        g_half = half // gs
        assert g_half % nk_ == 0, (g_half, nk_)
        cg = g_half // nk_
        R = cg * gs
        n_groups = K // gs
        TM = max(8, ((M + 7) // 8) * 8)
        Mp = ((M + TM - 1) // TM) * TM
        if Mp != M:
            x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        lidx = jnp.asarray(layer, jnp.int32).reshape(1)

        def kernel(l_ref, x_ref, p_hbm, s_ref, z_ref, o_ref, acc_ref):
            j = pl.program_id(1)
            layer_i = l_ref[0]
            TMk = x_ref.shape[0]

            def inner(p_ref):
                k = pl.program_id(0)
                p = p_ref[0]  # [R, tn] u8
                lo = _u_i32(p, 0)
                hi = _u_i32(p, 1)
                sl = s_ref[0, pl.ds(k * cg, cg), 0, :]
                sh = s_ref[0, pl.ds(g_half + k * cg, cg), 0, :]
                srl = jnp.broadcast_to(
                    sl[:, None, :], (cg, gs, tn)
                ).reshape(R, tn)
                srh = jnp.broadcast_to(
                    sh[:, None, :], (cg, gs, tn)
                ).reshape(R, tn)
                lo = lo * srl.astype(jnp.bfloat16)
                hi = hi * srh.astype(jnp.bfloat16)
                xl = x_ref[:, pl.ds(k * R, R)]
                xh = x_ref[:, pl.ds(half + k * R, R)]
                part = jnp.dot(
                    xl, lo, preferred_element_type=jnp.float32
                ) + jnp.dot(xh, hi, preferred_element_type=jnp.float32)
                xgl = jnp.sum(
                    xl.astype(jnp.float32).reshape(TMk, cg, gs), axis=-1
                ).astype(jnp.bfloat16)
                xgh = jnp.sum(
                    xh.astype(jnp.float32).reshape(TMk, cg, gs), axis=-1
                ).astype(jnp.bfloat16)
                zl = z_ref[0, pl.ds(k * cg, cg), 0, :].astype(jnp.bfloat16)
                zh = z_ref[
                    0, pl.ds(g_half + k * cg, cg), 0, :
                ].astype(jnp.bfloat16)
                part = part + jnp.dot(
                    xgl, zl, preferred_element_type=jnp.float32
                )
                part = part + jnp.dot(
                    xgh, zh, preferred_element_type=jnp.float32
                )

                @pl.when(k == 0)
                def _():
                    acc_ref[:] = part

                @pl.when(k > 0)
                def _():
                    acc_ref[:] = acc_ref[:] + part

            pipe = pltpu.emit_pipeline(
                inner,
                grid=(nk_,),
                in_specs=[
                    pl.BlockSpec(
                        (1, R, tn), lambda k: (layer_i, k, j)
                    ),
                ],
            )
            pipe(p_hbm)
            o_ref[:] = acc_ref[:]

        grid = (Mp // TM, N // tn)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((TM, K), lambda i, j, l: (i, 0)),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(
                        (1, n_groups, 1, tn),
                        lambda i, j, l: (l[0], 0, 0, j),
                    ),
                    pl.BlockSpec(
                        (1, n_groups, 1, tn),
                        lambda i, j, l: (l[0], 0, 0, j),
                    ),
                ],
                out_specs=pl.BlockSpec((TM, tn), lambda i, j, l: (i, j)),
                scratch_shapes=[pltpu.VMEM((TM, tn), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * K * N,
                bytes_accessed=K // 2 * N + 8 * n_groups * N + Mp * K * 2,
                transcendentals=0,
            ),
            interpret=jax.default_backend() != "tpu",
        )(lidx, x.astype(jnp.bfloat16), packed,
          scales[:, :, None, :], zeros[:, :, None, :])
        return out[:M]

    def call(x, q, layer, gs):
        K = x.shape[-1]
        N = q["packed"].shape[2]
        tn = tile_n or _pick_tile_n(N, K)
        return run(x, q["packed"], q["scales"], q["zeros"], layer, gs, tn, nk)

    return call


# ------------------------------------------------------------- harness


def make_stream(tile_n=None):
    """Production streamed kernel (ops/pallas/int4_matmul.py
    _kernel_streamed): HBM-resident packed weights + double-buffered
    group-pair chunk DMA; tile_n unlocked from the VMEM cap."""
    from duodecoding_tpu.ops.pallas.int4_matmul import (
        _int4_matmul_2d_streamed,
        _pick_tiles_streamed,
    )

    def call(x, q, layer, gs):
        import os

        M, K = x.shape
        N = q["packed"].shape[2]
        if tile_n:
            os.environ["DUODEC_INT4_STREAM_TILE_N"] = str(tile_n)
        try:
            tm, tn = _pick_tiles_streamed(M, N, K, gs)
        finally:
            os.environ.pop("DUODEC_INT4_STREAM_TILE_N", None)
        if not tn:
            raise ValueError(f"no streamed tiling for M={M} N={N}")
        Mp = ((M + tm - 1) // tm) * tm
        x2 = jnp.pad(x, ((0, Mp - M), (0, 0))) if Mp != M else x
        out = _int4_matmul_2d_streamed(
            x2, q["packed"], q["scales"], q["zeros"],
            jnp.asarray(layer, jnp.int32), gs, tm, tn,
        )
        return out[:M]

    return call


def make_prod():
    """Production dispatcher default (grid-pipelined stacked kernel)."""
    from duodecoding_tpu.ops.pallas.int4_matmul import int4_matmul

    def call(x, q, layer, gs):
        return int4_matmul(x, q, layer=jnp.asarray(layer, jnp.int32))

    return call


def stacked_per_rep(fn, x, qs, gs, label, outers=(16, 64), nw=8):
    def make(outer):
        @jax.jit
        def run(x, ws):
            def outer_step(carry, j):
                def inner_step(c, i):
                    out = fn(x + (i + j).astype(x.dtype), ws, i, gs)
                    return (
                        jnp.maximum(c, jnp.max(out).astype(jnp.float32)),
                        None,
                    )

                c, _ = jax.lax.scan(inner_step, carry, jnp.arange(nw))
                return c, None

            s, _ = jax.lax.scan(
                outer_step, jnp.float32(-1e30), jnp.arange(outer)
            )
            return s

        return run

    outs = {}
    for outer in outers:
        run = make(outer)
        t0 = time.perf_counter()
        float(run(x, qs))
        compile_s = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, qs))
            best = min(best, time.perf_counter() - t0)
        outs[outer] = best
        print(
            f"  [{label}] outer={outer}: compile {compile_s:.1f}s, "
            f"best {best * 1e3:.2f}ms",
            file=sys.stderr,
            flush=True,
        )
    o1, o2 = outers
    return (outs[o2] - outs[o1]) / ((o2 - o1) * nw)


def check_correct(fn, gs=128):
    """CPU-interpret-free numeric check at tiny shapes on the device."""
    from duodecoding_tpu.models.quant import int4_matmul_reference

    key = jax.random.PRNGKey(0)
    # half=2304: g_half=18 — kgrid chunk counts 2/3/6/9/18 (the divisors
    # of the 13B w_down g_half=54 actually swept) all divide
    K, N, L = 4608, 512, 2
    w = jax.random.normal(key, (L, K, N), jnp.float32) * 0.1
    q = quantize_int4(w, group_size=gs)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, K), jnp.bfloat16)
    for layer in range(L):
        got = fn(x, q, layer, gs)
        ql = {k: v[layer] for k, v in q.items()}
        want = int4_matmul_reference(x, ql)
        err = float(jnp.max(jnp.abs(got - want)))
        rel = err / float(jnp.max(jnp.abs(want)))
        if rel > 2e-2:
            raise AssertionError(f"variant mismatch: rel {rel:.4f}")
    return True


def sweep(Ms, variants, K=None, N=None, gs=128, nw=8):
    import os
    K = K or int(os.environ.get("LAB_K", "5120"))
    N = N or int(os.environ.get("LAB_N", "13824"))
    prof = PerformanceProfiler()
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.02
    q = quantize_int4(w, group_size=gs)
    qs = jax.tree.map(lambda a: jnp.stack([a] * nw), q)
    flops0 = 2 * K * N
    rows = []
    for name, fn in variants.items():
        if not name.startswith("diag"):
            try:
                check_correct(fn, gs)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: CORRECTNESS FAIL {e}")
                continue
        for M in Ms:
            x0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
            int4_bytes = (
                K // 2 * N + 2 * 4 * (K // gs) * N + M * K * 2 + M * N * 4
            )
            try:
                t = stacked_per_rep(fn, x0, qs, gs, f"{name} M={M}", nw=nw)
            except Exception as e:  # noqa: BLE001
                print(f"{name} M={M}: FAIL {type(e).__name__}: {e}")
                continue
            sol = prof.speed_of_light(int4_bytes, flops0 * M)
            rows.append((name, M, t * 1e6, sol * 1e6, sol / t))
    print(f"\nstacked INT4 K={K} N={N} gs={gs}")
    print(f"{'variant':12s} {'M':>4s} {'us':>9s} {'SoL us':>9s} {'SoL':>8s}")
    for name, M, us, sol_us, frac in rows:
        print(f"{name:12s} {M:4d} {us:9.1f} {sol_us:9.1f} {frac:8.2%}")
    return rows


if __name__ == "__main__":
    args = sys.argv[1:]
    Ms = [int(a) for a in args if a.isdigit()] or [8, 40, 72]
    names = [a for a in args if not a.isdigit()]
    if names:
        variants = {}
        for n in names:
            if n == "prod":
                variants[n] = make_prod()
            elif n.startswith("stream"):
                variants[n] = make_stream(int(n[6:]) if n[6:] else None)
            elif n.startswith("epipe"):
                spec = n[5:]
                if "@" in spec:
                    nk_s, tn_s = spec.split("@")
                    variants[n] = make_epipe(int(nk_s), int(tn_s))
                else:
                    variants[n] = make_epipe(int(spec or 6))
            elif n.startswith("kgrid"):
                # kgridN or kgridN@TN (explicit tile_n: the K-split's
                # whole point at w_down shapes is that the per-step
                # packed block R x TN stays small, so TN can exceed the
                # full-K kernel's 128 cap)
                spec = n[5:]
                if "@" in spec:
                    nk_s, tn_s = spec.split("@")
                    variants[n] = make_kgrid(int(nk_s), int(tn_s))
                else:
                    variants[n] = make_kgrid(int(spec or 8))
            elif n.endswith("+par"):
                variants[n] = make_stacked(n[:-4], parallel=True)
            elif n.endswith("+vmem"):
                variants[n] = make_stacked(n[:-5], vmem_mb=12)
            elif n.endswith("+m4"):
                variants[n] = make_stacked(n[:-3], xblock_mb=4)
            elif n.endswith("+best"):
                variants[n] = make_stacked(n[:-5], xblock_mb=4, vmem_mb=12)
            else:
                variants[n] = make_stacked(n)
    else:
        variants = {n: make_stacked(n) for n in BODIES}
        variants["kgrid2"] = make_kgrid(2)
        variants["kgrid4"] = make_kgrid(4)
    sweep(Ms, variants)
