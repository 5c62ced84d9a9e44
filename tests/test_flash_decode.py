"""Flash decode attention kernel: parity with the dense masked path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.ops.pallas.flash_decode import (
    flash_decode_attention,
    flash_decode_reference,
)


@pytest.mark.parametrize(
    "B,T,H,Hkv,D,S,length,block_k",
    [
        (1, 1, 4, 2, 64, 256, 17, 128),  # plain decode, GQA
        (1, 5, 4, 4, 64, 256, 40, 128),  # verify window, MHA
        (2, 1, 8, 2, 64, 512, 300, 128),  # batched
        (1, 3, 4, 2, 64, 256, 0, 128),  # empty prefix (prefill head)
        (1, 1, 4, 2, 64, 256, 255, 128),  # nearly full cache
        (1, 1, 8, 2, 64, 4096, 2900, 512),  # long context
    ],
)
def test_flash_matches_dense(B, T, H, Hkv, D, S, length, block_k):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    # stale tail should not affect the result: poison it
    k = k.at[:, length + T :].set(1e3)
    v = v.at[:, length + T :].set(1e3)
    out = flash_decode_attention(
        q, k, v, jnp.int32(length), block_k=block_k, interpret=True
    )
    ref = flash_decode_reference(q, k, v, jnp.int32(length))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_poisoned_tail_does_not_leak():
    """Large stale garbage beyond the valid region must not affect the
    output (the fixed-shape cache always carries stale data past
    `length`; stale data is finite — old K/V rows)."""
    rng = np.random.default_rng(1)
    B, T, H, Hkv, D, S = 1, 2, 4, 2, 64, 256
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    out_clean = flash_decode_attention(
        q, k, v, jnp.int32(48), interpret=True, block_k=128
    )
    k = k.at[:, 50:].set(1e6)
    v = v.at[:, 50:].set(-1e6)
    out = flash_decode_attention(q, k, v, jnp.int32(48), interpret=True, block_k=128)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_clean), rtol=1e-5, atol=1e-5
    )


def test_flash_int8_matches_dequant_dense():
    """In-kernel int8 dequant == dense attention over the dequantized
    cache (models/kv_quant.py scales)."""
    from duodecoding_tpu.models.kv_quant import dequantize_kv, quantize_kv

    rng = np.random.default_rng(3)
    B, T, H, Hkv, D, S, length = 1, 2, 4, 2, 64, 256, 37
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    k_codes, k_s = quantize_kv(kf)
    v_codes, v_s = quantize_kv(vf)
    out = flash_decode_attention(
        q, k_codes, v_codes, jnp.int32(length), k_s, v_s,
        block_k=128, interpret=True,
    )
    ref = flash_decode_reference(
        q,
        dequantize_kv(k_codes, k_s, jnp.float32),
        dequantize_kv(v_codes, v_s, jnp.float32),
        jnp.int32(length),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


class TestStackedFlash:
    """flash_decode_stacked: layer-indexed stacked cache + fused fresh
    window vs the dense reference with the window written into the cache."""

    @pytest.mark.parametrize(
        "L,B,T,H,Hkv,D,S,length,block_k,layer",
        [
            (2, 1, 1, 4, 2, 64, 256, 17, 128, 1),  # plain decode, GQA
            (3, 8, 1, 4, 4, 64, 512, 200, 128, 2),  # tree lanes, MHA
            (2, 2, 6, 4, 2, 64, 256, 40, 128, 0),  # catch-up window
            (2, 1, 3, 4, 2, 64, 256, 0, 128, 1),  # empty prefix (prefill)
            (2, 1, 1, 8, 2, 64, 512, 300, 128, 0),  # rep=4
            (2, 1, 2, 4, 2, 64, 256, 128, 128, 1),  # length at block edge
            (2, 1, 1, 4, 2, 64, 256, 255, 128, 0),  # nearly full cache
        ],
    )
    def test_matches_dense(self, L, B, T, H, Hkv, D, S, length, block_k, layer):
        from duodecoding_tpu.ops.pallas.flash_decode import (
            flash_decode_stacked,
        )

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
        k_all = jnp.asarray(rng.normal(size=(L, B, S, Hkv, D)), jnp.float32)
        v_all = jnp.asarray(rng.normal(size=(L, B, S, Hkv, D)), jnp.float32)
        k_new = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
        # stale tail (incl. the window slots) must not leak
        k_all = k_all.at[:, :, length:].set(1e3)
        v_all = v_all.at[:, :, length:].set(-1e3)
        out = flash_decode_stacked(
            q, k_all, v_all, k_new, v_new, jnp.int32(length),
            jnp.int32(layer), block_k=block_k, interpret=True,
        )
        kc = k_all[layer].at[:, length : length + T].set(k_new)
        vc = v_all[layer].at[:, length : length + T].set(v_new)
        ref = flash_decode_reference(q, kc, vc, jnp.int32(length))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


class TestStackedFlashInt8:
    """int8 stacked kernel: in-kernel scale folding must equal dequantizing
    the whole cache and running the dense reference."""

    @pytest.mark.parametrize(
        "L,B,T,H,Hkv,D,S,length,layer",
        [
            (2, 1, 1, 4, 2, 64, 256, 17, 1),
            (3, 2, 5, 4, 4, 64, 512, 200, 2),
            (2, 1, 2, 4, 2, 64, 256, 128, 0),
        ],
    )
    def test_matches_dense(self, L, B, T, H, Hkv, D, S, length, layer):
        from duodecoding_tpu.models.kv_quant import dequantize_kv, quantize_kv
        from duodecoding_tpu.ops.pallas.flash_decode import (
            flash_decode_stacked,
        )

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
        kf = jnp.asarray(rng.normal(size=(L, B, S, Hkv, D)), jnp.float32)
        vf = jnp.asarray(rng.normal(size=(L, B, S, Hkv, D)), jnp.float32)
        k_codes, k_s = quantize_kv(kf)
        v_codes, v_s = quantize_kv(vf)
        k_new = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
        out = flash_decode_stacked(
            q, k_codes, v_codes, k_new, v_new, jnp.int32(length),
            jnp.int32(layer), k_s, v_s, block_k=128, interpret=True,
        )
        kd = dequantize_kv(k_codes[layer], k_s[layer], jnp.float32)
        vd = dequantize_kv(v_codes[layer], v_s[layer], jnp.float32)
        kc = kd.at[:, length : length + T].set(k_new)
        vc = vd.at[:, length : length + T].set(v_new)
        ref = flash_decode_reference(q, kc, vc, jnp.int32(length))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )


class TestStackedFlashTreeMask:
    """window_mask variant: arbitrary intra-window (ancestor) visibility
    must match a dense softmax with the same [T, T] mask; the prefix stays
    fully visible to every window row."""

    @pytest.mark.parametrize(
        "L,B,T,H,Hkv,D,S,length,layer,quant",
        [
            (2, 1, 10, 4, 2, 64, 256, 33, 1, False),  # GQA tree verify
            (3, 1, 9, 4, 4, 64, 512, 200, 2, False),  # MHA deep prefix
            (2, 1, 8, 4, 2, 64, 256, 0, 0, False),  # empty prefix
            (2, 1, 12, 4, 4, 64, 256, 100, 1, True),  # int8 cache
        ],
    )
    def test_matches_masked_dense(self, L, B, T, H, Hkv, D, S, length, layer, quant):
        from duodecoding_tpu.ops.pallas.flash_decode import (
            NEG_INF,
            flash_decode_stacked,
        )

        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
        kf = jnp.asarray(rng.normal(size=(L, B, S, Hkv, D)), jnp.float32)
        vf = jnp.asarray(rng.normal(size=(L, B, S, Hkv, D)), jnp.float32)
        k_new = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
        # ancestor-style mask: random lower-triangular pattern with the
        # diagonal always on (each node sees itself)
        wm = np.tril(rng.integers(0, 2, (T, T))).astype(bool)
        np.fill_diagonal(wm, True)
        wm = jnp.asarray(wm)

        if quant:
            from duodecoding_tpu.models.kv_quant import (
                dequantize_kv, quantize_kv,
            )

            k_codes, k_s = quantize_kv(kf)
            v_codes, v_s = quantize_kv(vf)
            out = flash_decode_stacked(
                q, k_codes, v_codes, k_new, v_new, jnp.int32(length),
                jnp.int32(layer), k_s, v_s, wm, block_k=128, interpret=True,
            )
            k_pre = dequantize_kv(k_codes[layer], k_s[layer], jnp.float32)
            v_pre = dequantize_kv(v_codes[layer], v_s[layer], jnp.float32)
        else:
            k_all = kf.at[:, :, length:].set(1e3)  # stale tail must not leak
            v_all = vf.at[:, :, length:].set(-1e3)
            out = flash_decode_stacked(
                q, k_all, v_all, k_new, v_new, jnp.int32(length),
                jnp.int32(layer), window_mask=wm, block_k=128, interpret=True,
            )
            k_pre, v_pre = k_all[layer], v_all[layer]

        # dense reference: prefix visible to all rows + masked window
        rep = H // Hkv
        qg = q.reshape(B, T, Hkv, rep, D)
        s_pre = jnp.einsum("btgrd,bsgd->bgrts", qg, k_pre) * (D**-0.5)
        s_pre = jnp.where(
            (jnp.arange(S) < length)[None, None, None, None, :], s_pre, NEG_INF
        )
        s_win = jnp.einsum("btgrd,bwgd->bgrtw", qg, k_new) * (D**-0.5)
        s_win = jnp.where(wm[None, None, None, :, :], s_win, NEG_INF)
        probs = jax.nn.softmax(
            jnp.concatenate([s_pre, s_win], axis=-1), axis=-1
        )
        ctx = jnp.einsum(
            "bgrts,bsgd->btgrd", probs[..., :S], v_pre
        ) + jnp.einsum("bgrtw,bwgd->btgrd", probs[..., S:], v_new)
        ref = ctx.reshape(B, T, H, D)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref),
            rtol=2e-3 if quant else 2e-4, atol=2e-3 if quant else 2e-4,
        )


class TestStackedFlashPerRow:
    """per-row prefix lengths (continuous batching): each row attends its
    OWN valid prefix + the causal fresh window."""

    @pytest.mark.parametrize("quant", [False, True])
    def test_matches_per_row_dense(self, quant):
        from duodecoding_tpu.ops.pallas.flash_decode import (
            flash_decode_stacked,
        )

        L, B, T, H, Hkv, D, S, layer = 2, 4, 3, 4, 2, 64, 256, 1
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
        kf = jnp.asarray(rng.normal(size=(L, B, S, Hkv, D)), jnp.float32)
        vf = jnp.asarray(rng.normal(size=(L, B, S, Hkv, D)), jnp.float32)
        k_new = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32)
        lengths = jnp.asarray([0, 17, 128, 253], jnp.int32)

        if quant:
            from duodecoding_tpu.models.kv_quant import (
                dequantize_kv, quantize_kv,
            )

            k_codes, k_s = quantize_kv(kf)
            v_codes, v_s = quantize_kv(vf)
            out = flash_decode_stacked(
                q, k_codes, v_codes, k_new, v_new, lengths,
                jnp.int32(layer), k_s, v_s, block_k=128, interpret=True,
            )
            k_layer = dequantize_kv(k_codes[layer], k_s[layer], jnp.float32)
            v_layer = dequantize_kv(v_codes[layer], v_s[layer], jnp.float32)
            tol = 2e-3
        else:
            out = flash_decode_stacked(
                q, kf, vf, k_new, v_new, lengths, jnp.int32(layer),
                block_k=128, interpret=True,
            )
            k_layer, v_layer = kf[layer], vf[layer]
            tol = 2e-4

        # per-row dense reference
        for b in range(B):
            ln = int(lengths[b])
            kc = k_layer[b].at[ln : ln + T].set(k_new[b])
            vc = v_layer[b].at[ln : ln + T].set(v_new[b])
            ref = flash_decode_reference(
                q[b : b + 1], kc[None], vc[None], jnp.int32(ln)
            )
            np.testing.assert_allclose(
                np.asarray(out[b : b + 1]), np.asarray(ref),
                rtol=tol, atol=tol,
            )
