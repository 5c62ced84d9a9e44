"""Per-row cache window writes (ops/pallas/cache_write.py).

CPU tests exercise the reference (vmapped slice+select+store) path; the
TPU DMA kernel was validated on-chip against the same host reference
(bf16 T=1/T=9, int8 T=22, incl. inactive rows — all bit-exact)."""

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.ops.pallas.cache_write import window_write


def test_window_write_matches_host_reference():
    rng = np.random.default_rng(0)
    L, B, S, T, H, D = 3, 4, 64, 5, 2, 8
    buf = jnp.asarray(rng.normal(size=(L, B, S, H, D)), jnp.float32)
    rows = jnp.asarray(rng.normal(size=(L, B, T, H, D)), jnp.float32)
    starts = jnp.asarray([0, 10, 59, 30], jnp.int32)
    active = jnp.asarray([True, False, True, True])
    out = np.asarray(window_write(buf, rows, starts, active))
    ref = np.asarray(buf).copy()
    for b in range(B):
        if bool(active[b]):
            s = int(starts[b])
            e = min(s + T, S)
            ref[:, b, s:e] = np.asarray(rows)[:, b, : e - s]
    np.testing.assert_array_equal(out, ref)


def test_window_write_default_active_and_3d():
    rng = np.random.default_rng(1)
    L, B, S, T, H = 2, 3, 32, 4, 6
    buf = jnp.zeros((L, B, S, H), jnp.float32)
    rows = jnp.asarray(rng.normal(size=(L, B, T, H)), jnp.float32)
    starts = jnp.asarray([1, 2, 3], jnp.int32)
    out = np.asarray(window_write(buf, rows, starts))
    for b in range(B):
        s = int(starts[b])
        np.testing.assert_array_equal(out[:, b, s : s + T], np.asarray(rows)[:, b])
        assert (out[:, b, :s] == 0).all() and (out[:, b, s + T :] == 0).all()
