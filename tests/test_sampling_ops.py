"""Golden tests for the pure sampling math.

Expected values mirror the reference's semantics (src/utils.py:650-810);
where the reference repo is present, a cross-check runs against its torch
implementations directly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodecoding_tpu.ops import (
    max_fn,
    norm_logits,
    rebuild_topk_uniform_probs,
    sample,
    top_k_top_p_filter,
)

REF = "/root/reference"


def test_norm_logits_temp0_one_hot():
    logits = jnp.array([[1.0, 3.0, 2.0], [0.5, 0.1, -4.0]])
    probs = norm_logits(logits, temperature=0.0)
    np.testing.assert_allclose(probs, [[0, 1, 0], [1, 0, 0]])
    assert probs.dtype == jnp.float32


def test_norm_logits_softmax_matches_manual():
    logits = jnp.array([[1.0, 2.0, 3.0]])
    probs = norm_logits(logits, temperature=2.0)
    expect = np.exp(np.array([0.5, 1.0, 1.5]))
    expect = expect / expect.sum()
    np.testing.assert_allclose(np.asarray(probs[0]), expect, rtol=1e-6)


def test_top_k_filter():
    logits = jnp.array([[1.0, 5.0, 3.0, 2.0]])
    out = top_k_top_p_filter(logits, top_k=2)
    np.testing.assert_allclose(out, [[-np.inf, 5.0, 3.0, -np.inf]])


def test_top_p_filter_keeps_first_crossing():
    # probs ~ [0.64, 0.24, 0.09, 0.03]; top_p=0.6 keeps only the first token
    logits = jnp.log(jnp.array([[0.64, 0.24, 0.09, 0.03]]))
    out = top_k_top_p_filter(logits, top_p=0.6)
    assert np.isfinite(np.asarray(out[0, 0]))
    assert np.all(np.asarray(out[0, 1:]) == -np.inf)
    # top_p=0.7: cumulative crosses at second token -> keep two
    out2 = top_k_top_p_filter(logits, top_p=0.7)
    assert np.isfinite(np.asarray(out2[0, :2])).all()
    assert np.all(np.asarray(out2[0, 2:]) == -np.inf)


def test_sample_degenerate_rows_fall_back_to_argmax():
    probs = jnp.array(
        [
            [0.0, 0.0, 0.0],  # zero row -> argmax fallback (index 0)
            [np.nan, 2.0, np.nan],  # sanitized -> index 1
        ]
    )
    tok = sample(jax.random.PRNGKey(0), probs)
    assert tok.shape == (2, 1)
    assert int(tok[0, 0]) == 0
    assert int(tok[1, 0]) == 1


def test_sample_is_categorical():
    probs = jnp.array([[0.2, 0.8]])
    keys = jax.random.split(jax.random.PRNGKey(42), 500)
    draws = jax.vmap(lambda k: sample(k, probs))(keys)
    frac = float(jnp.mean(draws.astype(jnp.float32)))
    assert 0.7 < frac < 0.9


def test_rebuild_topk_uniform():
    probs = jnp.array([[0.5, 0.3, 0.15, 0.05]])
    out = rebuild_topk_uniform_probs(probs, 2)
    # top2 kept (0.5, 0.3); residual 0.2 spread over 2 zeros -> 0.1 each
    np.testing.assert_allclose(np.asarray(out[0]), [0.5, 0.3, 0.1, 0.1], atol=1e-6)
    np.testing.assert_allclose(float(out.sum()), 1.0, atol=1e-6)


def test_rebuild_topk_noop_when_k_ge_vocab():
    probs = jnp.array([[0.5, 0.5]])
    out = rebuild_topk_uniform_probs(probs, 5)
    np.testing.assert_allclose(out, probs)


def test_rebuild_topk_one_hot_row():
    probs = jax.nn.one_hot(jnp.array([2]), 5)
    out = rebuild_topk_uniform_probs(probs, 3)
    np.testing.assert_allclose(np.asarray(out[0]), [0, 0, 1, 0, 0], atol=1e-6)


def test_max_fn_residual():
    p = jnp.array([[0.6, 0.3, 0.1]])
    q = jnp.array([[0.2, 0.5, 0.3]])
    out = max_fn(p - q)
    np.testing.assert_allclose(np.asarray(out[0]), [1.0, 0.0, 0.0], atol=1e-6)


def test_max_fn_fallback_all_nonpositive():
    x = jnp.array([[-0.5, -0.1, -0.9]])
    out = max_fn(x)
    np.testing.assert_allclose(np.asarray(out[0]), [0.0, 1.0, 0.0])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")
def test_cross_check_against_reference_torch_impl():
    import sys

    sys.path.insert(0, REF)
    torch = pytest.importorskip("torch")
    try:
        from src.utils import (
            max_fn as ref_max_fn,
            norm_logits as ref_norm_logits,
            rebuild_topk_uniform_probs as ref_rebuild,
        )
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 17)).astype(np.float32)

    for temp in (0.0, 0.7, 1.3):
        ours = np.asarray(norm_logits(jnp.array(logits), temp, top_k=5))
        ref = ref_norm_logits(torch.tensor(logits), temp, 5, 0.0).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    probs = ref_norm_logits(torch.tensor(logits), 1.0, 0, 0.0).numpy()
    ours = np.asarray(rebuild_topk_uniform_probs(jnp.array(probs), 4))
    ref = ref_rebuild(torch.tensor(probs), 4).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    diff = rng.normal(size=(3, 17)).astype(np.float32)
    ours = np.asarray(max_fn(jnp.array(diff)))
    ref = ref_max_fn(torch.tensor(diff)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
