"""pld / lade lookahead-family tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.engine.modes.lookahead import _NGramPool, _suffix_lookup
from duodecoding_tpu.models import init_random_params, resolve_config


def test_suffix_lookup():
    seq = [1, 2, 3, 9, 9, 1, 2, 3]
    # suffix [1,2,3] occurred at position 0; continuation [9, 9, 1]
    assert _suffix_lookup(seq, max_ngram=4, draft_len=3) == [9, 9, 1]
    assert _suffix_lookup([1, 2, 3, 4], max_ngram=4, draft_len=3) is None


def test_ngram_pool_chains():
    pool = _NGramPool(n=3, draft_len=4)
    pool.put((1, 2), 3)
    pool.put((2, 3), 4)
    pool.put((3, 4), 5)
    assert pool.lookup_chain([9, 1, 2]) == [3, 4, 5]
    assert pool.lookup_chain([7, 8]) is None


@pytest.fixture(scope="module")
def engine():
    cfg = resolve_config("test-tiny")
    return Engine(
        target=Tier(cfg, init_random_params(cfg, jax.random.PRNGKey(7), jnp.float32)),
        config=EngineConfig(
            max_tokens=16, gamma=3, max_seq_len=256,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
        ),
    )


PROMPT = np.array([[5, 9, 2, 14, 5, 9, 2, 14, 5, 9, 2]], dtype=np.int32)


def test_pld_lossless_and_speculates(engine):
    out_ar, _ = engine.run("large", PROMPT)
    out, m = engine.run("pld", PROMPT)
    np.testing.assert_array_equal(out[0], out_ar[0, : out.shape[1]])
    assert m["generated_tokens"] == 16
    # the repetitive prompt guarantees lookup hits
    assert m["draft_generated_tokens"] > 0


def test_lade_pool_improves_or_matches(engine):
    out_ar, _ = engine.run("large", PROMPT)
    out, m = engine.run("lade", PROMPT)
    np.testing.assert_array_equal(out[0], out_ar[0, : out.shape[1]])
    assert m["generated_tokens"] == 16
    assert m["loop_times"] <= 17
