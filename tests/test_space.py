"""SPACE semi-AR mode: mask-embedding training, propose+auto-verify loop,
losslessness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.adaptive.space import (
    apply_mask_embeddings,
    collect_space_data,
    space_mask_ids,
    train_space_masks,
)
from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.models import init_random_params, resolve_config

CFG = resolve_config("test-tiny")
K = 3


@pytest.fixture(scope="module")
def setup():
    params = init_random_params(CFG, jax.random.PRNGKey(7), jnp.float32)
    prompts = np.array(
        [[5, 9, 2, 14, 27, 3], [8, 1, 7, 22, 3, 9], [4, 4, 11, 30, 2, 6]]
    )
    rollouts, L = collect_space_data(params, CFG, prompts, max_new=32)
    mask_emb, loss = train_space_masks(
        params, CFG, rollouts, L, k=K, epochs=80, anchors=6
    )
    return params, mask_emb, rollouts, L


def test_mask_ids_at_vocab_top():
    ids = space_mask_ids(CFG, 4)
    assert ids == [CFG.vocab_size - 4 + i for i in range(4)]


def test_apply_mask_embeddings_only_touches_rows(setup):
    params, mask_emb, _, _ = setup
    pp = apply_mask_embeddings(params, mask_emb, space_mask_ids(CFG, K))
    diff = np.asarray(pp["embed"] != params["embed"]).any(axis=1)
    assert diff[-K:].all()
    assert not diff[:-K].any()


def test_masks_learn_future_tokens(setup):
    """Trained masks predict tokens on the rollout distribution better
    than chance."""
    from duodecoding_tpu.models import forward, init_cache

    params, mask_emb, rollouts, L = setup
    ids = space_mask_ids(CFG, K)
    pp = apply_mask_embeddings(params, mask_emb, ids)
    B, S = rollouts.shape
    p = L + 1  # inside the trained anchor region
    win = np.concatenate(
        [rollouts[:, :p], np.tile(np.asarray(ids, np.int32), (B, 1))], axis=1
    )
    cache = init_cache(CFG, B, win.shape[1], jnp.float32)
    logits, _ = forward(pp, CFG, jnp.asarray(win), cache)
    preds = np.asarray(jnp.argmax(logits[:, p:, :], -1))
    labels = rollouts[:, p + 1 : p + 1 + K]
    acc_first = (preds[:, 0] == labels[:, 0]).mean()
    assert acc_first > 0.2  # first mask predicts 2-ahead above 1/128 chance


def test_space_mode_lossless_and_proposes(setup):
    params, mask_emb, _, _ = setup
    engine = Engine(
        target=Tier(CFG, params),
        config=EngineConfig(
            max_tokens=16, max_seq_len=128,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
        ),
    )
    prompt = np.array([[5, 9, 2, 14, 27, 3]], dtype=np.int32)
    ar_out, _ = engine.run("large", prompt)
    out, m = engine.run("space", prompt, space_mask_emb=mask_emb, num_masks=K)
    n = min(out.shape[1], ar_out.shape[1])
    np.testing.assert_array_equal(out[0, :n], ar_out[0, :n])
    assert m["generated_tokens"] >= 16
    assert m["draft_generated_tokens"] > 0
    assert m["draft_accepted_tokens"] > 0
    # semi-AR: fewer forwards than tokens when masks predict well
    assert m["target_forward_times"] < m["generated_tokens"]


def test_space_requires_masks():
    params = init_random_params(CFG, jax.random.PRNGKey(1), jnp.float32)
    engine = Engine(
        target=Tier(CFG, params),
        config=EngineConfig(max_tokens=8, max_seq_len=128,
                            param_dtype=jnp.float32, cache_dtype=jnp.float32),
    )
    with pytest.raises(ValueError):
        engine.run("space", np.array([[1, 2, 3]], dtype=np.int32))
