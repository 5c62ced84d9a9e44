"""Parity of the functional transformer vs HF transformers (tiny real models).

This is the reference's tiny-real-model test pattern
(reference: test/test_temperature_sampling.py:5-15) upgraded to a full
logits-parity check: a randomly-initialized tiny HF Llama / Qwen2 model is
converted with the loader and must produce the same logits in prefill,
incremental decode, and decode-after-rollback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.models import forward, init_cache, rollback
from duodecoding_tpu.models.loader import config_from_hf, params_from_hf_state_dict

torch = pytest.importorskip("torch")


def _make_hf_llama(qwen=False):
    if qwen:
        from transformers import Qwen2Config, Qwen2ForCausalLM

        cfg = Qwen2Config(
            vocab_size=99,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=128,
            rope_theta=10000.0,
            tie_word_embeddings=False,
        )
        model = Qwen2ForCausalLM(cfg)
    else:
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(
            vocab_size=99,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=128,
            rope_theta=10000.0,
        )
        model = LlamaForCausalLM(cfg)
    model.eval()
    return cfg, model


@pytest.mark.parametrize("qwen", [False, True])
def test_prefill_logits_match_hf(qwen):
    torch.manual_seed(0)
    hf_cfg, model = _make_hf_llama(qwen)
    cfg = config_from_hf(hf_cfg, "tiny")
    params = params_from_hf_state_dict(cfg, model.state_dict(), dtype=jnp.float32)

    tokens = np.array([[3, 17, 42, 7, 55, 1, 88, 23]], dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()

    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = forward(params, cfg, jnp.array(tokens), cache)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)
    assert int(cache.length) == 8


def test_incremental_decode_matches_prefill():
    torch.manual_seed(1)
    hf_cfg, model = _make_hf_llama()
    cfg = config_from_hf(hf_cfg, "tiny")
    params = params_from_hf_state_dict(cfg, model.state_dict(), dtype=jnp.float32)

    tokens = jnp.array([[3, 17, 42, 7, 55, 1]], dtype=jnp.int32)
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    full_logits, _ = forward(params, cfg, tokens, cache)

    # prefill 4 then decode 2 one at a time
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    l4, cache = forward(params, cfg, tokens[:, :4], cache)
    l5, cache = forward(params, cfg, tokens[:, 4:5], cache)
    l6, cache = forward(params, cfg, tokens[:, 5:6], cache)
    np.testing.assert_allclose(np.asarray(l5[0, 0]), np.asarray(full_logits[0, 4]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(l6[0, 0]), np.asarray(full_logits[0, 5]), atol=1e-4)
    assert int(cache.length) == 6


def test_rollback_then_redecode_consistent():
    torch.manual_seed(2)
    hf_cfg, model = _make_hf_llama()
    cfg = config_from_hf(hf_cfg, "tiny")
    params = params_from_hf_state_dict(cfg, model.state_dict(), dtype=jnp.float32)

    prefix = jnp.array([[3, 17, 42, 7]], dtype=jnp.int32)
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    _, cache = forward(params, cfg, prefix, cache)

    # speculate 3 tokens, then roll back to length 5 and decode a different one
    spec = jnp.array([[9, 9, 9]], dtype=jnp.int32)
    _, cache2 = forward(params, cfg, spec, cache)
    assert int(cache2.length) == 7
    cache3 = rollback(cache2, 4)
    assert int(cache3.length) == 4

    alt = jnp.array([[55]], dtype=jnp.int32)
    l_after_rb, _ = forward(params, cfg, alt, cache3)

    # ground truth: direct prefill of [prefix, 55]
    cache_gt = init_cache(cfg, 1, 16, dtype=jnp.float32)
    l_gt, _ = forward(
        params, cfg, jnp.concatenate([prefix, alt], axis=1), cache_gt
    )
    np.testing.assert_allclose(
        np.asarray(l_after_rb[0, 0]), np.asarray(l_gt[0, 4]), atol=1e-4
    )


def test_hidden_states_exposed():
    torch.manual_seed(3)
    hf_cfg, model = _make_hf_llama()
    cfg = config_from_hf(hf_cfg, "tiny")
    params = params_from_hf_state_dict(cfg, model.state_dict(), dtype=jnp.float32)
    cache = init_cache(cfg, 1, 8, dtype=jnp.float32)
    logits, cache, hidden = forward(
        params, cfg, jnp.array([[1, 2, 3]], dtype=jnp.int32), cache, return_hidden=True
    )
    assert hidden.shape == (1, 3, cfg.hidden_size)
