"""ARP head, RL adapter, and registry tests."""

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.adaptive import (
    DDQNAgent,
    RLNetworkAdapter,
    init_arp_head,
    load_arp_head,
    make_arp_stop_fn,
    save_arp_head,
    train_arp_head,
)
from duodecoding_tpu.adaptive.arp import acc_prob, arp_apply
from duodecoding_tpu.adaptive.registries import (
    get_rl_agent_spec,
    pair_key,
    register_acc_head,
    resolve_acc_head_path,
)


def test_arp_head_shapes_and_training():
    key = jax.random.PRNGKey(0)
    params = init_arp_head(key, hidden_size=32, width=16)
    h = jax.random.normal(key, (10, 32))
    logits = arp_apply(params, h)
    assert logits.shape == (10, 2)

    # learnable: separable synthetic data
    rng = np.random.default_rng(0)
    X = rng.normal(size=(512, 32)).astype(np.float32)
    y = (X[:, 0] > 0).astype(np.int32)
    params, loss = train_arp_head(params, X, y, epochs=60, batch_size=64)
    preds = np.asarray(jnp.argmax(arp_apply(params, jnp.asarray(X)), axis=-1))
    assert (preds == y).mean() > 0.9


def test_arp_stop_fn_cumulative_threshold():
    params = init_arp_head(jax.random.PRNGKey(0), hidden_size=8, width=8)
    stop_fn = make_arp_stop_fn(params, threshold=0.999)  # never stops
    h = jnp.zeros((1, 8))
    carry = jnp.ones((1,))
    stop, carry = stop_fn(h, None, None, 0, carry)
    assert not bool(stop)
    stop_fn2 = make_arp_stop_fn(params, threshold=0.0)  # always stops
    stop, _ = stop_fn2(h, None, None, 0, jnp.ones((1,)))
    assert bool(stop)


def test_arp_save_load_roundtrip(tmp_path):
    params = init_arp_head(jax.random.PRNGKey(1), 16, width=8)
    p = str(tmp_path / "head.pkl")
    save_arp_head(params, p)
    loaded = load_arp_head(p)
    h = jax.random.normal(jax.random.PRNGKey(2), (3, 16))
    np.testing.assert_allclose(
        np.asarray(arp_apply(params, h)), np.asarray(arp_apply(loaded, h))
    )


def test_arp_stop_inside_draft_loop():
    """ARP early stop shortens actual_gamma inside the drafting while_loop."""
    from duodecoding_tpu.engine.loops import draft_tokens_loop, prefill
    from duodecoding_tpu.engine.sampling_config import SamplingConfig
    from duodecoding_tpu.models import init_cache, init_random_params, resolve_config

    cfg = resolve_config("test-tiny")
    params = init_random_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tokens = jnp.zeros((1, 64), jnp.int32).at[0, :6].set(jnp.arange(1, 7))
    cache = init_cache(cfg, 1, 64, jnp.float32)
    cache = prefill(params, cfg, cache, tokens[:, :6])

    head = init_arp_head(jax.random.PRNGKey(1), cfg.hidden_size, width=8)
    always_stop = make_arp_stop_fn(head, threshold=0.0)
    _, _, _, g, _, _, _ = draft_tokens_loop(
        params,
        cfg,
        tokens,
        jnp.int32(6),
        cache,
        jax.random.PRNGKey(2),
        gamma=5,
        sampling=SamplingConfig(0.0),
        stop_fn=always_stop,
    )
    assert int(g) == 1  # stopped after the first draft


def test_ddqn_agent_learns_and_updates(tmp_path):
    agent = DDQNAgent(feature_dim=4, action_dim=6, batch_size=8, seed=0)
    rng = np.random.default_rng(0)
    s = rng.normal(size=(8, 4)).astype(np.float32)
    for i in range(20):
        s2 = rng.normal(size=(8, 4)).astype(np.float32)
        agent.store_transition(s, i % 6, float(i), s2, False)
        s = s2
    loss = agent.update()
    assert loss is not None and np.isfinite(loss)
    assert agent.update_count == 1

    p = str(tmp_path / "agent.pkl")
    agent.save(p)
    agent2 = DDQNAgent(feature_dim=4, action_dim=6, batch_size=8, seed=1)
    assert agent2.load(p)
    assert agent2.update_count == 1
    a = agent2.select_action(s, training=False)
    assert 0 <= a < 6


def test_rl_adapter_select_and_reward_cycle(tmp_path):
    ad = RLNetworkAdapter(model_path=str(tmp_path / "latest.pkl"), seed=0)
    k, thr = ad.select_config(23.6, 10.0, [0.7], 2.5, "gsm8k")
    assert k in ad.topk_candidates
    assert thr in ad.threshold_candidates
    ad.step(5.0)
    k2, thr2 = ad.select_config(23.6, 10.0, [0.6], 2.0, "gsm8k")
    assert len(ad.agent.memory) == 1  # transition stored on second select
    ad.save(current_tps=12.0)
    assert ad.best_tps == 12.0


def test_registries(tmp_path):
    assert pair_key("TinyLlama", "llama2-13b") == "tiny-llama-1.1b--to--llama-2-13b"
    reg = str(tmp_path / "reg.json")
    register_acc_head("vicuna-68m", "tinyllama", "/x/head.pkl", registry_path=reg)
    assert (
        resolve_acc_head_path("vicuna-68m", "tinyllama", registry_path=reg)
        == "/x/head.pkl"
    )
    spec = get_rl_agent_spec(
        role="little", source="vicuna-68m", target="tinyllama", root=str(tmp_path)
    )
    assert spec.pair == "vicuna-68m--to--tiny-llama-1.1b"
    assert spec.latest_path.endswith("rl_agents/little/vicuna-68m--to--tiny-llama-1.1b/latest.pkl")


def test_collect_confidence_and_train_pair(tmp_path, monkeypatch):
    import os

    from duodecoding_tpu.adaptive.collect import collect_confidence, train_arp_for_pair
    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
    from duodecoding_tpu.models import init_random_params, resolve_config

    d_cfg = resolve_config("test-tiny")
    t_cfg = resolve_config("test-tiny-deep")
    engine = Engine(
        target=Tier(t_cfg, init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32)),
        draft=Tier(d_cfg, init_random_params(d_cfg, jax.random.PRNGKey(3), jnp.float32)),
        config=EngineConfig(
            max_tokens=16, gamma=3, max_seq_len=128,
            param_dtype=jnp.float32, cache_dtype=jnp.float32,
        ),
    )
    prompts = np.array([[5, 9, 2, 14, 27, 3, 11], [8, 1, 7, 22, 3, 9, 4]])
    hiddens, labels = collect_confidence(engine, prompts, max_new_tokens=12)
    assert hiddens.shape[1] == d_cfg.hidden_size
    assert hiddens.shape[0] == labels.shape[0] > 0
    assert set(np.unique(labels)).issubset({0, 1})

    monkeypatch.chdir(tmp_path)
    params, info = train_arp_for_pair(
        engine, prompts[:1], source="test-tiny", target="test-tiny-deep",
        width=16, epochs=3,
    )
    assert os.path.exists(info["path"])
    from duodecoding_tpu.adaptive.registries import resolve_acc_head_path

    assert resolve_acc_head_path(
        "test-tiny", "test-tiny-deep",
        registry_path="checkpoints/acc_head_registry.json",
    ) == info["path"]
