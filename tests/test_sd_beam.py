"""Dynamic-tree beam SD (`sd_beam`): losslessness + device selection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.beam_tree import BeamOut, greedy_walk, select_topn
from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
from duodecoding_tpu.models import init_random_params, resolve_config

PROMPT = np.array([[5, 9, 2, 14, 27, 3, 11, 6, 1, 19]], dtype=np.int32)


def make_engine(int8_kv=False, **kw):
    d_cfg = resolve_config("test-tiny")
    t_cfg = resolve_config("test-tiny-deep")
    d = Tier(d_cfg, init_random_params(d_cfg, jax.random.PRNGKey(3), jnp.float32))
    t = Tier(t_cfg, init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32))
    cfg = EngineConfig(
        max_tokens=16,
        gamma=3,
        max_seq_len=160,
        param_dtype=jnp.float32,
        cache_dtype=jnp.float32,
        int8_kv_target=int8_kv,
        **kw,
    )
    return Engine(target=t, draft=d, config=cfg)


def random_beam(key, K=4, D=3, V=50):
    """A synthetic BeamOut with consistent kept_choice lineage."""
    ks = jax.random.split(key, 6)
    root_scores = jnp.sort(
        jax.nn.log_softmax(jax.random.normal(ks[0], (V,)))
    )[::-1][:K]
    root_tokens = jax.random.permutation(ks[1], V)[:K]
    cand_t = jax.random.randint(ks[2], (D, K, K), 0, V)
    # per-candidate logprob increments <= 0, cumulative along kept lineage
    inc = -jax.random.uniform(ks[3], (D, K, K), minval=0.01, maxval=3.0)
    scores = []
    prev = root_scores
    kept = []
    for lvl in range(D):
        cu = prev[:, None] + inc[lvl]
        flat = jnp.argsort(cu.reshape(-1))[::-1][:K]
        kept.append(flat)
        prev = cu.reshape(-1)[flat]
        scores.append(cu)
    return BeamOut(
        root_tokens=root_tokens.astype(jnp.int32),
        root_scores=root_scores,
        cand_tokens=cand_t.astype(jnp.int32),
        cand_scores=jnp.stack(scores),
        kept_choice=jnp.stack(kept).astype(jnp.int32),
        root_logits=jnp.zeros((V,), jnp.float32),
    )


def paths_of(tokens, parents):
    """Canonical set of root-to-node token paths of a prefix tree."""
    out = set()
    for i in range(len(tokens)):
        path = []
        j = i
        while j >= 0:
            path.append(int(tokens[j]))
            j = int(parents[j])
        out.add(tuple(reversed(path)))
    return out


@pytest.mark.parametrize("n_nodes", [4, 8, 12])
def test_select_topn_matches_host_reference(n_nodes):
    """Device selection == host select_tree_dynamic (same top-N tree)."""
    from duodecoding_tpu.adaptive.eagle import EagleDraftOut, select_tree_dynamic

    beam = random_beam(jax.random.PRNGKey(0))
    tree = jax.device_get(select_topn(beam, n_nodes))
    assert (tree.tokens >= 0).all(), "parent closure must hold"
    # parents strictly earlier (score order) — the relocation invariant
    assert (tree.parent_pos < np.arange(n_nodes)).all()
    # depth-i node's window row >= i + 1
    assert ((np.arange(n_nodes) + 1) >= (tree.depths + 1)).all()

    host = EagleDraftOut(
        root_tokens=beam.root_tokens,
        root_scores=beam.root_scores,
        cand_tokens=beam.cand_tokens,
        cand_scores=beam.cand_scores,
        kept_parent=beam.kept_choice // beam.root_tokens.shape[0],
        kept_choice=beam.kept_choice,
        cache=None,
        new_length=None,
    )
    h_tokens, h_parents = select_tree_dynamic(host, n_nodes)
    assert paths_of(tree.tokens, tree.parent_pos) == paths_of(
        h_tokens, h_parents
    )


def test_select_topn_ancestor_mask():
    beam = random_beam(jax.random.PRNGKey(1))
    tree = jax.device_get(select_topn(beam, 8))
    for i in range(8):
        expect = np.zeros(8, bool)
        j = i
        while j >= 0:
            expect[j] = True
            j = int(tree.parent_pos[j])
        np.testing.assert_array_equal(tree.anc[i], expect)


def test_greedy_walk_follows_argmax_chain():
    from duodecoding_tpu.engine.beam_tree import SelectedTree

    # tree: two roots (t=7, t=3); node2 child of node0 (t=5); node3 child
    # of node2 (t=9)
    tokens = jnp.array([7, 3, 5, 9], jnp.int32)
    parent = jnp.array([-1, -1, 0, 2], jnp.int32)
    depths = jnp.array([0, 0, 1, 2], jnp.int32)
    anc = jnp.eye(4, dtype=bool).at[2, 0].set(True)
    anc = anc.at[3, 0].set(True).at[3, 2].set(True)
    tree = SelectedTree(tokens, parent, depths, anc)
    # preds rows: [committed, n0, n1, n2, n3]
    preds = jnp.array([7, 5, 99, 9, 42], jnp.int32)
    m, chain = greedy_walk(tree, preds, 3)
    assert int(m) == 3
    assert chain.tolist() == [0, 2, 3]
    # target disagrees at the root -> zero accepted
    m0, _ = greedy_walk(tree, jnp.array([4, 5, 9, 9, 42], jnp.int32), 3)
    assert int(m0) == 0


@pytest.mark.parametrize("kw", [
    dict(beam_k=2, beam_depth=3, n_nodes=6),
    dict(beam_k=4, beam_depth=4, n_nodes=12),
])
def test_sd_beam_lossless_vs_large(kw):
    eng = make_engine()
    out_ar, _ = eng.run("large", PROMPT)
    out_beam, m = eng.run("sd_beam", PROMPT, **kw)
    np.testing.assert_array_equal(out_beam[0], out_ar[0])
    assert m["generated_tokens"] == 16
    assert m["target_forward_times"] == m["loop_times"]
    assert m["draft_accepted_tokens"] <= m["draft_generated_tokens"]


def test_sd_beam_int8_kv_target_lossless():
    eng = make_engine(int8_kv=True)
    out_ar, _ = eng.run("large", PROMPT)
    out_beam, _ = eng.run("sd_beam", PROMPT, beam_k=2, beam_depth=3, n_nodes=6)
    np.testing.assert_array_equal(out_beam[0], out_ar[0])


def test_sd_beam_self_draft_accepts_everything():
    """Draft == target: every chain node must be accepted (m = depth+1)."""
    t_cfg = resolve_config("test-tiny-deep")
    tp = init_random_params(t_cfg, jax.random.PRNGKey(7), jnp.float32)
    t = Tier(t_cfg, tp)
    cfg = EngineConfig(
        max_tokens=12, gamma=3, max_seq_len=160,
        param_dtype=jnp.float32, cache_dtype=jnp.float32,
    )
    eng = Engine(target=t, draft=t, config=cfg)
    out_ar, _ = eng.run("large", PROMPT)
    out_beam, m = eng.run("sd_beam", PROMPT, beam_k=2, beam_depth=3, n_nodes=6)
    np.testing.assert_array_equal(out_beam[0], out_ar[0])
    # perfect draft: the top-1 root always outscores every other entry, so
    # it is always selected and always accepted -> >= 2 tokens/iteration.
    # (The FULL greedy chain is not guaranteed: a narrow beam may drop the
    # greedy child when another root's peaked continuation outscores it.)
    assert m["loop_times"] <= 6
    assert m["draft_accepted_tokens"] >= m["loop_times"]
