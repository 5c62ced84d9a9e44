"""Golden tests for the pure verification math (rejection sampling core)."""

import jax
import jax.numpy as jnp
import numpy as np

from duodecoding_tpu.ops import build_rollback_plan, compute_acceptance
from duodecoding_tpu.ops.verify import verify_and_sample


def _windows(q_rows, p_rows):
    return jnp.array(q_rows)[None], jnp.array(p_rows)[None]


def test_acceptance_all_accept():
    # q puts 0.5 on drafted tokens, p puts 0.9 -> ratio > 1, accept regardless of r
    V = 4
    q = np.full((3, V), 0.5 / 3)
    p = np.full((3, V), 0.1 / 3)
    toks = [1, 2, 3]
    for i, t in enumerate(toks):
        q[i, t] = 0.5
        p[i, t] = 0.9
    dw, tw = _windows(q, p)
    r = jnp.full((1, 3), 0.99)
    acc = compute_acceptance(dw, tw, jnp.array([toks]), r, prefix_len=jnp.int32(10))
    assert int(acc.accepted_count[0]) == 3
    assert int(acc.n[0]) == 12


def test_acceptance_first_reject_stops_prefix():
    V = 4
    q = np.full((3, V), 0.25)
    p = np.full((3, V), 0.25)
    toks = [0, 1, 2]
    p[1, 1] = 0.01  # ratio 0.04 at step 2
    dw, tw = _windows(q, p)
    r = jnp.array([[0.5, 0.5, 0.0]])  # step2 rejects; step3 would accept but is cut
    acc = compute_acceptance(dw, tw, jnp.array([toks]), r, prefix_len=jnp.int32(7))
    assert int(acc.accepted_count[0]) == 1
    assert int(acc.n[0]) == 7


def test_acceptance_actual_gamma_mask():
    V = 4
    q = np.full((3, V), 0.25)
    p = np.full((3, V), 0.25)
    dw, tw = _windows(q, p)
    r = jnp.zeros((1, 3))  # would accept everything
    acc = compute_acceptance(
        dw, tw, jnp.array([[0, 1, 2]]), r, prefix_len=jnp.int32(5), actual_gamma=2
    )
    assert int(acc.accepted_count[0]) == 2


def test_rollback_plan_accept_vs_reject():
    # all accepted: n = prefix+gamma-1 -> target keeps n+2
    plan = build_rollback_plan(jnp.int32(10), 4, jnp.int32(13))
    assert bool(plan.all_accepted)
    assert int(plan.draft_end_pos) == 14
    assert int(plan.target_end_pos) == 15
    # reject at first: n = prefix-1
    plan = build_rollback_plan(jnp.int32(10), 4, jnp.int32(9))
    assert not bool(plan.all_accepted)
    assert int(plan.draft_end_pos) == 10
    assert int(plan.target_end_pos) == 10


def test_verify_and_sample_all_accept_uses_bonus_row():
    V, G = 4, 2
    q = np.full((G, V), 0.1)
    p = np.full((G + 1, V), 0.1)
    toks = [2, 3]
    for i, t in enumerate(toks):
        q[i, t] = 0.5
        p[i, t] = 0.9
    p[G] = [0, 0, 0, 1.0]  # bonus row: token 3 certain
    dw = jnp.array(q)[None]
    tw = jnp.array(p)[None]
    out = verify_and_sample(
        jax.random.PRNGKey(0),
        dw,
        tw,
        jnp.array([toks]),
        jnp.full((1, G), 0.95),
        prefix_len=jnp.int32(6),
    )
    assert bool(out.all_accepted[0])
    assert int(out.accepted_count[0]) == G
    assert int(out.next_token[0, 0]) == 3
    assert int(out.rollback.draft_end_pos[0]) == 8
    assert int(out.rollback.target_end_pos[0]) == 9


def test_verify_and_sample_reject_samples_residual():
    V, G = 4, 2
    q = np.full((G, V), 0.25)
    p = np.full((G + 1, V), 0.25)
    # reject at position 0: p(token)=0, residual = max(p-q,0) concentrated on 3
    q[0] = [0.7, 0.1, 0.1, 0.1]
    p[0] = [0.0, 0.1, 0.1, 0.8]
    toks = [0, 1]
    dw = jnp.array(q)[None]
    tw = jnp.array(p)[None]
    out = verify_and_sample(
        jax.random.PRNGKey(1),
        dw,
        tw,
        jnp.array([toks]),
        jnp.full((1, G), 0.5),
        prefix_len=jnp.int32(6),
    )
    assert not bool(out.all_accepted[0])
    assert int(out.accepted_count[0]) == 0
    assert int(out.n[0]) == 5
    # residual dist = max(p-q,0)/Z = [0, 0, 0, 0.7]/0.7 -> token 3
    assert int(out.next_token[0, 0]) == 3
    assert int(out.rollback.draft_end_pos[0]) == 6
    assert int(out.rollback.target_end_pos[0]) == 6


def test_verify_is_jittable():
    V, G = 8, 3
    f = jax.jit(verify_and_sample)
    out = f(
        jax.random.PRNGKey(0),
        jnp.full((1, G, V), 1.0 / V),
        jnp.full((1, G + 1, V), 1.0 / V),
        jnp.zeros((1, G), jnp.int32),
        jnp.full((1, G), 0.5),
        jnp.int32(4),
    )
    assert out.next_token.shape == (1, 1)
