"""Pure-carry probe for the serving-iteration penalty (VERDICT r3 #3).

The 13B 4-slot tree-serving iteration costs ~99 ms vs the engine loop's
~28 ms, with ~30 ms non-additive residue (CLAUDE.md round-3). Suspect:
XLA failing to alias the ~2 GB of while-loop cache carries (the engine
loop carries 0.4 GB). This probe isolates the carry cost from all model
compute by running while-loops over the EXACT serving cache pytree
shapes with three bodies:

- counter:  caches pass through untouched (pure carry/aliasing cost)
- touch:    one T-row dynamic_update_slice per buffer (the cache-write
            pattern) — models what in-place updates cost when aliased
- reloc:    a T-window gather+write per buffer (the commit relocation)

Per-iteration cost comes from the two-length difference method
(tools/profile_kernels.py rules). If `counter` is ~0 the carries alias
fine and the penalty is in the compute/layout; if it's ~30 ms the carry
copies are the root cause.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_caches(B=4, lanes=4, S=512, L=40, Ld=3, H=40, D=128):
    t_k = jnp.zeros((L, B, S, H, D), jnp.int8)
    t_v = jnp.zeros((L, B, S, H, D), jnp.int8)
    t_ks = jnp.zeros((L, B, S, H), jnp.float32)
    t_vs = jnp.zeros((L, B, S, H), jnp.float32)
    d_k = jnp.zeros((Ld, B * lanes, S, H, D), jnp.bfloat16)
    d_v = jnp.zeros((Ld, B * lanes, S, H, D), jnp.bfloat16)
    toks = jnp.zeros((B, S), jnp.int32)
    n = jnp.full((B,), 100, jnp.int32)
    gb = sum(
        a.size * a.dtype.itemsize
        for a in (t_k, t_v, t_ks, t_vs, d_k, d_v)
    ) / 1e9
    return (t_k, t_v, t_ks, t_vs, d_k, d_v, toks, n), gb


def run(body_kind: str, iters: int, caches):
    T = 8

    @jax.jit
    def prog(caches, steps):
        def body(c):
            t_k, t_v, t_ks, t_vs, d_k, d_v, toks, n, i = c
            if body_kind == "touch":
                def upd(a):
                    rows = jax.lax.dynamic_slice(
                        a, (0, 0, 0) + (0,) * (a.ndim - 3),
                        a.shape[:2] + (T,) + a.shape[3:],
                    )
                    rows = rows + (i % 3).astype(a.dtype)
                    return jax.lax.dynamic_update_slice(
                        a, rows, (0, 0, i % 64) + (0,) * (a.ndim - 3)
                    )

                t_k, t_v, d_k, d_v = upd(t_k), upd(t_v), upd(d_k), upd(d_v)
            elif body_kind == "reloc":
                def mv(a):
                    win = jax.lax.dynamic_slice(
                        a, (0, 0, i % 64) + (0,) * (a.ndim - 3),
                        a.shape[:2] + (T,) + a.shape[3:],
                    )
                    perm = (jnp.arange(T) + 1) % T
                    return jax.lax.dynamic_update_slice(
                        a, jnp.take(win, perm, axis=2),
                        (0, 0, i % 64) + (0,) * (a.ndim - 3),
                    )

                t_k, t_v, d_k, d_v = mv(t_k), mv(t_v), mv(d_k), mv(d_v)
            toks = toks.at[0, 0].set(i)
            return (t_k, t_v, t_ks, t_vs, d_k, d_v, toks, n + 1, i + 1)

        def cond(c):
            return c[-1] < steps

        out = jax.lax.while_loop(cond, body, caches + (jnp.int32(0),))
        return out[7]  # n

    outs = {}
    for steps in (8, 8 + iters):
        float(prog(caches, jnp.int32(steps))[0])  # compile+warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(prog(caches, jnp.int32(steps))[0])
            best = min(best, time.perf_counter() - t0)
        outs[steps] = best
    return (outs[8 + iters] - outs[8]) / iters


def main():
    caches, gb = make_caches()
    print(f"[carry] cache pytree {gb:.2f} GB", file=sys.stderr, flush=True)
    res = {"carry_gb": gb}
    for kind in ("counter", "touch", "reloc"):
        ms = 1e3 * run(kind, int(os.environ.get("CARRY_ITERS", "32")), caches)
        res[kind + "_ms_per_iter"] = ms
        print(f"[carry] {kind}: {ms:.2f} ms/iter", file=sys.stderr, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
