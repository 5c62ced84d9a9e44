"""Continuous-batching request scheduler.

Slots admit requests from a queue (chunked prefill off-batch, then cache
insertion), decode together in batched steps, and retire on EOS or budget —
the serving layer the reference lacks (its loops are strictly batch-1;
SURVEY appendix) and the BASELINE.json scale-out path.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from duodecoding_tpu.engine.loops import prefill
from duodecoding_tpu.engine.sampling_config import SamplingConfig
from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.kv_quant import init_quant_cache
from duodecoding_tpu.models.transformer import init_cache
from duodecoding_tpu.serving.batched import (
    batched_decode_step,
    init_batched_cache,
    insert_lane_block,
    insert_slot,
)


@dataclasses.dataclass
class Request:
    request_id: int
    prompt: np.ndarray  # [L] token ids
    max_new_tokens: int = 128
    # filled on completion:
    output: Optional[np.ndarray] = None
    n_generated: int = 0
    latency: float = 0.0
    _t_submit: float = 0.0
    _slot: int = -1
    _start: int = 0
    _deadline: int = 0


class BatchedServer:
    def __init__(
        self,
        params,
        cfg: ModelConfig,
        *,
        batch_size: int = 8,
        max_seq_len: int = 1024,
        sampling: SamplingConfig = SamplingConfig(0.0),
        eos_ids: tuple[int, ...] = (),
        dtype=jnp.bfloat16,
        seed: int = 0,
        int8_kv: bool = False,
    ):
        self.params = params
        self.cfg = cfg
        self.B = batch_size
        self.S = max_seq_len
        self.sampling = sampling
        self.eos_ids = eos_ids
        self.dtype = dtype
        self.int8_kv = int8_kv
        self.key = jax.random.PRNGKey(seed)

        self.cache = init_batched_cache(
            cfg, batch_size, max_seq_len, dtype, quantized=int8_kv
        )
        self.token_buf = jnp.zeros((batch_size, max_seq_len), jnp.int32)
        self.n_tokens = jnp.zeros((batch_size,), jnp.int32)
        self.active = np.zeros((batch_size,), bool)
        self.slot_req: List[Optional[Request]] = [None] * batch_size
        self.queue: List[Request] = []
        self.completed: List[Request] = []
        self._steps = 0
        self._decoded_tokens = 0

    def submit(self, req: Request) -> None:
        req._t_submit = time.perf_counter()
        self.queue.append(req)

    # -- internals --------------------------------------------------------
    def _admit(self) -> None:
        for slot in range(self.B):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            L = len(req.prompt)
            if L + req.max_new_tokens + 1 > self.S:
                L = self.S - req.max_new_tokens - 1
                req.prompt = req.prompt[-L:]
            # off-batch chunked prefill into a single-slot cache
            single = (
                init_quant_cache(self.cfg, 1, self.S)
                if self.int8_kv
                else init_cache(self.cfg, 1, self.S, self.dtype)
            )
            prompt = jnp.asarray(req.prompt, jnp.int32)[None, :]
            single = prefill(self.params, self.cfg, single, prompt)
            self.cache = insert_slot(self.cache, single, slot, jnp.int32(L - 1))
            self.token_buf = self.token_buf.at[slot, :L].set(prompt[0])
            self.n_tokens = self.n_tokens.at[slot].set(L)
            self.active[slot] = True
            req._slot = slot
            req._start = L
            req._deadline = L + req.max_new_tokens
            self.slot_req[slot] = req

    def _retire(self, slot: int) -> None:
        req = self.slot_req[slot]
        if req is None:
            return
        # speculative steps can overshoot the deadline by up to gamma
        # accepted tokens in one iteration; clamp so every server honors
        # the same exact-count contract as the AR path
        n = min(int(self.n_tokens[slot]), req._deadline)
        req.output = np.asarray(self.token_buf[slot, :n])
        req.n_generated = n - req._start
        req.latency = time.perf_counter() - req._t_submit
        self.completed.append(req)
        self.slot_req[slot] = None
        self.active[slot] = False

    def step(self) -> int:
        """Admit, decode one batched step, retire. Returns tokens decoded."""
        self._admit()
        if not self.active.any():
            return 0
        active = jnp.asarray(self.active)
        self.token_buf, self.n_tokens, self.cache, self.key, tok, finished = (
            batched_decode_step(
                self.params,
                self.token_buf,
                self.n_tokens,
                self.cache,
                active,
                self.key,
                cfg=self.cfg,
                sampling=self.sampling,
                eos_ids=self.eos_ids,
            )
        )
        self._steps += 1
        decoded = int(np.asarray(active).sum())
        self._decoded_tokens += decoded
        fin, n_host = jax.device_get((finished, self.n_tokens))
        for slot in range(self.B):
            req = self.slot_req[slot]
            if req is None:
                continue
            if fin[slot] or n_host[slot] >= req._deadline:
                self._retire(slot)
        return decoded

    def run_until_drained(self, max_steps: int = 100000) -> Dict:
        t0 = time.perf_counter()
        steps = 0
        while (self.queue or any(r is not None for r in self.slot_req)) and (
            steps < max_steps
        ):
            self.step()
            steps += 1
        wall = time.perf_counter() - t0
        total_gen = sum(r.n_generated for r in self.completed)
        return {
            "completed": len(self.completed),
            "steps": steps,
            "generated_tokens": total_gen,
            "wall_time": wall,
            "tokens_per_second": total_gen / wall if wall > 0 else 0.0,
            "mean_batch_occupancy": self._decoded_tokens / max(self._steps, 1),
        }


class SpecBatchedServer(BatchedServer):
    """Continuous batching with speculative decoding: every active slot
    drafts gamma tokens and verifies them together in one batched target
    forward (serving/batched.py:spec_batched_step). Draft and verify
    streams pipeline across the whole batch — the BASELINE.json scale-out
    serving design."""

    def __init__(self, draft_params, draft_cfg, target_params, target_cfg,
                 *, gamma: int = 4, **kw):
        super().__init__(target_params, target_cfg, **kw)
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.gamma = gamma
        self.d_cache = init_batched_cache(
            draft_cfg, self.B, self.S, self.dtype
        )
        self.total_drafted = 0
        self.total_accepted = 0

    def _admit(self) -> None:
        for slot in range(self.B):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            L = len(req.prompt)
            budget = self.S - req.max_new_tokens - self.gamma - 2
            if L > budget:
                req.prompt = req.prompt[-budget:]
                L = budget
            prompt = jnp.asarray(req.prompt, jnp.int32)[None, :]
            t_single = (
                init_quant_cache(self.cfg, 1, self.S)
                if self.int8_kv
                else init_cache(self.cfg, 1, self.S, self.dtype)
            )
            t_single = prefill(self.params, self.cfg, t_single, prompt)
            d_single = init_cache(self.draft_cfg, 1, self.S, self.dtype)
            d_single = prefill(self.draft_params, self.draft_cfg, d_single, prompt)
            self.cache = insert_slot(self.cache, t_single, slot, jnp.int32(L - 1))
            self.d_cache = insert_slot(self.d_cache, d_single, slot, jnp.int32(L - 1))
            self.token_buf = self.token_buf.at[slot, :L].set(prompt[0])
            self.n_tokens = self.n_tokens.at[slot].set(L)
            self.active[slot] = True
            req._slot, req._start, req._deadline = slot, L, L + req.max_new_tokens
            self.slot_req[slot] = req

    def step(self) -> int:
        from duodecoding_tpu.serving.batched import spec_batched_step

        self._admit()
        if not self.active.any():
            return 0
        active = jnp.asarray(self.active)
        (
            self.token_buf,
            self.n_tokens,
            self.d_cache,
            self.cache,
            self.key,
            emitted,
            accepted,
            finished,
        ) = spec_batched_step(
            self.draft_params,
            self.params,
            self.token_buf,
            self.n_tokens,
            self.d_cache,
            self.cache,
            active,
            self.key,
            draft_cfg=self.draft_cfg,
            target_cfg=self.cfg,
            gamma=self.gamma,
            sampling=self.sampling,
            eos_ids=self.eos_ids,
        )
        self._steps += 1
        em, ac, fin, n_host, act = jax.device_get(
            (emitted, accepted, finished, self.n_tokens, active)
        )
        self._decoded_tokens += int(em.sum())
        self.total_drafted += int(act.sum()) * self.gamma
        self.total_accepted += int(ac.sum())
        for slot in range(self.B):
            req = self.slot_req[slot]
            if req is None:
                continue
            if fin[slot] or n_host[slot] >= req._deadline:
                self._retire(slot)
        return int(em.sum())


class MultiStepBatchedServer(BatchedServer):
    """BatchedServer that fuses up to ``steps_per_dispatch`` decode steps
    per device dispatch (serving/batched.py:batched_decode_multi_step) —
    the device loop exits early when any slot hits EOS or its deadline, so
    scheduling decisions stay step-accurate while host round-trips
    amortize."""

    def __init__(self, *args, steps_per_dispatch: int = 8, **kw):
        super().__init__(*args, **kw)
        self.steps_per_dispatch = steps_per_dispatch

    def step(self) -> int:
        from duodecoding_tpu.serving.batched import batched_decode_multi_step

        self._admit()
        if not self.active.any():
            return 0
        active = jnp.asarray(self.active)
        deadlines = np.zeros((self.B,), np.int32)
        for slot in range(self.B):
            req = self.slot_req[slot]
            deadlines[slot] = req._deadline if req is not None else 0
        before = np.asarray(self.n_tokens)
        (
            self.token_buf,
            self.n_tokens,
            self.cache,
            self.key,
            finished,
            steps,
        ) = batched_decode_multi_step(
            self.params,
            self.token_buf,
            self.n_tokens,
            self.cache,
            active,
            jnp.asarray(deadlines),
            self.key,
            cfg=self.cfg,
            sampling=self.sampling,
            eos_ids=self.eos_ids,
            max_steps=self.steps_per_dispatch,
        )
        n_host, fin = jax.device_get((self.n_tokens, finished))
        decoded = int((n_host - before).sum())
        self._steps += int(steps)
        self._decoded_tokens += decoded
        for slot in range(self.B):
            req = self.slot_req[slot]
            if req is None:
                continue
            if fin[slot] or n_host[slot] >= req._deadline:
                self._retire(slot)
        return decoded


class SpecTreeBatchedServer(BatchedServer):
    """Continuous batching with TREE speculative decoding: every active
    slot fork-drafts a branch-spec token tree on its own lane rows and all
    slots verify together in one batched tree-attention forward
    (serving/batched.py:spec_tree_batched_step). Greedy (temperature 0),
    like the engine mode's losslessness contract. The multi-slot serving
    form of the reference's k-sequence drafting (src/model_cpu.py:138-252,
    strictly batch-1 there)."""

    def __init__(self, draft_params, draft_cfg, target_params, target_cfg,
                 *, tree_spec=(2, 1, 1, 1), draft_dtype=None,
                 draft_int8_kv: bool = False, steps_per_dispatch: int = 1,
                 **kw):
        super().__init__(target_params, target_cfg, **kw)
        from duodecoding_tpu.engine.modes.sd_tree import parse_spec

        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.spec = parse_spec(tree_spec)
        self.lanes = int(np.prod(self.spec))
        self.draft_dtype = draft_dtype or self.dtype
        self.draft_int8_kv = draft_int8_kv
        self.steps_per_dispatch = steps_per_dispatch
        self.d_cache = init_batched_cache(
            draft_cfg, self.B * self.lanes, self.S, self.draft_dtype,
            quantized=draft_int8_kv,
        )
        self.total_drafted = 0
        self.total_accepted = 0

    def _admit(self) -> None:
        """Admit every waiting request with a free slot in ONE fused
        device dispatch (serving/batched.py:admit_prefill_tree): prefill
        straight into the batched caches with an admit mask — no
        single-slot caches, no insert copies, no per-request host .at[]
        updates. Prompt lengths are bucketed to multiples of 64 so the
        admission program compiles once per bucket."""
        gamma = len(self.spec)
        to_admit = []
        for slot in range(self.B):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            L = len(req.prompt)
            n_rows = self.lanes * gamma + 2  # verify rows upper bound
            budget = self.S - req.max_new_tokens - n_rows
            if L > budget:
                req.prompt = req.prompt[-budget:]
                L = budget
            if L < gamma + 2:
                raise ValueError(
                    f"tree serving needs prompt_len >= gamma + 2, got {L}"
                )
            to_admit.append((slot, req, L))
        if not to_admit:
            return

        Lp = min(
            self.S,
            ((max(L for _, _, L in to_admit) + 63) // 64) * 64,
        )
        prompts = np.zeros((self.B, Lp), np.int32)
        plens = np.zeros((self.B,), np.int32)
        admit = np.zeros((self.B,), bool)
        for slot, req, L in to_admit:
            prompts[slot, :L] = np.asarray(req.prompt[:L])
            plens[slot] = L
            admit[slot] = True
        # host-side slot bookkeeping is applied only AFTER the fused device
        # call returns: if it raises (e.g. transient remote-backend
        # failure), the wave is re-queued intact instead of leaving slots
        # marked active with no prefilled cache (round-4 advisor finding)
        try:
            (
                self.token_buf, self.n_tokens, self.d_cache, self.cache,
            ) = self._admit_device(prompts, plens, admit)
        except Exception:
            for _, req, _ in reversed(to_admit):
                self.queue.insert(0, req)
            raise
        for slot, req, L in to_admit:
            self.active[slot] = True
            req._slot, req._start = slot, L
            req._deadline = L + req.max_new_tokens
            self.slot_req[slot] = req

    def _admit_device(self, prompts, plens, admit):
        from duodecoding_tpu.serving.batched import admit_prefill_tree

        return admit_prefill_tree(
            self.draft_params,
            self.params,
            self.token_buf,
            self.n_tokens,
            self.d_cache,
            self.cache,
            jnp.asarray(prompts),
            jnp.asarray(plens),
            jnp.asarray(admit),
            draft_cfg=self.draft_cfg,
            target_cfg=self.cfg,
            lanes=self.lanes,
        )

    def step(self) -> int:
        from duodecoding_tpu.serving.batched import (
            spec_tree_batched_multi_step,
            spec_tree_batched_step,
        )

        self._admit()
        if not self.active.any():
            return 0
        active = jnp.asarray(self.active)
        if self.steps_per_dispatch > 1:
            # fused device loop: on remote backends each dispatch costs
            # ~85-100 ms of execute/completion overhead, so fusing turns
            # dispatch-bound serving into compute-bound serving
            deadlines = np.zeros((self.B,), np.int32)
            for slot in range(self.B):
                req = self.slot_req[slot]
                deadlines[slot] = req._deadline if req is not None else 0
            (
                self.token_buf,
                self.n_tokens,
                self.d_cache,
                self.cache,
                emitted,
                accepted,
                drafted,
                finished,
                steps,
            ) = spec_tree_batched_multi_step(
                self.draft_params,
                self.params,
                self.token_buf,
                self.n_tokens,
                self.d_cache,
                self.cache,
                active,
                jnp.asarray(deadlines),
                draft_cfg=self.draft_cfg,
                target_cfg=self.cfg,
                spec=self.spec,
                eos_ids=self.eos_ids,
                max_steps=self.steps_per_dispatch,
            )
            self._steps += int(steps)
        else:
            (
                self.token_buf,
                self.n_tokens,
                self.d_cache,
                self.cache,
                emitted,
                accepted,
                drafted,
                finished,
            ) = spec_tree_batched_step(
                self.draft_params,
                self.params,
                self.token_buf,
                self.n_tokens,
                self.d_cache,
                self.cache,
                active,
                draft_cfg=self.draft_cfg,
                target_cfg=self.cfg,
                spec=self.spec,
                eos_ids=self.eos_ids,
            )
            self._steps += 1
        # one batched transfer — separate np.asarray() fetches cost a
        # ~27 ms host round-trip EACH on the remote backend
        em, dr, ac, fin, n_host = jax.device_get(
            (emitted, drafted, accepted, finished, self.n_tokens)
        )
        self._decoded_tokens += int(em.sum())
        self.total_drafted += int(dr.sum())
        self.total_accepted += int(ac.sum())
        for slot in range(self.B):
            req = self.slot_req[slot]
            if req is None:
                continue
            if fin[slot] or n_host[slot] >= req._deadline:
                self._retire(slot)
        return int(em.sum())
