"""Env-gated numeric sanitizers.

Port of the reference's opt-in validity checks (reference:
src/utils.py:24-153 — DUODEC_DEBUG_NUMERICS gates prob-tensor and
acceptance-ratio validation with rate-limited warnings; the alignment
forensics of src/debug_logs.py). Host-side checks run on pulled arrays;
``install_jit_checks`` wires jax.debug.callback-based validation into
traced code when the env flag is set at trace time.
"""

from __future__ import annotations

import os
import time
import warnings

import numpy as np

_WARN_TIMES: dict[str, list[float]] = {}


def numeric_debug_checks_enabled() -> bool:
    return os.environ.get("DUODEC_DEBUG_NUMERICS", "") not in ("", "0", "false")


def _limited_warn(key: str, msg: str, max_per_minute: int = 5) -> None:
    now = time.time()
    times = _WARN_TIMES.setdefault(key, [])
    times[:] = [t for t in times if now - t < 60]
    if len(times) < max_per_minute:
        times.append(now)
        warnings.warn(msg, stacklevel=3)


def log_prob_tensor_if_invalid(probs, name: str, atol: float = 1e-3) -> bool:
    """True (and warns) when a probability tensor has NaN/Inf/negative
    entries or row sums far from 1 (reference src/utils.py:38-107)."""
    if not numeric_debug_checks_enabled():
        return False
    p = np.asarray(probs, dtype=np.float64)
    bad = False
    if not np.isfinite(p).all():
        _limited_warn(name, f"{name}: non-finite probability entries")
        bad = True
    if (p < 0).any():
        _limited_warn(name, f"{name}: negative probability entries")
        bad = True
    sums = p.sum(axis=-1)
    if not np.allclose(sums, 1.0, atol=atol):
        _limited_warn(
            name, f"{name}: row sums deviate from 1 (min={sums.min():.4f}, "
            f"max={sums.max():.4f})"
        )
        bad = True
    return bad


def log_ratio_if_invalid(p, q, name: str) -> bool:
    """True (and warns) on invalid acceptance ratios p/q
    (reference src/utils.py:110-153)."""
    if not numeric_debug_checks_enabled():
        return False
    pv = np.asarray(p, np.float64)
    qv = np.asarray(q, np.float64)
    ratio = pv / np.where(qv == 0, np.nan, qv)
    if not np.isfinite(ratio).all():
        _limited_warn(name, f"{name}: non-finite acceptance ratio (q==0 or NaN)")
        return True
    return False


def token_checks_enabled() -> bool:
    return os.environ.get("DUODEC_DEBUG_TOKEN_CHECKS", "") not in ("", "0", "false")


def filter_invalid_tokens(ids, vocab_size: int, name: str = "output"):
    """Drop out-of-range token ids (reference
    eval/eval_mt_bench_noeval.py:349-368)."""
    ids = np.asarray(ids)
    mask = (ids >= 0) & (ids < vocab_size)
    if token_checks_enabled() and not mask.all():
        _limited_warn(name, f"{name}: {int((~mask).sum())} out-of-range tokens dropped")
    return ids[mask]


# ---------------------------------------------------------------------------
# SD cache-alignment forensics (reference src/debug_logs.py)
# ---------------------------------------------------------------------------


def sd_alignment_debug_enabled() -> bool:
    """Env gate, same flag name as the reference
    (src/debug_logs.py:10 ``DUODEC_DEBUG_SD_ALIGNMENT``)."""
    return os.environ.get("DUODEC_DEBUG_SD_ALIGNMENT", "0") == "1"


def sd_align_inline_enabled() -> bool:
    """Inline per-iteration snapshots from INSIDE device loops
    (``jax.debug.callback``). Opt-in separately from the replay gate: the
    callback forces a host sync per iteration, which is free on CPU test
    runs but would serialize a remote TPU backend — the replay variant
    (:func:`log_sd_alignment_replay`) stays canonical on-chip."""
    return (
        os.environ.get("DUODEC_DEBUG_SD_ALIGNMENT_INLINE", "0") == "1"
    )


def emit_sd_align_inline(
    mode: str,
    stage: str,
    *,
    prefix_len,
    gamma,
    accepted,
    target_len,
    draft_len,
    max_len: int,
):
    """Call from TRACED loop bodies. When the inline gate is on at trace
    time, inserts a ``jax.debug.callback`` that logs the same [SD-ALIGN]
    snapshot stream the reference emits inline at every stage
    (reference src/debug_logs.py:25 ``_log_sd_alignment_snapshot`` —
    stage, prefix_len, gamma, per-cache current/max). No-op (zero traced
    ops) when the gate is off."""
    if not sd_align_inline_enabled():
        return
    import logging

    import jax

    log = logging.getLogger("duodecoding_tpu.sd_align").warning

    def _cb(prefix_len, gamma, accepted, target_len, draft_len):
        log(
            f"[SD-ALIGN] mode={mode} stage={stage} "
            f"prefix_len={int(prefix_len)} gamma={int(gamma)} "
            f"accepted={int(accepted)} "
            f"target(current={int(target_len)}, max={max_len}) "
            f"draft(current={int(draft_len)}, max={max_len})"
        )

    jax.debug.callback(
        _cb, prefix_len, gamma, accepted, target_len, draft_len
    )


def log_sd_alignment_replay(
    mode: str,
    prompt_len: int,
    n_final: int,
    actual_gamma,
    accepted,
    emitted,
    iters: int,
    *,
    gamma: int,
    max_len: int,
    logger=None,
) -> list[str]:
    """Replay the per-iteration cache-length trajectory from the device
    records and emit [SD-ALIGN] snapshots + invariant checks.

    The reference logs cache-state snapshots inline at every stage
    (src/debug_logs.py:25 ``_log_sd_alignment_snapshot`` — prefix_len,
    x_len, gamma, per-cache current/tracked/max). Our loops are
    device-resident ``lax.while_loop`` programs, so inline host logging
    would break the design; instead the SAME snapshot stream is
    reconstructed post-run from the per-iteration SDRecords, checking the
    architecture's cache-lag invariants as it goes (target lags the token
    buffer by 1 at iteration boundaries; emitted <= gamma + 1;
    accepted <= drafted). Returns the lines (and logs them when the env
    gate is on)."""
    import logging

    lines: list[str] = []
    if not sd_alignment_debug_enabled():
        return lines
    log = (logger or logging.getLogger("duodecoding_tpu.sd_align")).warning
    n = int(prompt_len)
    for i in range(int(iters)):
        g = int(actual_gamma[i])
        a = int(accepted[i])
        e = int(emitted[i]) if emitted is not None else a + 1
        n += e
        note = ""
        if a > g:
            note = "INVARIANT-VIOLATION accepted>drafted"
        elif e > gamma + 1:
            note = "INVARIANT-VIOLATION emitted>gamma+1"
        elif n - 1 > max_len:
            note = "INVARIANT-VIOLATION target cache beyond max_len"
        line = (
            f"[SD-ALIGN] mode={mode} iter={i} stage=post_commit "
            f"prefix_len={n} gamma={g} accepted={a} emitted={e} "
            f"target(current={n - 1}, max={max_len}) draft(lag<=2)"
        )
        if note:
            line += f", note={note}"
        lines.append(line)
        log(line)
    if n != int(n_final):
        line = (
            f"[SD-ALIGN] mode={mode} stage=final MISMATCH: replayed "
            f"n={n} != reported n={int(n_final)} (records/commit drift)"
        )
        lines.append(line)
        log(line)
    return lines
