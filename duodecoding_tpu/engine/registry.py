"""Decoding-mode registry.

Equivalent of the reference's ``Register`` (reference: src/register.py:4-35)
but registering *functions over an Engine* rather than unbound methods of a
god-class: ``@register_mode("sd", aliases=["..."])`` and
``get_decoding_mode(name)``.
"""

from __future__ import annotations

from typing import Callable, Dict

_MODES: Dict[str, Callable] = {}


def register_mode(name: str, aliases: tuple[str, ...] = ()):
    def deco(fn: Callable) -> Callable:
        for key in (name, *aliases):
            if key in _MODES:
                raise ValueError(f"decoding mode {key!r} registered twice")
            _MODES[key] = fn
        return fn

    return deco


def get_decoding_mode(name: str) -> Callable:
    try:
        return _MODES[name]
    except KeyError:
        raise KeyError(
            f"Unknown decoding mode {name!r}; registered: {sorted(_MODES)}"
        ) from None


def registered_modes() -> list[str]:
    return sorted(_MODES)


# Suite runners: fused multi-prompt evaluation (one device program for a
# whole equal-length prompt set — see loops.py:ar_generate_suite). Only
# modes whose generation is a single device-resident program can offer
# one; Engine.run_suite falls back to sequential run() otherwise.
_SUITES: Dict[str, Callable] = {}


class SuiteFallback(NotImplementedError):
    """Raised by a suite runner to request the sequential-run() fallback
    for an option combination it intentionally does not fuse (e.g.
    dynamic-width tree specs). ``Engine.run_suite`` catches ONLY this —
    any other ``NotImplementedError`` escaping a runner is a real bug and
    must propagate (round-4 advisor finding: a blanket catch silently
    degraded fused runs to sequential, hiding the perf loss)."""


def register_suite(name: str, aliases: tuple[str, ...] = ()):
    def deco(fn: Callable) -> Callable:
        for key in (name, *aliases):
            if key in _SUITES:
                raise ValueError(f"suite runner {key!r} registered twice")
            _SUITES[key] = fn
        return fn

    return deco


def get_suite_runner(name: str):
    """Suite runner for ``name`` or None (caller falls back to run())."""
    return _SUITES.get(name)
