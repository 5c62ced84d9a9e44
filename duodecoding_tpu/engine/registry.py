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
