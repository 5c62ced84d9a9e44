"""Decoding-mode zoo. Importing this package registers every mode."""

from duodecoding_tpu.engine.modes import (  # noqa: F401
    ar,
    dsd,
    dssd,
    sd,
    tridecoding,
)
