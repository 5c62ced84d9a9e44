"""Decoding-mode zoo. Importing this package registers every mode."""

from duodecoding_tpu.engine.modes import (  # noqa: F401
    ar,
    cuhlm,
    dsd,
    dssd,
    sd,
    tridecoding,
)
