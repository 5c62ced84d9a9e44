"""Decoding-mode zoo. Importing this package registers every mode."""

from duodecoding_tpu.engine.modes import (  # noqa: F401
    adaptive,
    ar,
    cee,
    cee_cuhlm,
    cee_dist,
    cuhlm,
    dsd,
    dssd,
    eagle,
    eagle_fused,
    lookahead,
    medusa,
    rest,
    sd,
    sd_beam,
    sd_tree,
    space,
    tridecoding,
)
