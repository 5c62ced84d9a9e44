"""Decoding-mode zoo. Importing this package registers every mode."""

from duodecoding_tpu.engine.modes import ar, dsd, dssd, sd  # noqa: F401
