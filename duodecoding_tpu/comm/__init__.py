from duodecoding_tpu.comm.simulator import (
    CommSimulator,
    PreciseCommSimulator,
    convert_to_bytes_per_second,
)
from duodecoding_tpu.comm.cuhlm import CUHLMPolicy

__all__ = [
    "CommSimulator",
    "PreciseCommSimulator",
    "CUHLMPolicy",
    "convert_to_bytes_per_second",
]
