"""duodecoding_tpu — TPU-native heterogeneous speculative decoding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
edge-end-cloud collaborative speculative-decoding framework (DuoDecoding):
multi-tier draft/verify decoding with batched rejection sampling, KV-cache
rollback-by-bookkeeping, top-k logit compression, a deterministic
communication cost model, acceptance-prediction heads and RL adapters —
built on functional state pytrees, `lax.scan` decode loops, and
`jax.sharding` meshes instead of mutable CUDA buffers and `.to()` hops.
"""

__version__ = "0.1.0"
