from duodecoding_tpu.ops.pallas.int4_matmul import int4_matmul

__all__ = ["int4_matmul"]
