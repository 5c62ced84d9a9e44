from duodecoding_tpu.serving.scheduler import BatchedServer, Request

__all__ = ["BatchedServer", "Request"]
