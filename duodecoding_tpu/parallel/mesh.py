"""Device-mesh construction.

The reference's parallelism is NCCL tensor-parallel hooks (reference:
src/tp.py:59-162) plus HF device_map layer sharding
(src/model_loading.py:48-59). The TPU-native equivalent is one
``jax.sharding.Mesh`` with a ``data`` axis (batch) and a ``model`` axis
(tensor parallel); GSPMD inserts the all-reduces the reference registered
as forward hooks.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    model_axis: int | None = None,
    data_axis: int | None = None,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over ``devices`` (default: all).

    With only one axis size given, the other absorbs the remaining devices.
    Defaults to pure tensor parallelism (data=1).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_axis is None and data_axis is None:
        model_axis, data_axis = n, 1
    elif model_axis is None:
        model_axis = n // data_axis
    elif data_axis is None:
        data_axis = n // model_axis
    if model_axis * data_axis != n:
        raise ValueError(
            f"mesh {data_axis}x{model_axis} does not cover {n} devices"
        )
    arr = np.array(devices).reshape(data_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host initialization (the reference's `dist.init_process_group`
    analog, src/engine.py:90-96): call once per host before building the
    global mesh; ICI carries intra-slice collectives, DCN carries
    inter-host traffic (the physical edge-cloud link of the deployment)."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
