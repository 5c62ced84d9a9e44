"""Idle-wait training launcher.

Port of the reference's scheduled_train.py (wait for GPUs to be idle for
five minutes, then launch training): the TPU analog waits until device HBM
stays below a threshold for ``idle_minutes``, then starts the auto-train
manager.
"""

from __future__ import annotations

import time

from duodecoding_tpu.utils.profiler import detect_available_devices


def wait_for_idle(
    idle_minutes: float = 5.0,
    poll_seconds: float = 30.0,
    max_used_fraction: float = 0.2,
    max_wait_minutes: float = 24 * 60,
) -> bool:
    """Block until every device has been idle for ``idle_minutes``."""
    idle_since = None
    deadline = time.time() + max_wait_minutes * 60
    import jax

    n = len(jax.devices())
    while time.time() < deadline:
        if len(detect_available_devices(max_used_fraction)) == n:
            if idle_since is None:
                idle_since = time.time()
            elif time.time() - idle_since >= idle_minutes * 60:
                return True
        else:
            idle_since = None
        time.sleep(poll_seconds)
    return False


def main():
    import argparse

    from duodecoding_tpu.orchestrate.train_manager import AutoTrainManager

    ap = argparse.ArgumentParser()
    ap.add_argument("--series", default="llama")
    ap.add_argument("--idle_minutes", type=float, default=5.0)
    ap.add_argument("train_args", nargs="*")
    args = ap.parse_args()
    wait_for_idle(args.idle_minutes)
    mgr = AutoTrainManager(args.series, args.train_args)
    mgr.run(agent_paths=[])


if __name__ == "__main__":
    main()
