from duodecoding_tpu.adaptive.arp import (
    arp_apply,
    init_arp_head,
    load_arp_head,
    make_arp_stop_fn,
    save_arp_head,
    train_arp_head,
)
from duodecoding_tpu.adaptive.rl import (
    KNOWN_TASKS,
    THRESHOLD_CANDIDATES,
    TOPK_CANDIDATES,
    DDQNAgent,
    RLNetworkAdapter,
)

__all__ = [
    "arp_apply",
    "init_arp_head",
    "load_arp_head",
    "save_arp_head",
    "make_arp_stop_fn",
    "train_arp_head",
    "DDQNAgent",
    "RLNetworkAdapter",
    "KNOWN_TASKS",
    "TOPK_CANDIDATES",
    "THRESHOLD_CANDIDATES",
]
