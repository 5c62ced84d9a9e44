"""Deterministic communication cost model for the edge-end-cloud tiers.

Port of the reference's ``CommunicationSimulator`` family (reference:
src/communication.py:43-497, 792-872) as a host-side, framework-agnostic
cost model. This is deliberately NOT a transport: like the reference, real
tensor movement happens elsewhere (on TPU it is host<->device transfers and
mesh collectives); the simulator only prices payloads so the published
comm-time/bytes/energy numbers are reproducible.

Semantics preserved:
- ``t = bytes / bandwidth + NTT`` per transfer, with a global 5 Mbps
  bandwidth floor (src/communication.py:246-261);
- three links (edge_cloud / edge_end / cloud_end), per-link stats lists,
  connect counts; cloud_end NTT = edge_cloud NTT + edge_end NTT;
- top-k compressed payload sizing: ``k * prob_elem_size * seq_len`` plus
  the token bytes (src/communication.py:425-432);
- 6-byte accept/reject control messages (src/communication.py:451-459);
- stochastic mode replays a (real or synthetic) 5G uplink trace on the
  edge_cloud link, round-robin (src/communication.py:231-236);
- Shannon-capacity "precise" variant with comm energy
  ``sum(t_i * P_send)`` (src/communication.py:792-872).

Payloads are described by element counts + element sizes (or numpy/jax
arrays, from which both are taken), never by device tensors.
"""

from __future__ import annotations

from typing import Literal, Optional

import math

from duodecoding_tpu.comm.traces import load_trace

LinkType = Literal["edge_cloud", "edge_end", "cloud_end"]

DEFAULT_TRACE_DIR = "data/sigcomm-5gmemu-5g-mmWave-uplink-data/throughput"
TRACE_FILES = {
    "driving": f"{DEFAULT_TRACE_DIR}/driving/5g/throughput.list",
    "static": f"{DEFAULT_TRACE_DIR}/static/5g/away_p1.list",
    "walking": f"{DEFAULT_TRACE_DIR}/walking/5g/away.list",
}
CONTROL_MESSAGE_BYTES = 6
_FLOOR_BPS = 5.0 * 1e6 / 8


def convert_to_bytes_per_second(bandwidth: float, dimension: str = "Mbps") -> float:
    if dimension == "Mbps":
        return bandwidth * 1e6 / 8
    if dimension == "MBps":
        return bandwidth * 1e6
    if dimension == "bps":
        return bandwidth / 8
    if dimension == "Bps":
        return bandwidth
    raise ValueError(f"Unknown dimension: {dimension}")


def _nbytes(x, elem_size: int | None = None) -> int:
    """Payload size of ``x``: an int (element count, needs elem_size), an
    array-like with .size/.itemsize, or None."""
    if x is None:
        return 0
    if isinstance(x, (int, float)):
        if elem_size is None:
            raise ValueError("element count payloads need elem_size")
        return int(x) * elem_size
    size = getattr(x, "size", None)
    itemsize = getattr(x, "itemsize", None)
    if size is None:
        raise TypeError(f"cannot size payload of type {type(x)}")
    if elem_size is not None:
        itemsize = elem_size
    if itemsize is None:
        itemsize = 4
    return int(size) * int(itemsize)


class CommSimulator:
    def __init__(
        self,
        bandwidth_edge_cloud: float,
        bandwidth_edge_end: float,
        bandwidth_cloud_end: float = float("inf"),
        protocol_overhead_bytes: int = 0,
        transfer_top_k: Optional[int] = None,
        dimension: str = "Mbps",
        ntt_ms_edge_end: float = 20,
        ntt_ms_edge_cloud: float = 200,
        use_stochastic: bool = False,
        set_mean_bandwidth: bool = True,
        mode: str = "static",
        trace_root: str | None = None,
        trace_seed: int = 0,
    ):
        self.bandwidth_edge_cloud = convert_to_bytes_per_second(
            bandwidth_edge_cloud, dimension
        )
        self.bandwidth_edge_end = convert_to_bytes_per_second(
            bandwidth_edge_end, dimension
        )
        self.bandwidth_cloud_end = convert_to_bytes_per_second(
            bandwidth_cloud_end, dimension
        )
        self.protocol_overhead_bytes = protocol_overhead_bytes
        self.transfer_top_k = transfer_top_k
        self.ntt_edge_end = ntt_ms_edge_end / 1000.0
        self.ntt_edge_cloud = ntt_ms_edge_cloud / 1000.0

        self.stats: dict[str, list[dict]] = {
            "edge_cloud": [],
            "edge_end": [],
            "cloud_end": [],
        }
        self.connect_times = {"edge_end": 0, "cloud_end": 0, "edge_cloud": 0}
        self.edge_cloud_bandwidth_history: list[float] = []
        self.edge_cloud_topk_history: list[int] = []
        self.edge_cloud_draft_len_history: list[int] = []

        self.use_stochastic = use_stochastic
        self.trace_data: list[float] = []
        self.trace_index = 0
        if use_stochastic:
            trace_file = TRACE_FILES.get(mode, TRACE_FILES["static"])
            if trace_root is not None:
                trace_file = trace_file.replace(
                    DEFAULT_TRACE_DIR, trace_root.rstrip("/")
                )
            target_mean = bandwidth_edge_cloud if set_mean_bandwidth else None
            # trace samples are Mbps regardless of `dimension`
            self.trace_data = load_trace(trace_file, target_mean, mode, trace_seed)

    # ---- aggregate properties (reference src/communication.py:170-214) ----
    @property
    def edge_cloud_comm_time(self) -> float:
        return sum(u["transfer_time"] for u in self.stats["edge_cloud"])

    @property
    def edge_end_comm_time(self) -> float:
        return sum(u["transfer_time"] for u in self.stats["edge_end"])

    @property
    def cloud_end_comm_time(self) -> float:
        return sum(u["transfer_time"] for u in self.stats["cloud_end"])

    @property
    def total_comm_time(self) -> float:
        return (
            self.edge_cloud_comm_time
            + self.edge_end_comm_time
            + self.cloud_end_comm_time
        )

    @property
    def edge_cloud_data(self) -> float:
        return sum(u["data_size_bytes"] for u in self.stats["edge_cloud"])

    @property
    def edge_end_data(self) -> float:
        return sum(u["data_size_bytes"] for u in self.stats["edge_end"])

    @property
    def cloud_end_data(self) -> float:
        return sum(u["data_size_bytes"] for u in self.stats["cloud_end"])

    @property
    def total_comm_energy(self) -> float:
        return 0.0

    # ---- core time model ----
    def simulate_transfer(
        self,
        data_size_bytes: float,
        link_type: LinkType,
        add_to_stats: bool = True,
        topk: int = 0,
        draft_len: int = 0,
    ) -> float:
        if self.use_stochastic and link_type == "edge_cloud" and self.trace_data:
            current_bw_mbps = self.trace_data[self.trace_index]
            self.bandwidth_edge_cloud = convert_to_bytes_per_second(
                current_bw_mbps, "Mbps"
            )
            self.trace_index = (self.trace_index + 1) % len(self.trace_data)

        bandwidth = {
            "edge_cloud": self.bandwidth_edge_cloud,
            "edge_end": self.bandwidth_edge_end,
            "cloud_end": self.bandwidth_cloud_end,
        }[link_type]
        bandwidth = max(_FLOOR_BPS, bandwidth)
        transfer_time = data_size_bytes / bandwidth

        ntt = {
            "edge_end": self.ntt_edge_end,
            "edge_cloud": self.ntt_edge_cloud,
            "cloud_end": self.ntt_edge_cloud + self.ntt_edge_end,
        }[link_type]
        self.connect_times[link_type] += 1
        transfer_time += ntt

        if add_to_stats:
            self.stats[link_type].append(
                {"data_size_bytes": data_size_bytes, "transfer_time": transfer_time}
            )
            if link_type == "edge_cloud":
                # reference reports Mbps as bytes/s / (1024*1024/8)
                self.edge_cloud_bandwidth_history.append(
                    bandwidth / (1024 * 1024 / 8)
                )
                self.edge_cloud_topk_history.append(topk)
                self.edge_cloud_draft_len_history.append(draft_len)
        return transfer_time

    def transfer(
        self,
        tokens=None,
        probs=None,
        link_type: LinkType = "edge_cloud",
        is_compressed: bool = False,
        compressed_k: Optional[int] = 300,
        token_elem_size: int = 4,
        prob_elem_size: int = 4,
        seq_len: int | None = None,
    ) -> float:
        """Price one payload of draft tokens and/or probability rows.

        ``tokens`` / ``probs`` may be arrays or element counts. With
        ``is_compressed`` the probability payload is priced as
        ``compressed_k * prob_elem_size * seq_len`` — only the non-zero
        top-k entries travel (reference src/communication.py:397-449).
        """
        token_bytes = _nbytes(tokens, token_elem_size)
        prob_bytes = _nbytes(probs, prob_elem_size)
        total = token_bytes + prob_bytes + self.protocol_overhead_bytes

        if is_compressed and prob_bytes > 0 and compressed_k is not None:
            if seq_len is None:
                shape = getattr(probs, "shape", None)
                seq_len = shape[1] if (shape is not None and len(shape) == 3) else 1
            total = (
                token_bytes
                + compressed_k * prob_elem_size * seq_len
                + self.protocol_overhead_bytes
            )

        topk_val = 0
        draft_len_val = 0
        if link_type == "edge_cloud":
            topk_val = compressed_k if (is_compressed and compressed_k) else 0
            if tokens is not None:
                draft_len_val = (
                    int(tokens)
                    if isinstance(tokens, (int, float))
                    else int(getattr(tokens, "size", 0))
                )
        return self.simulate_transfer(
            total, link_type, topk=topk_val, draft_len=draft_len_val
        )

    def send_reject_message(self, link_type: LinkType) -> float:
        return self.simulate_transfer(CONTROL_MESSAGE_BYTES, link_type)

    def send_accept_message(self, link_type: LinkType) -> float:
        return self.simulate_transfer(CONTROL_MESSAGE_BYTES, link_type)


class PreciseCommSimulator(CommSimulator):
    """Shannon-capacity-driven simulator with comm-energy accounting
    (reference src/communication.py:792-872)."""

    def __init__(
        self,
        bandwidth_hz: float,
        channel_gain: float,
        send_power_watt: float,
        noise_power_watt: float,
        ntt_ms_edge_end: float = 20,
        ntt_ms_edge_cloud: float = 200,
        edge_cloud_args: dict | None = None,
        edge_end_args: dict | None = None,
    ):
        snr = channel_gain * send_power_watt / noise_power_watt
        capacity_bps = bandwidth_hz * math.log2(1 + snr)

        def link_bw(args):
            if args is None:
                return capacity_bps / 10
            try:
                link_snr = (
                    args["channel_gain"]
                    * args["send_power_watt"]
                    / args["noise_power_watt"]
                )
                return args["bandwidth_hz"] * math.log2(1 + link_snr)
            except KeyError:
                return capacity_bps / 10

        super().__init__(
            link_bw(edge_cloud_args),
            capacity_bps,
            link_bw(edge_end_args),
            dimension="bps",
            ntt_ms_edge_end=ntt_ms_edge_end,
            ntt_ms_edge_cloud=ntt_ms_edge_cloud,
        )
        self.send_power_watt = send_power_watt
        self.noise_power_watt = noise_power_watt
        self.bandwidth_hz = bandwidth_hz
        self.channel_gain = channel_gain
        self.snr = snr
        self.channel_capacity_bps = capacity_bps

    @property
    def total_comm_energy(self) -> float:
        return sum(
            u["transfer_time"] * self.send_power_watt
            for link in ("edge_cloud", "edge_end", "cloud_end")
            for u in self.stats[link]
        )
