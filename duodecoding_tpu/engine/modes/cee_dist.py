"""`cee_dssd` and `cee_dsd` — tri-tier staged SD with DSSD- / DSD-style
per-stage transfer protocols.

Reference: src/baselines.py:3542-3866 (cee_dssd) and :3867-4183 (cee_dsd).
Both run the same staged verification as `tridecoding`
(resolve_stage_verification per stage); they differ only in what travels:

- cee_dssd (split): uplink ids + scalar q values per stage; on reject the
  verifier downlinks ONE compressed prob row; then index + token.
- cee_dsd (batch window): uplink the whole token sequence (stage 1) /
  the fresh speculated ids (stage 2) plus the full compressed probability
  WINDOW for the stage; reject is only a 6-byte message (the verifier
  already holds the window); then index + token.
"""

from __future__ import annotations

from duodecoding_tpu.engine.metrics import finalize_throughput
from duodecoding_tpu.engine.modes.common import (
    INT_SIZE,
    PROB_BYTES,
    TOKEN_BYTES,
    make_comm_simulator,
)
from duodecoding_tpu.engine.modes.tridecoding import run_tri_loop, tri_metrics
from duodecoding_tpu.engine.registry import register_mode


def _stage_epilogue(comm, link):
    comm.simulate_transfer(INT_SIZE, link)
    comm.transfer(1, None, link, token_elem_size=TOKEN_BYTES)


def _replay_cee_dssd(engine, run, comm, k):
    compressed = k is not None and k > 0
    V = engine.vocab_size
    comm.transfer(run.prompt_len, None, "edge_end", token_elem_size=TOKEN_BYTES)
    p = run.prompt_len
    for i in range(run.iters):
        g2, acc1 = int(run.little_gamma[i]), int(run.little_accepted[i])
        tg = int(run.total_gamma[i])
        if g2 > 0:
            comm.transfer(
                g2, g2, "edge_end",
                token_elem_size=TOKEN_BYTES, prob_elem_size=PROB_BYTES,
            )
            if not run.s1_all_accept[i]:
                comm.send_reject_message("edge_end")
                comm.transfer(
                    None, V, "edge_end",
                    is_compressed=compressed, compressed_k=k,
                    prob_elem_size=PROB_BYTES, seq_len=1,
                )
        _stage_epilogue(comm, "edge_end")
        carried = acc1 + 1
        if i == 0:
            comm.transfer(p + carried, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
        else:
            comm.transfer(carried, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
        if tg > 0:
            comm.transfer(
                tg, tg, "edge_cloud",
                token_elem_size=TOKEN_BYTES, prob_elem_size=PROB_BYTES,
            )
            if not run.s2_all_accept[i]:
                comm.send_reject_message("edge_cloud")
                comm.transfer(
                    None, V, "edge_cloud",
                    is_compressed=compressed, compressed_k=k,
                    prob_elem_size=PROB_BYTES, seq_len=1,
                )
        _stage_epilogue(comm, "edge_cloud")
        _stage_epilogue(comm, "edge_end")
        p += int(run.emitted[i])


def _replay_cee_dsd(engine, run, comm, k, gamma1):
    compressed = k is not None and k > 0
    V = engine.vocab_size
    comm.transfer(run.prompt_len, None, "edge_end", token_elem_size=TOKEN_BYTES)
    p = run.prompt_len
    for i in range(run.iters):
        g2, acc1 = int(run.little_gamma[i]), int(run.little_accepted[i])
        tg = int(run.total_gamma[i])
        # stage 1: whole x + prob window
        comm.transfer(p + g2, None, "edge_end", token_elem_size=TOKEN_BYTES)
        comm.transfer(
            None, g2 * V, "edge_end",
            is_compressed=compressed, compressed_k=k,
            prob_elem_size=PROB_BYTES, seq_len=g2,
        )
        if g2 > 0 and not run.s1_all_accept[i]:
            comm.send_reject_message("edge_end")
        _stage_epilogue(comm, "edge_end")
        carried = acc1 + 1
        if i == 0:
            comm.transfer(p + carried, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
        else:
            comm.transfer(carried, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
        g1 = int(run.draft_gamma[i]) or gamma1
        comm.transfer(g1, None, "edge_cloud", token_elem_size=TOKEN_BYTES)
        comm.transfer(
            None, tg * V, "edge_cloud",
            is_compressed=compressed, compressed_k=k,
            prob_elem_size=PROB_BYTES, seq_len=tg,
        )
        if tg > 0 and not run.s2_all_accept[i]:
            comm.send_reject_message("edge_cloud")
        _stage_epilogue(comm, "edge_cloud")
        _stage_epilogue(comm, "edge_end")
        p += int(run.emitted[i])


def _run(engine, prefix, transfer_top_k, use_early_stopping, replay, **replay_kw):
    compressed = transfer_top_k is not None and transfer_top_k > 0
    run = run_tri_loop(
        engine,
        prefix,
        rebuild_top_k=transfer_top_k if compressed else None,
        use_early_stopping=use_early_stopping,
    )
    comm = make_comm_simulator(engine, transfer_top_k=transfer_top_k)
    replay(engine, run, comm, transfer_top_k if compressed else None, **replay_kw)
    m = tri_metrics(engine, run, comm, transfer_top_k)
    return run.tokens, m


@register_mode("cee_dssd")
def cee_dssd(engine, prefix, transfer_top_k=300, use_early_stopping=False, **kw):
    return _run(engine, prefix, transfer_top_k, use_early_stopping, _replay_cee_dssd)


@register_mode("cee_dsd")
def cee_dsd(engine, prefix, transfer_top_k=300, use_early_stopping=False, **kw):
    return _run(
        engine,
        prefix,
        transfer_top_k,
        use_early_stopping,
        _replay_cee_dsd,
        gamma1=engine.config.gamma1,
    )
