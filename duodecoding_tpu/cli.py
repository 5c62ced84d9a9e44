"""Command-line entry point.

Typed-config replacement for the reference's ~50-flag argparse monolith
(reference: src/utils.py:248-647): flags map 1:1 where behavior matches,
model aliases resolve through the zoo (models/config.py), ARP/RL
checkpoint paths resolve through the registries (adaptive/registries.py).
With no checkpoints reachable (zero-egress), ``--random_weights``
instantiates the true architectures with random parameters so every mode
and harness still runs end-to-end.
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("duodecoding-tpu")
    # models
    p.add_argument("--eval_mode", "-e", default="sd")
    p.add_argument("--draft_model", "-d", default="llama-68m")
    p.add_argument("--target_model", "-t", default="tiny-llama-1.1b")
    p.add_argument("--little_model", "-l", default=None)
    p.add_argument("--random_weights", action="store_true", default=False)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--quantize_draft_int4", action="store_true")
    p.add_argument("--int4_group_size", type=int, default=128)
    # decoding
    p.add_argument("--max_tokens", "-n", type=int, default=128)
    p.add_argument("--gamma", "-g", type=int, default=4)
    p.add_argument("--tree_k", type=int, default=2,
                   help="sd_tree fork width (DuoDecoding k-sequence draft)")
    p.add_argument("--tree_spec", type=str, default=None,
                   help="sd_tree per-level branch factors, e.g. '4,2,2,1' "
                        "(overrides --tree_k/--gamma); ';'-separated specs "
                        "enable dynamic per-iteration width selection "
                        "(confident-to-uncertain order)")
    p.add_argument("--datastore", type=str, default=None,
                   help="rest/rest_tree retrieval datastore path; when "
                        "missing, a store is BUILT from the task's data "
                        "jsonls and saved there (reference "
                        "get_datastore_chat.py pipeline)")
    p.add_argument("--datastore_data", type=str, default=None,
                   help="comma-separated jsonl corpus paths for the "
                        "datastore build (default: the task's data files)")
    p.add_argument("--max_suffix", type=int, default=16,
                   help="rest: longest suffix length to match")
    p.add_argument("--tree_gap", type=str, default=None,
                   help="descending draft first-token logit-gap thresholds "
                        "for dynamic tree width (comma-separated, "
                        "len(specs)-1 values; default 2.0)")
    p.add_argument("--gamma1", type=int, default=4)
    p.add_argument("--gamma2", type=int, default=4)
    p.add_argument("--temp", type=float, default=0.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=0.0)
    p.add_argument("--transfer_top_k", type=int, default=1024)
    p.add_argument("--max_seq_len", type=int, default=2048)
    p.add_argument("--seed", type=int, default=1234)
    # network
    p.add_argument("--edge_cloud_bandwidth", type=float, default=23.6)
    p.add_argument("--edge_end_bandwidth", type=float, default=563.0)
    p.add_argument("--cloud_end_bandwidth", type=float, default=float("inf"))
    p.add_argument("--ntt_ms_edge_cloud", type=float, default=10.0)
    p.add_argument("--ntt_ms_edge_end", type=float, default=0.0)
    p.add_argument("--use_stochastic_comm", action="store_true")
    p.add_argument("--use_precise", dest="use_precise_comm_sim", action="store_true")
    p.add_argument("--batch_delay", type=float, default=0.0)
    p.add_argument("--uncertainty_threshold", type=float, default=0.8)
    # adaptive
    p.add_argument("--use_adapter", action="store_true", help="enable ARP heads")
    p.add_argument("--acc_head_path", default=None)
    p.add_argument("--little_acc_head_path", default=None)
    p.add_argument("--small_draft_threshold", type=float, default=0.6)
    p.add_argument("--draft_target_threshold", type=float, default=0.6)
    p.add_argument("--use_rl_adapter", action="store_true")
    # head-based drafting modes (medusa / hydra / eagle / eagle2): heads are
    # self-distilled from the target at startup unless a path is given
    p.add_argument("--distill_prompts", type=int, default=4)
    p.add_argument("--distill_new", type=int, default=48)
    p.add_argument("--distill_epochs", type=int, default=40)
    p.add_argument("--num_draft_heads", type=int, default=3)
    p.add_argument("--eagle_depth", type=int, default=4)
    p.add_argument("--eagle_topk", type=int, default=8)
    p.add_argument("--rl_path", default=None)
    p.add_argument("--little_rl_path", default=None)
    p.add_argument("--disable_rl_update", action="store_true")
    p.add_argument("--checkpoint_root", default="checkpoints")
    # eval
    p.add_argument("--task", default="mt_bench")
    p.add_argument("--sub_domain", default="mt_bench")
    p.add_argument("--eval_data_num", type=int, default=None)
    p.add_argument("--num_shots", type=int, default=3)
    p.add_argument("--exp_name", default="exp/run")
    p.add_argument("--template", default="plain")
    p.add_argument("--use_early_stopping", action="store_true", default=True)
    p.add_argument("--dump_network_stats", action="store_true")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX platform (overrides environment plugins)")
    return p


def build_engine(args):
    import jax

    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
    from duodecoding_tpu.models import init_random_params, resolve_config
    from duodecoding_tpu.models.quant import quantize_params

    def make_tier(name, key, quantize=False):
        if name is None:
            return None
        cfg = resolve_config(name)
        if args.random_weights:
            params = init_random_params(cfg, jax.random.PRNGKey(key))
        else:
            from duodecoding_tpu.models.loader import load_hf_model

            try:
                cfg, params = load_hf_model(name)
            except Exception as e:
                raise SystemExit(
                    f"cannot load checkpoint for {name!r} ({e}); "
                    "pass --random_weights for architecture-only runs"
                )
        if quantize:
            from duodecoding_tpu.models.quant import fuse_params

            # fused QKV/gate-up: one kernel launch per projection group
            # (exact — see models/quant.py::fuse_layer_weights)
            params = fuse_params(quantize_params(params, args.int4_group_size))
        return Tier(cfg, params)

    ec = EngineConfig(
        max_tokens=args.max_tokens,
        gamma=args.gamma,
        gamma1=args.gamma1,
        gamma2=args.gamma2,
        temperature=args.temp,
        top_k=args.top_k,
        top_p=args.top_p,
        transfer_top_k=args.transfer_top_k,
        edge_cloud_bandwidth=args.edge_cloud_bandwidth,
        edge_end_bandwidth=args.edge_end_bandwidth,
        cloud_end_bandwidth=args.cloud_end_bandwidth,
        ntt_ms_edge_cloud=args.ntt_ms_edge_cloud,
        ntt_ms_edge_end=args.ntt_ms_edge_end,
        use_stochastic_comm=args.use_stochastic_comm,
        use_precise_comm_sim=args.use_precise_comm_sim,
        batch_delay=args.batch_delay,
        max_seq_len=args.max_seq_len,
        seed=args.seed,
        uncertainty_threshold=args.uncertainty_threshold,
    )
    return Engine(
        target=make_tier(args.target_model, 7),
        draft=make_tier(args.draft_model, 3, quantize=args.quantize_draft_int4),
        little=make_tier(args.little_model, 1),
        config=ec,
    )


def _self_distill_heads(args, engine):
    """Train drafting heads for head-based modes at startup by
    self-distillation on the target's own greedy rollouts (no external
    data — the reference ships pre-trained Medusa/EAGLE/Hydra checkpoints;
    with zero egress the heads are fit in-process instead)."""
    import sys

    import numpy as np
    import jax

    target = engine.target
    cfg = target.cfg
    rng = np.random.default_rng(args.seed)
    prompts = rng.integers(
        1, cfg.vocab_size, (args.distill_prompts, 8), dtype=np.int64
    )
    mode = args.eval_mode
    print(f"[cli] self-distilling {mode} heads...", file=sys.stderr)
    if mode == "medusa":
        from duodecoding_tpu.adaptive.medusa import (
            collect_distill_data, init_medusa_heads, train_medusa_heads,
        )

        hiddens, labels = collect_distill_data(
            target.params, cfg, prompts, args.distill_new, args.num_draft_heads
        )
        heads = init_medusa_heads(
            jax.random.PRNGKey(args.seed), cfg.hidden_size, cfg.vocab_size,
            args.num_draft_heads,
        )
        heads, loss = train_medusa_heads(
            heads, hiddens, labels, epochs=args.distill_epochs
        )
        print(f"[cli] medusa distill loss {loss:.3f}", file=sys.stderr)
        return {"medusa_heads": heads}
    if mode == "hydra":
        from duodecoding_tpu.adaptive.hydra import (
            collect_hydra_data, init_hydra_heads, train_hydra_heads,
        )

        hiddens, tws, labels = collect_hydra_data(
            target.params, cfg, prompts, args.distill_new, args.num_draft_heads
        )
        heads = init_hydra_heads(
            jax.random.PRNGKey(args.seed), cfg.hidden_size, cfg.vocab_size,
            args.num_draft_heads,
        )
        heads, loss = train_hydra_heads(
            heads, target.params["embed"], hiddens, tws, labels,
            epochs=args.distill_epochs,
        )
        print(f"[cli] hydra distill loss {loss:.3f}", file=sys.stderr)
        return {"hydra_heads": heads}
    if mode == "space":
        from duodecoding_tpu.adaptive.space import (
            collect_space_data, train_space_masks,
        )

        rollouts, L = collect_space_data(
            target.params, cfg, prompts, args.distill_new
        )
        mask_emb, loss = train_space_masks(
            target.params, cfg, rollouts, L, k=args.num_draft_heads,
            epochs=args.distill_epochs * 2, anchors=6, seed=args.seed,
        )
        print(f"[cli] space distill loss {loss:.3f}", file=sys.stderr)
        return {"space_mask_emb": mask_emb, "num_masks": args.num_draft_heads}
    # eagle / eagle2
    from duodecoding_tpu.adaptive.eagle import (
        collect_eagle_data, init_eagle_params, train_eagle,
    )

    data = collect_eagle_data(target.params, cfg, prompts, args.distill_new)
    head = (
        target.params["embed"].T
        if cfg.tie_word_embeddings
        else target.params["lm_head"]
    )
    eparams = init_eagle_params(jax.random.PRNGKey(args.seed), cfg)
    eparams, loss = train_eagle(
        eparams, cfg, target.params["embed"], head, *data,
        epochs=max(args.distill_epochs * 3, 60),
    )
    print(f"[cli] eagle distill loss {loss:.3f}", file=sys.stderr)
    return {
        "eagle_params": eparams,
        "depth": args.eagle_depth,
        "top_k": args.eagle_topk,
    }


def build_mode_kwargs(args, engine):
    """Resolve adapters/RL per the registries, mirroring the reference's
    path resolution (src/utils.py:594-642)."""
    kw = {"transfer_top_k": args.transfer_top_k, "task_name": args.task}
    if args.eval_mode in ("sd_tree", "duodec", "sd_kseq"):
        kw["tree_k"] = args.tree_k
        if args.tree_spec:
            kw["tree_spec"] = args.tree_spec
        if args.tree_gap:
            kw["tree_gap"] = tuple(
                float(t) for t in args.tree_gap.split(",") if t
            )
    if args.eval_mode in (
        "medusa", "hydra", "eagle", "eagle2", "eagle2_fused", "eagle_fused",
        "space",
    ):
        kw.update(_self_distill_heads(args, engine))
    if args.eval_mode == "cee_cuhlm":
        kw["little_threshold"] = args.small_draft_threshold
        kw["draft_threshold"] = args.draft_target_threshold
    if args.use_adapter:
        from duodecoding_tpu.adaptive import load_arp_head
        from duodecoding_tpu.adaptive.registries import resolve_acc_head_path

        path = args.acc_head_path or resolve_acc_head_path(
            args.draft_model, args.target_model,
            root=os.path.join(args.checkpoint_root, "acc_heads"),
        )
        if path:
            kw["arp_params" if args.little_model is None else "draft_arp_params"] = (
                load_arp_head(path)
            )
        lpath = args.little_acc_head_path or (
            args.little_model
            and resolve_acc_head_path(
                args.little_model, args.draft_model,
                root=os.path.join(args.checkpoint_root, "acc_heads"),
            )
        )
        if lpath:
            kw["little_arp_params"] = load_arp_head(lpath)
        kw["draft_threshold"] = args.draft_target_threshold
        kw["little_threshold"] = args.small_draft_threshold
        if args.little_model is None:
            kw["arp_threshold"] = args.draft_target_threshold
    if args.use_rl_adapter:
        from duodecoding_tpu.adaptive import RLNetworkAdapter
        from duodecoding_tpu.adaptive.registries import get_rl_agent_spec

        spec = get_rl_agent_spec(
            role="main", source=args.draft_model, target=args.target_model,
            root=args.checkpoint_root,
        )
        main_rl = RLNetworkAdapter(
            model_path=args.rl_path or spec.latest_path,
            best_model_path=spec.best_path,
            threshold_candidates=spec.threshold_candidates,
            seed=args.seed,
        )
        if args.little_model is not None:
            lspec = get_rl_agent_spec(
                role="little", source=args.little_model, target=args.draft_model,
                root=args.checkpoint_root,
            )
            kw["little_rl"] = RLNetworkAdapter(
                model_path=args.little_rl_path or lspec.latest_path,
                best_model_path=lspec.best_path,
                threshold_candidates=lspec.threshold_candidates,
                seed=args.seed + 1,
            )
            kw["main_rl"] = main_rl
        else:
            kw["rl_adapter"] = main_rl
        kw["disable_rl_update"] = args.disable_rl_update
    return kw


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    engine = build_engine(args)
    from duodecoding_tpu.evalkit import get_task
    from duodecoding_tpu.utils import get_tokenizer

    tokenizer = get_tokenizer(
        args.tokenizer or (None if args.random_weights else args.target_model),
        vocab_size=engine.vocab_size,
    )
    mode_kwargs = build_mode_kwargs(args, engine)
    if args.eval_mode in ("rest", "rest_tree"):
        from duodecoding_tpu.native.datastore import resolve_datastore

        mode_kwargs["datastore"] = resolve_datastore(
            args.datastore,
            args.task,
            tokenizer,
            engine.vocab_size,
            data_files=(
                args.datastore_data.split(",") if args.datastore_data else None
            ),
            default_dir=args.exp_name,
        )
        mode_kwargs["max_suffix"] = args.max_suffix
    task_cls = get_task(args.task)
    task_kwargs = {}
    if args.task == "specbench":
        task_kwargs["sub_domain"] = args.sub_domain
    task = task_cls(
        engine,
        tokenizer,
        exp_dir=args.exp_name,
        eval_data_num=args.eval_data_num,
        template=args.template,
        dump_network_stats=args.dump_network_stats,
        use_early_stopping=args.use_early_stopping,
        warmup=args.warmup,
        mode_kwargs=mode_kwargs,
        **task_kwargs,
    )
    summary = task.run(args.eval_mode)
    print(json.dumps(summary, indent=2, default=str))
    return summary


if __name__ == "__main__":
    main()
