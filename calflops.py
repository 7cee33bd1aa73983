"""Attention/MLP FLOPs profiler — the TPU equivalent of
/root/reference/calflops.py: run the backbone forward over test scenes,
collect per-stage point counts, compute per-Block attention + MLP GFLOPs
(same quantities the reference's fvcore hooks measure), average over scenes,
append gflops.csv with the reference schema 'gflops,algo,r'.

Also reports whole-program FLOPs from XLA cost analysis for context.
"""
import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ptv3_base")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--merge_rate", type=float, default=None)
    p.add_argument("--num_scenes", type=int, default=10)
    p.add_argument("--csv", default="gflops.csv")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--ckpt", default="",
                   help="training run dir; restores params so the "
                        "data-dependent effective-token stats are measured "
                        "on the trained model (gflops are shape-only and "
                        "unaffected)")
    p.add_argument("--override", action="append", default=[])
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from splatformer_tpu.configs import build_full_config
    from splatformer_tpu.data.synthetic import random_scene
    from splatformer_tpu.training.loop import build_feature_predictor
    from splatformer_tpu.utils.flops import (ptv3_attention_mlp_gflops,
                                             stage_points_from_diagnostics,
                                             xla_cost_analysis)

    cfg = build_full_config(args.model, args.dataset, "default",
                            args.override)
    if args.merge_rate is not None:
        cfg.model.additional_info.r = args.merge_rate
        if cfg.model.additional_info.get("tome") == "algm":
            # ALGM's reduction knob is the adjacency-similarity threshold,
            # not a fixed rate: map the sweep's r onto it (lower threshold
            # -> more adjacent merges) so the r column stays the sweep key
            cfg.model.additional_info.threshold = 1.0 - args.merge_rate
    model = build_feature_predictor(cfg.model)

    if cfg.dataset.get("synthetic", False):
        scenes = [random_scene(np.random.default_rng(i),
                               cfg.dataset.n_gaussians,
                               sh_degree=cfg.model.sh_degree)
                  for i in range(args.num_scenes)]
    else:
        from splatformer_tpu.training.loop import make_splatfacto_data
        _, test_factories = make_splatfacto_data(cfg.dataset, 1)
        scenes = [b.scene for _, b in
                  next(iter(test_factories.values()))()[:args.num_scenes]]

    variables = model.init(jax.random.key(0), scenes[0], False)
    if args.ckpt:
        from splatformer_tpu.training import checkpoints as ckpt_lib
        from splatformer_tpu.training.optim import build_optimizer
        from splatformer_tpu.training.train_step import init_state
        tx = build_optimizer(variables["params"], lr_dict={"base": 1e-4})
        state = init_state(model, tx, scenes[0], jax.random.key(0))
        best = os.path.join(args.ckpt, "checkpoints_best")
        ck = best if ckpt_lib.latest_step(best) is not None else \
            os.path.join(args.ckpt, "checkpoints")
        state = ckpt_lib.restore_checkpoint(ck, state)
        print(f"restored {ck} step {int(state.step)}")
        variables = {"params": state.params,
                     **({"batch_stats": state.batch_stats}
                        if state.batch_stats else {})}
    fwd = jax.jit(lambda s: model.apply(variables, s, False))

    attn_g, mlp_g = [], []
    for scene in scenes:
        _, diag = fwd(scene)
        pts = stage_points_from_diagnostics(jax.device_get(diag))
        a, m = ptv3_attention_mlp_gflops(
            model.backbone_kwargs or {}, pts,
            dict(cfg.model.additional_info or {}))
        attn_g.append(a)
        mlp_g.append(m)
    attn_avg = float(np.mean(attn_g))
    mlp_avg = float(np.mean(mlp_g))
    info = dict(cfg.model.additional_info or {})
    algo = info.get("tome", "base")
    r = info.get("r", 0.0)
    print(f"attention GFLOPs/scene: {attn_avg:.2f}  mlp: {mlp_avg:.2f} "
          f"(algo={algo}, r={r})")
    try:
        ca = xla_cost_analysis(lambda s: model.apply(variables, s, False)[0],
                               scenes[0])
        if "flops" in ca:
            print(f"whole-forward XLA flops: {ca['flops'] / 1e9:.2f} G")
    except Exception as e:  # cost analysis unavailable on some backends
        print("XLA cost analysis unavailable:", e)

    new = not os.path.exists(args.csv)
    with open(args.csv, "a") as f:
        if new:
            f.write("gflops,algo,r\n")
        f.write(f"{attn_avg},{algo},{r}\n")

    # companion effective-token measurement (VERDICT r4 item 8): for the
    # data-dependent reducers (ALGM especially, whose static-shape gflops
    # rows equal base by design) the actual lever is how many tokens stay
    # live after merging — measure it with the attention replay and record
    # it next to the gflops rows.
    from splatformer_tpu.ops import merging as merging_ops
    if algo != "base" and info.get("tome") in merging_ops.MERGE_MODES \
            and float(info.get("r", 0.0) or 0.0) > 0.0:
        from splatformer_tpu.utils.attn_replay import replay_model
        patch = (model.backbone_kwargs or {}).get("patch_size", 128)
        tot, eff = 0, 0
        res = replay_model(model, variables, scenes[0],
                           model.backbone_kwargs or {}, patch,
                           dict(info))
        for path, rec in res.items():
            tot += rec["n_tokens"]
            eff += rec["n_effective_tokens"]
        ratio = eff / max(tot, 1)
        print(f"effective tokens: {eff}/{tot} = {ratio:.3f} "
              f"({len(res)} blocks)")
        tcsv = os.path.splitext(args.csv)[0] + "_tokens.csv"
        tnew = not os.path.exists(tcsv)
        with open(tcsv, "a") as f:
            if tnew:
                f.write("algo,r,n_tokens,n_effective_tokens,ratio\n")
            f.write(f"{algo},{r},{tot},{eff},{ratio:.4f}\n")


if __name__ == "__main__":
    main()
