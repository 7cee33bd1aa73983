"""Train/eval entry point — the TPU equivalent of /root/reference/train.py.

Examples:
  # smoke train on synthetic scenes (no external data needed)
  python train.py --dataset synthetic --output_dir output/smoke --max_steps 20

  # full recipe (needs the SplatFormer datasets on disk)
  python train.py --model ptv3_base --dataset objaverse --output_dir output/run

  # eval-only with merge-rate sweep knob (CLI beats config, train.py:391-393)
  python train.py --model ptv3_tome --merge_rate 0.5 --only_eval \
      --output_dir output/run --eval_subdir test --compare_with_input
"""
import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ptv3_base")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--train_config", default="default")
    p.add_argument("--output_dir", default="output/exp")
    p.add_argument("--only_eval", action="store_true")
    p.add_argument("--eval_subdir", default="test")
    p.add_argument("--merge_rate", type=float, default=None,
                   help="overrides additional_info.r (CLI > config)")
    p.add_argument("--compare_with_input", action="store_true")
    p.add_argument("--ckpt", default="best", choices=("best", "last"),
                   help="eval-only: restore the best-by-held-out-PSNR "
                        "checkpoint when one exists (default), or the last")
    p.add_argument("--save_as_single", action="store_true")
    p.add_argument("--save_viewer", action="store_true")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--override", action="append", default=[],
                   help="config override a.b.c=value (repeatable)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (axon plugin otherwise grabs "
                        "a remote TPU)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    # persistent compile cache: restarts and the eval-only pass reuse the
    # (minutes-long, remote) TPU compiles instead of repaying them
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from splatformer_tpu.parallel.distributed import \
        maybe_initialize_distributed
    maybe_initialize_distributed()

    from splatformer_tpu.configs import build_full_config
    from splatformer_tpu.models.lpips import make_lpips_fn
    from splatformer_tpu.ops.types import RasterizeConfig
    from splatformer_tpu.parallel.mesh import make_mesh
    from splatformer_tpu.training import checkpoints as ckpt_lib
    from splatformer_tpu.training.loop import (build_feature_predictor,
                                               evaluation,
                                               make_splatfacto_data,
                                               make_synthetic_data,
                                               run_training)
    from splatformer_tpu.utils.logging import get_logger, log_result_csv

    cfg = build_full_config(args.model, args.dataset, args.train_config,
                            args.override)
    if args.merge_rate is not None:
        cfg.model.additional_info.r = args.merge_rate

    os.makedirs(args.output_dir, exist_ok=True)
    logger = get_logger(os.path.join(args.output_dir, "train.log"))
    logger.info("devices: %s", jax.devices())

    if not args.only_eval:
        run_training(cfg, args.output_dir, max_steps=args.max_steps)
        return

    # eval-only path
    mesh = make_mesh()
    rcfg = RasterizeConfig()
    model = build_feature_predictor(cfg.model)
    from splatformer_tpu.ops.calibrate import (calibrate_raster_config,
                                               calibration_summary)
    if cfg.dataset.get("synthetic", False):
        _, test_factories = make_synthetic_data(
            cfg.dataset, mesh.devices.size, rcfg)
        example = test_factories["synthetic"]()[0][1].scene
    else:
        _, test_factories = make_splatfacto_data(cfg.dataset,
                                                 mesh.devices.size)
        first = next(iter(test_factories.values()))()
        example = first[0][1].scene
        if cfg.train.get("auto_raster_budget", True):
            rcfg = calibrate_raster_config(
                [(sb.scene, sb.cameras) for _, sb in first], rcfg)
            logger.info("calibrated raster budgets: %s",
                        calibration_summary(rcfg))
    variables = model.init(jax.random.key(0), example, False)
    from splatformer_tpu.training.optim import build_optimizer
    from splatformer_tpu.training.train_step import init_state
    tx = build_optimizer(variables["params"],
                         lr_dict=dict(cfg.train.optimizer.lr_dict))
    state = init_state(model, tx, example, jax.random.key(0))
    # prefer the best-by-held-out-PSNR checkpoint (training saves one at
    # every improving eval); --ckpt last opts out
    best_dir = os.path.join(args.output_dir, "checkpoints_best")
    if args.ckpt == "best" and ckpt_lib.latest_step(best_dir) is not None:
        state = ckpt_lib.restore_checkpoint(best_dir, state)
        logger.info("eval from BEST checkpoint, step %d", int(state.step))
    else:
        state = ckpt_lib.restore_checkpoint(
            os.path.join(args.output_dir, "checkpoints"), state)
        logger.info("eval from step %d", int(state.step))

    lpips_fn = make_lpips_fn(cfg.train.get("lpips_weights_path", ""))
    info = dict(cfg.model.additional_info or {})
    algo = info.get("tome", "base")
    r = info.get("r", 0.0)
    for name, factory in test_factories.items():
        scenes = factory() if callable(factory) else factory
        metrics, metrics_input, max_mem = evaluation(
            model, state.params, state.batch_stats, scenes, mesh, rcfg,
            output_dir=os.path.join(args.output_dir, args.eval_subdir, name),
            output_gt=True, compare_with_input=args.compare_with_input,
            save_as_single=args.save_as_single, save_viewer=args.save_viewer,
            lpips_fn=lpips_fn)
        logger.info("eval %s: %s", name,
                    " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
        if metrics_input:
            logger.info("input 3DGS %s: %s", name,
                        " ".join(f"{k}={v:.4f}"
                                 for k, v in metrics_input.items()))
        log_result_csv("eval.csv", name, metrics, algo=algo, r=r,
                       max_mem=max_mem)


if __name__ == "__main__":
    main()
