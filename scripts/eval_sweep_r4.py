"""Merge-rate quality sweep on a TRAINED checkpoint — the efficiency study
(reference /root/reference/eval.sh:1-8 + eval.csv schema, VERDICT r3
missing #1): evaluate every merging/downsampling algorithm x rate on the
held-out OOD test scenes and append 'dataset,psnr,ssim,lpips,algo,r,max mem'
rows to the root eval.csv.

TPU-shaped design: ONE process for the whole sweep (a remote-TPU claim
costs ~90 s; 50 subprocess runs would burn >1 h on claims alone), and the
rendering program is jitted ONCE and shared — only the backbone forward
(whose static shapes depend on algo/rate) recompiles per combination.

    python scripts/eval_sweep_r4.py --run output/oodbench_scale_r4 \
        --dataset oodbench_scale --pad 16384

Test scenes are truncated to --pad points (the reference's max_gs_num
truncation, dataset/GS.py:182-188) to bound the 50 per-combo compiles;
the full-scale base/input rows come from the training run's final eval.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MERGE_ALGOS = ("tome", "pitome", "tofu", "prune", "patch", "wpatch", "algm")
# ToMeSD-family analogs (ops/merging.py MERGE_MODES; VERDICT r4 missing #3:
# implemented but never swept) — no dedicated config files, they ride the
# tome config with additional_info.tome overridden
TOMESD_ALGOS = ("random_patch", "progressive", "important_patch")
DOWN_ALGOS = ("fps", "voxel", "drop")
RATES = (0.1, 0.3, 0.5, 0.7, 0.9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True,
                    help="training output dir (checkpoints_best/ preferred)")
    ap.add_argument("--dataset", default="oodbench_scale")
    ap.add_argument("--pad", type=int, default=16384)
    ap.add_argument("--csv", default="eval.csv")
    ap.add_argument("--rates", default=",".join(str(r) for r in RATES))
    ap.add_argument("--max_scenes", type=int, default=0,
                    help="cap the test-scene count (0 = all); the full-"
                         "scale 65k-pad pass uses 8 to bound eval cost")
    ap.add_argument("--algos",
                    default=",".join(MERGE_ALGOS + DOWN_ALGOS))
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from splatformer_tpu.configs import build_full_config
    from splatformer_tpu.models.lpips import make_lpips_fn
    from splatformer_tpu.ops.calibrate import (calibrate_raster_config,
                                               calibration_summary)
    from splatformer_tpu.ops.render import render_images
    from splatformer_tpu.ops.types import RasterizeConfig
    from splatformer_tpu.training import checkpoints as ckpt_lib
    from splatformer_tpu.training.loop import (build_feature_predictor,
                                               make_splatfacto_data)
    from splatformer_tpu.training.metrics import psnr, ssim
    from splatformer_tpu.utils.logging import log_result_csv

    overrides = [f"dataset.max_gs_num={args.pad}",
                 f"dataset.pad_to={args.pad}"]
    cfg = build_full_config("ptv3_base", args.dataset, "default", overrides)
    _, test_factories = make_splatfacto_data(cfg.dataset, 1)
    name0 = next(iter(test_factories))
    scenes = test_factories[name0]()
    if args.max_scenes:
        scenes = scenes[:args.max_scenes]
    print(f"{len(scenes)} test scenes at pad {args.pad}", flush=True)

    rcfg = calibrate_raster_config(
        [(sb.scene, sb.cameras) for _, sb in scenes], RasterizeConfig())
    print("calibrated:", calibration_summary(rcfg), flush=True)

    # params come from the trained base model; merging/downsampling variants
    # are parameter-free so one checkpoint serves every combo
    base_model = build_feature_predictor(cfg.model)
    example = scenes[0][1].scene
    variables = base_model.init(jax.random.key(0), example, False)
    from splatformer_tpu.training.optim import build_optimizer
    from splatformer_tpu.training.train_step import init_state
    tx = build_optimizer(variables["params"],
                         lr_dict=dict(cfg.train.optimizer.lr_dict))
    state = init_state(base_model, tx, example, jax.random.key(0))
    best_dir = os.path.join(args.run, "checkpoints_best")
    ck = best_dir if ckpt_lib.latest_step(best_dir) is not None else \
        os.path.join(args.run, "checkpoints")
    state = ckpt_lib.restore_checkpoint(ck, state)
    print(f"checkpoint: {ck} step {int(state.step)}", flush=True)
    params, batch_stats = state.params, state.batch_stats

    lpips_fn = make_lpips_fn(cfg.train.get("lpips_weights_path", ""))

    # ONE shared render program for every combo (and the input rows)
    @jax.jit
    def render(scene, c2w, fx, fy, cx, cy, background):
        from splatformer_tpu.ops.types import Camera
        cams = Camera(c2w=c2w, fx=fx, fy=fy, cx=cx, cy=cy,
                      width=scenes[0][1].cameras.width,
                      height=scenes[0][1].cameras.height)
        return render_images(scene, cams, background, rcfg)

    def eval_model(model, mvars, tag):
        if mvars is not None and not mvars.get("batch_stats"):
            mvars = {"params": mvars["params"]}
        # variables passed as ARGUMENTS (closure constants would bake the
        # checkpoint into each combo's program — recompile bloat per combo)
        fwd = (None if model is None else
               jax.jit(lambda v, s: model.apply(v, s, False)[0]))
        t0 = time.time()
        ps, ss, lp = [], [], []
        for _, sb in scenes:
            refined = sb.scene if fwd is None else fwd(mvars, sb.scene)
            rgb, _ = render(refined, sb.cameras.c2w, sb.cameras.fx,
                            sb.cameras.fy, sb.cameras.cx, sb.cameras.cy,
                            sb.background)
            ps.append(np.mean(np.asarray(psnr(rgb, sb.images))))
            ss.append(np.mean(np.asarray(ssim(rgb, sb.images))))
            if lpips_fn is not None:
                lp.append(float(np.mean(np.asarray(
                    lpips_fn(rgb, sb.images)))))
        m = {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss))}
        if lp:
            m["lpips"] = float(np.mean(lp))
        print(f"{tag}: psnr={m['psnr']:.3f} ssim={m['ssim']:.4f} "
              f"lpips={m.get('lpips', float('nan')):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        return m

    dataset_tag = f"{name0}-pad{args.pad}"
    done = set()
    if os.path.exists(args.csv):
        with open(args.csv) as f:
            for line in f.readlines()[1:]:
                parts = line.strip().split(",")
                if len(parts) >= 6 and parts[0] == dataset_tag:
                    done.add((parts[4], parts[5]))

    def row(algo, r, metrics):
        log_result_csv(args.csv, dataset_tag, metrics, algo=algo, r=r)

    # anchors: the raw input 3DGS and the trained base model (no reduction)
    if ("input", "0.0") not in done:
        row("input", 0.0, eval_model(None, None, "input"))
    if ("base", "0.0") not in done:
        row("base", 0.0, eval_model(
            base_model, {"params": params, "batch_stats": batch_stats},
            "base"))

    rates = [float(r) for r in args.rates.split(",")]
    for algo in args.algos.split(","):
        for r in rates:
            if (algo, str(r)) in done:
                print(f"[skip] {algo} r={r}", flush=True)
                continue
            base_cfg_name = (f"ptv3_{algo}" if algo not in TOMESD_ALGOS
                             else "ptv3_tome")
            mcfg = build_full_config(base_cfg_name, args.dataset,
                                     "default", overrides).model
            info = mcfg.additional_info
            if algo in TOMESD_ALGOS:
                info.tome = algo
                info.r = r
            elif algo in MERGE_ALGOS:
                info.r = r
                if algo == "algm":
                    # ALGM's knob is the similarity threshold (calflops.py
                    # uses the same r -> 1-r mapping)
                    info.threshold = round(1.0 - r, 4)
            elif algo in ("fps", "drop"):
                # r = fraction removed; the dispatch knob is the KEPT ratio
                info.downsample_ratio = round(1.0 - r, 4)
            elif algo == "voxel":
                # larger voxels remove more points; map r onto the voxel
                # edge so r=0.5 doubles the gin default edge length
                vs = round(0.0075 * (1.0 + 2.0 * r), 6)
                info.voxel_size = vs
                # capacity = exact occupied-voxel max over the test scenes
                # (host numpy): the r4 sweep's fixed 0.5 factor overflowed
                # at small voxel sizes and silently waste-bucketed points
                # (zero backbone features -> the non-monotone voxel rows)
                mx = 0
                for _, sb in scenes:
                    mv = np.asarray(sb.scene.means)[
                        np.asarray(sb.scene.valid_mask())]
                    v = np.floor(mv / vs).astype(np.int64)
                    key = v[:, 0] * 1_000_000 + v[:, 1] * 1_000 + v[:, 2]
                    mx = max(mx, len(np.unique(key)))
                info.voxel_capacity_factor = min(1.0, (mx + 256) / args.pad)
                print(f"voxel r={r}: max occupied {mx}, capacity_factor "
                      f"{info.voxel_capacity_factor:.3f}", flush=True)
            model = build_feature_predictor(mcfg)
            mvars = {"params": params, "batch_stats": batch_stats}
            try:
                m = eval_model(model, mvars, f"{algo} r={r}")
            except Exception as e:
                print(f"FAILED {algo} r={r}: {e}", flush=True)
                continue
            row(algo, r, m)

    print("sweep complete", flush=True)


if __name__ == "__main__":
    main()
