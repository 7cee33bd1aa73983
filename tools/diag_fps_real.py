"""Reproduce the anomalous fps eval rows (VERDICT r4 item 2) without the
chip: trained checkpoint + one real test scene on CPU, comparing the refined
attributes of fps/drop/voxel at matched keep ratios against the base model.
drop is the control (its committed sweep rows behave sanely).

Run: python tools/diag_fps_real.py [--scenes 1]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(__file__), "..", ".jax_cache"))
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="output/oodbench_scale_r4")
    ap.add_argument("--pad", type=int, default=16384)
    ap.add_argument("--scenes", type=int, default=1)
    args = ap.parse_args()

    from splatformer_tpu.configs import build_full_config
    from splatformer_tpu.training import checkpoints as ckpt_lib
    from splatformer_tpu.training.loop import (build_feature_predictor,
                                               make_splatfacto_data)
    from splatformer_tpu.training.optim import build_optimizer
    from splatformer_tpu.training.train_step import init_state

    overrides = [f"dataset.max_gs_num={args.pad}",
                 f"dataset.pad_to={args.pad}"]
    cfg = build_full_config("ptv3_base", "oodbench_scale", "default",
                            overrides)
    _, test_factories = make_splatfacto_data(cfg.dataset, 1)
    scenes = test_factories[next(iter(test_factories))]()[:args.scenes]
    print(f"{len(scenes)} scenes at pad {args.pad}", flush=True)

    base_model = build_feature_predictor(cfg.model)
    example = scenes[0][1].scene
    variables = base_model.init(jax.random.key(0), example, False)
    tx = build_optimizer(variables["params"],
                         lr_dict=dict(cfg.train.optimizer.lr_dict))
    state = init_state(base_model, tx, example, jax.random.key(0))
    best = os.path.join(args.run, "checkpoints_best")
    ck = best if ckpt_lib.latest_step(best) is not None else \
        os.path.join(args.run, "checkpoints")
    state = ckpt_lib.restore_checkpoint(ck, state)
    print(f"checkpoint: {ck} step {int(state.step)}", flush=True)
    mvars = {"params": state.params, "batch_stats": state.batch_stats}

    def refined(model, sb):
        out, _ = model.apply(mvars, sb.scene, False)
        return out

    outs_base = [refined(base_model, sb) for _, sb in scenes]

    def report(tag, model):
        for i, (_, sb) in enumerate(scenes):
            o = refined(model, sb)
            b = outs_base[i]
            mask = np.asarray(sb.scene.valid_mask())
            line = [tag]
            for k in ("means", "opacities", "features_dc"):
                d = np.abs(np.asarray(getattr(o, k)) -
                           np.asarray(getattr(b, k)))[mask]
                res = np.abs(np.asarray(getattr(b, k)) -
                             np.asarray(getattr(sb.scene, k)))[mask]
                line.append(f"{k}: mean|d|={d.mean():.4f} "
                            f"(res mean={res.mean():.4f})")
            print("  ".join(line), flush=True)

    for algo in ("drop", "fps"):
        for keep in (0.9, 0.5):
            mcfg = build_full_config(f"ptv3_{algo}", "oodbench_scale",
                                     "default", overrides).model
            mcfg.additional_info.downsample_ratio = keep
            report(f"{algo} keep={keep}", build_feature_predictor(mcfg))


if __name__ == "__main__":
    main()
