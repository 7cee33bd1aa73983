"""Generate the OOD refinement benchmark: the framework-native replacement
for the reference's DataGenerator stage (SURVEY.md C22,
/root/reference/README.md:33-49).

Per scene:
  1. procedurally build a ground-truth Gaussian scene (data/procgen.py);
  2. render input views on low-elevation rings and OOD test views at
     elevation 70/80/90 (the reference's OOD protocol,
     /root/reference/dataset/GS.py:222-238);
  3. fit an input 3DGS from the input views ONLY (training/fit_gs.py) —
     its high-elevation renders carry exactly the artifacts SplatFormer is
     trained to repair;
  4. write a REAL scene folder in the layout the training pipeline consumes
     (nerfstudio/<scene>/splatfacto/nerfstudio_models/step-*.ckpt +
     colmap/<scene>/{images,sparse/0}), so training runs through the
     standard SplatfactoScenes path unchanged.

    python scripts/make_ood_benchmark.py --out data/oodbench \
        --n_train_scenes 40 --n_test_scenes 8
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def write_scene_folder(root: str, name: str, gs: dict,
                       cams_in, cams_ood, imgs_in, imgs_ood,
                       gt_points: np.ndarray, gt_rgb: np.ndarray):
    """Write nerfstudio ckpt + COLMAP sparse model + PNG images."""
    import torch
    from splatformer_tpu.data import colmap as cm
    from splatformer_tpu.utils.logging import save_image

    ns_dir = os.path.join(root, "nerfstudio", name, "splatfacto",
                          "nerfstudio_models")
    os.makedirs(ns_dir, exist_ok=True)
    state = {f"_model.gauss_params.{k}": torch.from_numpy(np.asarray(v))
             for k, v in gs.items()}
    torch.save({"pipeline": state}, os.path.join(ns_dir, "step-000001999.ckpt"))

    cm_dir = os.path.join(root, "colmap", name)
    img_dir = os.path.join(cm_dir, "images")
    os.makedirs(img_dir, exist_ok=True)

    def colmap_pose(c2w_gl: np.ndarray):
        c2w = np.eye(4)
        c2w[:3, :4] = c2w_gl
        c2w[0:3, 1:3] *= -1  # OpenGL -> OpenCV
        w2c = np.linalg.inv(c2w)
        return cm.rotmat2qvec(w2c[:3, :3]), w2c[:3, 3]

    hw = imgs_in.shape[1]
    cameras = {1: cm.ColmapCamera(1, "PINHOLE", hw, hw, np.array(
        [float(cams_in.fx[0]), float(cams_in.fy[0]),
         float(cams_in.cx[0]), float(cams_in.cy[0])]))}
    images = {}
    img_id = 1
    empty = np.zeros((0, 2))
    empty_ids = np.zeros((0,), np.int64)
    for i in range(imgs_in.shape[0]):
        img_name = f"frame_{i:05d}.png"
        q, t = colmap_pose(np.asarray(cams_in.c2w[i]))
        images[img_id] = cm.ColmapImage(img_id, q, t, 1, img_name,
                                        empty, empty_ids)
        save_image(os.path.join(img_dir, img_name),
                   (np.clip(np.asarray(imgs_in[i]), 0, 1) * 255
                    ).astype(np.uint8))
        img_id += 1
    for i in range(imgs_ood.shape[0]):
        img_name = f"test_{i:02d}.png"
        q, t = colmap_pose(np.asarray(cams_ood.c2w[i]))
        images[img_id] = cm.ColmapImage(img_id, q, t, 1, img_name,
                                        empty, empty_ids)
        save_image(os.path.join(img_dir, img_name),
                   (np.clip(np.asarray(imgs_ood[i]), 0, 1) * 255
                    ).astype(np.uint8))
        img_id += 1

    sub = np.linspace(0, len(gt_points) - 1, min(1024, len(gt_points)),
                      dtype=int)
    points3D = {int(j) + 1: cm.ColmapPoint3D(
        int(j) + 1, gt_points[p].astype(np.float64),
        (np.clip(gt_rgb[p], 0, 1) * 255).astype(np.uint8), 0.0,
        np.zeros((0,), np.int64), np.zeros((0,), np.int64))
        for j, p in enumerate(sub)}
    cm.write_model(cameras, images, points3D,
                   os.path.join(cm_dir, "sparse", "0"), ext=".bin")


def sfm_like_seed_points(gt_means: np.ndarray, gt_rgb: np.ndarray,
                         cams_in, hw: int, n_seed: int, seed: int,
                         cell: int = 4, depth_tol: float = 0.04):
    """Subsample GT points visible from the INPUT cameras — a stand-in for
    the SfM sparse cloud splatfacto seeds from (nerfstudio seeds 3DGS means
    from COLMAP points3D, which only contain input-view-visible surface).

    Visibility: project every GT point into each input camera, z-buffer at
    ``cell``-pixel granularity, keep points within ``depth_tol`` of the
    front surface in at least one view. This keeps the benchmark honest:
    regions only the OOD cameras see stay unseeded, so the fitted 3DGS
    still develops the artifacts the refiner is trained to repair.
    """
    n = len(gt_means)
    vis = np.zeros(n, bool)
    bins = hw // cell
    for i in range(np.asarray(cams_in.c2w).shape[0]):
        c2w = np.eye(4)
        c2w[:3, :4] = np.asarray(cams_in.c2w[i])
        c2w[0:3, 1:3] *= -1  # OpenGL -> OpenCV
        w2c = np.linalg.inv(c2w)
        pc = gt_means @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        ok = z > 1e-3
        u = np.asarray(cams_in.fx[i]) * pc[:, 0] / np.maximum(z, 1e-3) \
            + np.asarray(cams_in.cx[i])
        v = np.asarray(cams_in.fy[i]) * pc[:, 1] / np.maximum(z, 1e-3) \
            + np.asarray(cams_in.cy[i])
        bu = (u // cell).astype(np.int64)
        bv = (v // cell).astype(np.int64)
        ok &= (bu >= 0) & (bu < bins) & (bv >= 0) & (bv < bins)
        flat = np.where(ok, bv * bins + bu, 0)
        zbuf = np.full(bins * bins, np.inf, np.float32)
        np.minimum.at(zbuf, flat[ok], z[ok].astype(np.float32))
        vis |= ok & (z <= zbuf[flat] + depth_tol)
    idx = np.flatnonzero(vis)
    rng = np.random.default_rng(seed)
    if len(idx) == 0:   # degenerate scene: fall back to uniform subsample
        idx = np.arange(n)
    take = idx[rng.integers(0, len(idx), size=n_seed)] if len(idx) < n_seed \
        else rng.choice(idx, size=n_seed, replace=False)
    jitter = rng.normal(0.0, 0.004, (n_seed, 3))
    return (gt_means[take] + jitter).astype(np.float32), \
        np.clip(gt_rgb[take], 0.0, 1.0).astype(np.float32), len(idx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_train_scenes", type=int, default=40)
    ap.add_argument("--n_test_scenes", type=int, default=8)
    ap.add_argument("--n_gauss", type=int, default=24576,
                    help="ground-truth Gaussians per scene")
    ap.add_argument("--capacity", type=int, default=16384,
                    help="fitted-3DGS slot capacity")
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--fit_steps", type=int, default=1000)
    ap.add_argument("--n_az_in", type=int, default=7,
                    help="input azimuths per elevation ring")
    ap.add_argument("--in_elevations", default="0,10",
                    help="comma-separated input-ring elevations (deg); the "
                         "round-3 protocol keeps them at/below 10 deg with "
                         "2 rings x 7 azimuths = 14 input views, so object "
                         "tops are genuinely unconstrained and the fitted "
                         "3DGS develops strong OOD artifacts (round 2's "
                         "3x8 views left the input 3DGS at 26.5 dB OOD — "
                         "too easy)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seed_points", type=int, default=0,
                    help="seed the fit from this many input-visible GT "
                         "points (SfM-style init, like splatfacto from "
                         "COLMAP points3D); 0 = random init (round-3 "
                         "protocol). At the 65k scale tier this is what "
                         "carries scenes to 50k+ live splats")
    ap.add_argument("--densify_budget_frac", type=float, default=0.05)
    ap.add_argument("--fit_warmup", type=int, default=200)
    ap.add_argument("--max_intersects", type=int, default=2 ** 17)
    ap.add_argument("--tiers", default="",
                    help="comma tier caps 's1,k2,s2,k3' for binning; at the "
                         "65k scale tier the auto baseline truncates (use "
                         "e.g. 8,32768,24,4096)")
    ap.add_argument("--tiles_per_gauss", type=int, default=64)
    ap.add_argument("--log_every", type=int, default=0)
    ap.add_argument("--platform", default="",
                    help="'cpu' forces the host backend (the axon plugin "
                         "overrides JAX_PLATFORMS, so this must be set "
                         "in-process)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache: generator restarts (and the train run that
    # follows) reuse the minutes-long remote TPU compiles
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from splatformer_tpu.data.procgen import make_gt_scene, ring_cameras
    from splatformer_tpu.ops.render import render_images
    from splatformer_tpu.ops.types import RasterizeConfig
    from splatformer_tpu.training import fit_gs

    tiers = (tuple(int(x) for x in args.tiers.split(","))
             if args.tiers else None)
    rcfg = RasterizeConfig(max_intersects=args.max_intersects,
                           tiers=tiers, tiles_per_gauss=args.tiles_per_gauss)
    render = jax.jit(lambda s, c: render_images(s, c, jnp.zeros(3), rcfg))

    fit_cfg = fit_gs.FitConfig(
        steps=args.fit_steps, capacity=args.capacity,
        warmup_steps=args.fit_warmup, densify_every=100,
        densify_stop=args.fit_steps * 2 // 3,
        densify_budget_frac=args.densify_budget_frac,
        reset_opacity_every=0, sh_degree=1,
        sh_degree_interval=max(args.fit_steps // 4, 1),
        lr_means=8e-4, lr_means_final=4e-5)

    splits = ([("train", args.seed + i) for i in range(args.n_train_scenes)]
              + [("test", args.seed + 10_000 + i)
                 for i in range(args.n_test_scenes)])
    summary = []
    for split, seed in splits:
        t0 = time.time()
        name = f"scene{seed:05d}"
        root = os.path.join(args.out, split)
        done_marker = os.path.join(root, "colmap", name, "sparse", "0",
                                   "points3D.bin")
        if os.path.exists(done_marker):
            print(f"[skip] {split}/{name} exists", flush=True)
            continue
        tmark = [time.time()]

        def phase(label):
            now = time.time()
            print(f"  [{label}: {now - tmark[0]:.1f}s]", flush=True)
            tmark[0] = now

        gt = make_gt_scene(seed, n_gauss=args.n_gauss)
        phase("gt_scene")
        # input rings stay low: object tops are genuinely unseen, so the
        # fitted 3DGS develops the OOD artifacts the refiner is trained to
        # repair (reference protocol: inputs low-elevation, OOD test at
        # 70/80/90 — dataset/GS.py:222-238)
        in_elevs = [float(e) for e in args.in_elevations.split(",")]
        cams_in = ring_cameras(in_elevs, args.n_az_in,
                               args.hw, args.hw, az_jitter=0.15, seed=seed)
        cams_ood = ring_cameras([70.0, 80.0, 90.0], 3, args.hw, args.hw,
                                az_jitter=0.3, seed=seed + 1)
        imgs_in = jnp.clip(render(gt, cams_in)[0], 0.0, 1.0)
        imgs_ood = jnp.clip(render(gt, cams_ood)[0], 0.0, 1.0)
        jax.block_until_ready(imgs_ood)
        phase("gt_renders")

        seed_pts = seed_cols = None
        n_visible = 0
        if args.seed_points > 0:
            seed_pts, seed_cols, n_visible = sfm_like_seed_points(
                np.asarray(gt.means),
                np.asarray(gt.features_dc) * 0.28209479177387814 + 0.5,
                cams_in, args.hw, args.seed_points, seed)
        scene, fit_m = fit_gs.fit_gaussians(
            imgs_in, cams_in, fit_cfg, rcfg, seed=seed,
            points=seed_pts, colors=seed_cols,
            log_every=args.log_every)
        phase("fit")
        in_ood = fit_gs.eval_fit(scene, imgs_ood, cams_ood, rcfg)
        in_train = fit_gs.eval_fit(scene, imgs_in, cams_in, rcfg)
        phase("eval_fit")

        mask = np.asarray(scene.mask)
        gs = {k: np.asarray(getattr(scene, k))[mask]
              for k in fit_gs.ATTRS}
        write_scene_folder(root, name, gs, cams_in, cams_ood,
                           np.asarray(imgs_in), np.asarray(imgs_ood),
                           np.asarray(gt.means), np.asarray(
                               gt.features_dc) * 0.28209479177387814 + 0.5)
        phase("write")
        row = {"split": split, "scene": name, "n_gauss": int(mask.sum()),
               "fit_psnr_input_views": round(in_train["psnr"], 3),
               "fit_psnr_ood_views": round(in_ood["psnr"], 3),
               "n_seed_visible": n_visible,
               "wall_s": round(time.time() - t0, 1)}
        summary.append(row)
        print(json.dumps(row), flush=True)
        # append incrementally so interrupted runs keep their records
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "generation_summary.jsonl"),
                  "a") as f:
            f.write(json.dumps(row) + "\n")

    print(f"wrote {len(summary)} scenes to {args.out}")


if __name__ == "__main__":
    main()
