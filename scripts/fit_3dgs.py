"""Fit a per-scene 3DGS from a COLMAP capture — the framework's native
replacement for the reference's DataGenerator/splatfacto stage (SURVEY.md
C22: /root/reference/README.md:33-49 fits splatfacto 10k steps per scene to
produce the checkpoints SplatFormer refines).

Reads <scene>/sparse/0 + <scene>/images, normalizes the scene to the unit
cube with the same ratio-preserving MinMax scaler the dataset applies to
nerfstudio checkpoints (transforms.MinMaxScaler), fits with
training/fit_gs.py on the framework's own differentiable rasterizer, and
writes the scene npz cache consumed by data/dataset.py (identical schema to
scripts/prepare_data.py), plus an optional Inria-format PLY for the viewer.

    python scripts/fit_3dgs.py --colmap data/colmap/scene0 \
        --out cache/scene0.npz --steps 4000 [--ply out/scene0.ply]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--colmap", required=True,
                    help="scene dir with images/ and sparse/0")
    ap.add_argument("--out", required=True, help="output scene npz")
    ap.add_argument("--ply", default=None, help="optional viewer PLY path")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--capacity", type=int, default=2 ** 17)
    ap.add_argument("--sh_degree", type=int, default=1)
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--max_intersects", type=int, default=2 ** 19)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=200)
    args = ap.parse_args()

    import jax.numpy as jnp
    from splatformer_tpu.data import colmap as colmap_io
    from splatformer_tpu.data.dataset import read_image
    from splatformer_tpu.data.nerfstudio import load_cameras_colmap
    from splatformer_tpu.data.transforms import MinMaxScaler
    from splatformer_tpu.ops.types import Camera, RasterizeConfig
    from splatformer_tpu.training import fit_gs
    from splatformer_tpu.utils.viewer import export_ply_for_viewer

    meta, train_paths, test_paths = load_cameras_colmap(args.colmap)
    _, _, points3d = colmap_io.read_model(
        os.path.join(args.colmap, "sparse", "0"))
    pts = np.stack([p.xyz for p in points3d.values()]).astype(np.float32) \
        if points3d else None
    cols = (np.stack([p.rgb for p in points3d.values()]) / 255.0
            ).astype(np.float32) if points3d else None

    # normalize scene + cameras into the unit cube (GS.py:190-198 semantics)
    scaler = MinMaxScaler()
    if pts is not None and len(pts) > 32:
        pts = scaler.fit_transform(pts)
    else:
        cams_pos = meta["train_camera_to_worlds"][:, :3, 3]
        scaler.fit_transform(cams_pos.copy())
        pts, cols = None, None
    for key in ("train_camera_to_worlds", "test_camera_to_worlds"):
        if len(meta[key]):
            meta[key] = np.asarray(meta[key], np.float32)
            meta[key][:, :3, -1] = scaler.transform(meta[key][:, :3, -1])

    d = max(args.downscale, 1)
    bg = np.zeros(3, np.float32)
    imgs = np.stack([read_image(p, bg)[::d, ::d] for p in train_paths])
    height, width = imgs.shape[1], imgs.shape[2]
    c2w = meta["train_camera_to_worlds"][:, :3, :4]
    v = c2w.shape[0]
    cameras = Camera(
        c2w=jnp.asarray(c2w),
        fx=jnp.full((v,), meta["fx"] / d), fy=jnp.full((v,), meta["fy"] / d),
        cx=jnp.full((v,), meta["cx"] / d), cy=jnp.full((v,), meta["cy"] / d),
        width=width, height=height)

    cfg = fit_gs.FitConfig(steps=args.steps, capacity=args.capacity,
                           sh_degree=args.sh_degree)
    rcfg = RasterizeConfig(max_intersects=args.max_intersects)
    scene, metrics = fit_gs.fit_gaussians(
        jnp.asarray(imgs), cameras, cfg, rcfg, points=pts, colors=cols,
        seed=args.seed, log_every=args.log_every)
    final = fit_gs.eval_fit(scene, jnp.asarray(imgs), cameras, rcfg)
    print("fit:", metrics, "train-view:", final)

    # compact to valid Gaussians and write the dataset npz schema
    mask = np.asarray(scene.mask)
    gs = {k: np.asarray(getattr(scene, k))[mask] for k in fit_gs.ATTRS}
    flat = {f"gs/{k}": v for k, v in gs.items()}
    flat.update({f"meta/{k}": np.asarray(v) for k, v in meta.items()})
    flat["scene_name"] = np.asarray(
        os.path.basename(args.colmap.rstrip("/")))
    flat["train_imgs_path"] = np.asarray(train_paths)
    flat["test_imgs_path"] = np.asarray(test_paths)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, **flat)
    print("wrote", args.out, f"({int(mask.sum())} gaussians)")

    if args.ply:
        os.makedirs(os.path.dirname(args.ply) or ".", exist_ok=True)
        export_ply_for_viewer(gs, args.ply)
        print("wrote", args.ply)


if __name__ == "__main__":
    main()
