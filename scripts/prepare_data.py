"""Offline data prep: convert (nerfstudio splatfacto ckpt + COLMAP) scene
pairs into torch-free npz caches for fast loading (reference C22's output
format consumed by C6; SURVEY.md §7.1-5).

    python scripts/prepare_data.py \
        --nerfstudio train-set/objaverseOOD/nerfstudio \
        --colmap train-set/objaverseOOD/colmap \
        --out cache/objaverseOOD
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nerfstudio", required=True)
    ap.add_argument("--colmap", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--load_pose_src", default="nerfstudio")
    ap.add_argument("--max_gs_num", type=int, default=100_000)
    ap.add_argument("--remove_outlier_ndevs", type=float, default=-1.0)
    args = ap.parse_args()

    from splatformer_tpu.data.nerfstudio import convert_scene_to_npz

    os.makedirs(args.out, exist_ok=True)
    scenes = sorted(os.listdir(args.nerfstudio))
    for name in scenes:
        ns_dir = os.path.join(args.nerfstudio, name, "splatfacto")
        cm_dir = os.path.join(args.colmap, name)
        out_path = os.path.join(args.out, f"{name}.npz")
        if os.path.exists(out_path):
            continue
        try:
            convert_scene_to_npz(
                ns_dir, cm_dir, out_path,
                load_pose_src=args.load_pose_src,
                max_gs_num=args.max_gs_num,
                remove_outlier_ndevs=args.remove_outlier_ndevs)
            print("converted", name)
        except Exception as e:
            print("FAILED", name, e)


if __name__ == "__main__":
    main()
