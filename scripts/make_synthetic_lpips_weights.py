"""Generate DETERMINISTIC synthetic LPIPS(VGG16) weights, or validate any
weights npz against the layout contract.

The reference trains with LPIPS weight 1.0 over a pretrained VGG16
(/root/reference/configs/train/default.gin:12, utils/loss_utils.py:1-13).
This environment is zero-egress (no torchvision / lpips pip package), so
pretrained weights cannot enter; this script builds a seeded random-feature
VGG16 instead — random convolutional features are a documented, serviceable
perceptual-distance proxy (the "deep features as a perceptual metric"
ablations in the LPIPS paper show untrained nets already correlate with
human judgments far better than L2). The lin head is calibrated so the
distance of a canonical noisy pair matches the scale of real LPIPS (~0.2),
keeping the reference's loss weight meaningful.

To use REAL weights: run scripts/convert_lpips_weights.py on any machine
with internet access and drop the npz at weights/lpips_vgg.npz — then check
it here with --check (layout/shape contract; works for real and synthetic
files alike):

    python scripts/make_synthetic_lpips_weights.py --out weights/lpips_vgg.npz
    python scripts/make_synthetic_lpips_weights.py --check weights/lpips_vgg.npz
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def expected_shapes():
    # single source of truth for the layout contract lives next to the model
    from splatformer_tpu.models.lpips import expected_weight_shapes
    return expected_weight_shapes()


def check(path: str) -> int:
    data = np.load(path)
    want = expected_shapes()
    bad = []
    for k, shape in want.items():
        if k not in data:
            bad.append(f"missing {k}")
        elif tuple(data[k].shape) != shape:
            bad.append(f"{k}: shape {tuple(data[k].shape)} != {shape}")
        elif not np.isfinite(data[k]).all():
            bad.append(f"{k}: non-finite values")
    for k in data.files:
        if k not in want:
            bad.append(f"unexpected key {k}")
    if any(np.abs(data[f"lin{i}"]).sum() == 0 for i in range(5)
           if f"lin{i}" in data):
        bad.append("all-zero lin head")
    if bad:
        print("CONTRACT VIOLATIONS:\n  " + "\n  ".join(bad))
        return 1
    print(f"{path}: OK ({len(data.files)} arrays, "
          f"{sum(data[k].size for k in data.files):,} parameters)")
    return 0


def generate(out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    arrays = {}
    in_ch = 3
    for si, (ch, n_convs) in enumerate(_VGG_STAGES):
        for ci in range(n_convs):
            fan_in = 3 * 3 * in_ch
            arrays[f"vgg/conv{si}_{ci}/kernel"] = rng.normal(
                0.0, np.sqrt(2.0 / fan_in), (3, 3, in_ch, ch)
            ).astype(np.float32)
            arrays[f"vgg/conv{si}_{ci}/bias"] = np.zeros(ch, np.float32)
            in_ch = ch
        arrays[f"lin{si}"] = np.full((ch,), 1.0 / ch, np.float32)

    # calibrate the lin head on a canonical pair so synthetic LPIPS sits at
    # the real metric's scale (~0.2 for 0.1-sigma noise) and the reference's
    # loss weight transfers
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from splatformer_tpu.models.lpips import load_lpips_params, LPIPS

    np.savez(out, **arrays)
    params = load_lpips_params(out)
    r = np.random.default_rng(0)
    img = jnp.asarray(r.uniform(size=(1, 64, 64, 3)), jnp.float32)
    noisy = jnp.clip(img + 0.1 * jnp.asarray(
        r.normal(size=(1, 64, 64, 3)), jnp.float32), 0, 1)
    d = float(LPIPS().apply({"params": params}, img, noisy)[0])
    gain = 0.2 / max(d, 1e-9)
    for i in range(5):
        arrays[f"lin{i}"] *= gain
    np.savez(out, **arrays)
    params = load_lpips_params(out)
    d2 = float(LPIPS().apply({"params": params}, img, noisy)[0])
    print(f"wrote {out} (seed {seed}): canonical-pair distance "
          f"{d:.4f} -> {d2:.4f} after calibration")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/lpips_vgg.npz")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--check", default="",
                    help="validate an existing npz instead of generating")
    args = ap.parse_args()
    if args.check:
        sys.exit(check(args.check))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    generate(args.out, args.seed)
    sys.exit(check(args.out))


if __name__ == "__main__":
    main()
