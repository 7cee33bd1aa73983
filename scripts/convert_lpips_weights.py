"""Convert the `lpips` pip package's VGG16 LPIPS weights to the npz layout
read by splatformer_tpu.models.lpips.load_lpips_params.

Run on any machine with internet access and `pip install lpips torchvision`:

    python scripts/convert_lpips_weights.py --out weights/lpips_vgg.npz

Key layout: `vgg/conv{stage}_{idx}/kernel` (HWIO), `vgg/conv{stage}_{idx}/bias`,
`lin{0..4}` (the non-negative 1x1 LPIPS head weights, squeezed to (C,)).
This environment is zero-egress, so the conversion cannot run here; the
training/eval stack degrades gracefully (L1-only loss, LPIPS column omitted)
when the npz is absent.
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/lpips_vgg.npz")
    args = ap.parse_args()

    import lpips  # type: ignore
    import torch

    net = lpips.LPIPS(net="vgg", verbose=False)
    out = {}
    # torchvision VGG16 features: conv indices per stage
    conv_ids = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]
    vgg_layers = net.net.slice1, net.net.slice2, net.net.slice3, net.net.slice4, net.net.slice5
    flat = {}
    for slc in vgg_layers:
        for name, mod in slc.named_children():
            if isinstance(mod, torch.nn.Conv2d):
                flat[int(name)] = mod
    for si, ids in enumerate(conv_ids):
        for ci, tid in enumerate(ids):
            conv = flat[tid]
            # torch OIHW -> flax HWIO
            out[f"vgg/conv{si}_{ci}/kernel"] = (
                conv.weight.detach().numpy().transpose(2, 3, 1, 0))
            out[f"vgg/conv{si}_{ci}/bias"] = conv.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}"] = np.abs(w).reshape(-1)
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
