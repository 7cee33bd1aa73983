"""Image quality metrics: PSNR / SSIM / LPIPS + accumulation.

Formula parity with /root/reference/utils/metrics.py: PSNR over per-image MSE
(:89-91), SSIM with an 11x11 sigma-1.5 Gaussian window, zero 'same' padding,
C1=0.01^2, C2=0.03^2, averaged per image (:103-135). LPIPS comes from
models/lpips.py (VGG backbone; weights loaded from npz).
"""
from __future__ import annotations

import json
import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) pairs -> (N,) PSNR in dB (max value 1.0)."""
    mse = jnp.mean((img1 - img2) ** 2, axis=(1, 2, 3))
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-20)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    g = jnp.asarray([math.exp(-((x - size // 2) ** 2) / (2.0 * sigma ** 2))
                     for x in range(size)], jnp.float32)
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11
         ) -> jnp.ndarray:
    """(N, H, W, C) pairs -> (N,) mean SSIM. Matches the reference's conv2d
    implementation (zero padding, per-channel depthwise window)."""
    c = img1.shape[-1]
    win = _gaussian_window(window_size)[:, :, None, None]       # (K, K, 1, 1)
    win = jnp.tile(win, (1, 1, 1, c)).astype(img1.dtype)         # depthwise

    def conv(x):
        # Precision.HIGHEST: TPU convs otherwise default to bf16, and the
        # conv(x^2) - mu^2 variance estimate then suffers catastrophic
        # cancellation — denominators go negative by ~1e-2 (>> C2 = 9e-4)
        # and the SSIM map explodes (observed per-image SSIM of 7.14 on a
        # chip eval; PSNR, which has no matmul, stayed sane)
        return jax.lax.conv_general_dilated(
            x, win, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, precision=jax.lax.Precision.HIGHEST)

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = (((2 * mu1_mu2 + c1) * (2 * s12 + c2))
                / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)))
    return jnp.mean(ssim_map, axis=(1, 2, 3))


class MetricComputer:
    """Accumulates per-image metrics with per-scene result dicts
    (reference utils/metrics.py MetricComputer). Host-side numpy."""

    def __init__(self, lpips_fn=None):
        self.metrics = {"psnr": psnr, "ssim": ssim}
        if lpips_fn is not None:
            self.metrics["lpips"] = lpips_fn
        self.results: Dict[str, List[np.ndarray]] = {
            k: [] for k in self.metrics}
        self.results_dict: Dict[str, Dict[str, list]] = {}

    def update(self, pred: jnp.ndarray, gt: jnp.ndarray, name: str):
        if name not in self.results_dict:
            self.results_dict[name] = {}
        pred = pred.astype(jnp.float32)
        gt = gt.astype(jnp.float32)
        if float(pred.max()) > 1.0:
            pred = pred / 255.0
        if float(gt.max()) > 1.0:
            gt = gt / 255.0
        for metric, fn in self.metrics.items():
            vals = np.asarray(fn(pred, gt)).reshape(-1)
            self.results[metric].append(vals)
            self.results_dict[name][metric] = [float(v) for v in vals]

    def update_value(self, key: str, value: float, name: str):
        self.results.setdefault(key, []).append(np.asarray([value]))
        self.results_dict.setdefault(name, {})[key] = float(value)

    def sum(self) -> Dict[str, float]:
        return {m: float(np.concatenate(v).sum()) if v else 0.0
                for m, v in self.results.items()}

    def finalize(self) -> Dict[str, float]:
        return {m: float(np.concatenate(v).mean()) if v else float("nan")
                for m, v in self.results.items()}

    def write_to_file(self, path: str):
        with open(path, "w") as f:
            json.dump(self.results_dict, f, indent=4)
