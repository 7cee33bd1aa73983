"""File/console logging + eval.csv results (reference ProcessSafeLogger,
utils/log_utils.py, and log_result, train.py:358-379)."""
from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax


def get_logger(log_path: Optional[str] = None, name: str = "splatformer"
               ) -> logging.Logger:
    """Process-0-only file+console logger."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    if jax.process_index() == 0:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_path:
            os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
            fh = logging.FileHandler(log_path)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger


def log_result_csv(csv_path: str, test_dataset: str, metrics: Dict[str, float],
                   algo: str = "base", r: float = 0.0,
                   max_mem: float = 0.0) -> None:
    """Append an eval.csv row with the reference's schema
    'dataset,psnr,ssim,lpips,algo,r,max mem'."""
    if jax.process_index() != 0:
        return
    new = not os.path.exists(csv_path)
    with open(csv_path, "a") as f:
        if new:
            f.write("dataset,psnr,ssim,lpips,algo,r,max mem\n")
        lp = metrics.get("lpips", float("nan"))
        f.write(f"{test_dataset},{metrics.get('psnr')},{metrics.get('ssim')},"
                f"{lp},{algo},{r},{max_mem}\n")


def device_peak_memory_mb() -> float:
    """Peak device memory in MB (reference measure_gpu_memory analog,
    train.py:26-43) — TPU memory_stats when available."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / 2**20
    except Exception:
        pass
    return 0.0


def make_grid(imgs, nrow: int = 3, ncols: int = 3):
    """uint8 image grid (reference make_grid, train.py:56-67)."""
    import numpy as np
    img_h, img_w = imgs[0].shape[:2]
    ch = (imgs[0].shape[2],) if imgs[0].ndim == 3 else ()
    grid = np.zeros((img_h * nrow, img_w * ncols) + ch, dtype=np.uint8)
    for i in range(nrow):
        for j in range(ncols):
            if i * ncols + j >= len(imgs):
                break
            grid[i * img_h:(i + 1) * img_h,
                 j * img_w:(j + 1) * img_w] = imgs[i * ncols + j]
    return grid


def save_image(path: str, img_uint8) -> None:
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(img_uint8).save(path)
