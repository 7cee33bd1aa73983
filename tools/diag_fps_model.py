"""Model-level FPS diagnostic: FeaturePredictor base vs fps at keep~=1.0
must be near-identical (every cluster a singleton -> same cloud). Any large
divergence localizes VERDICT r4's anomalous fps eval rows to the model
integration rather than the downsample op (tools/diag_fps.py cleared the op
against a dense oracle).

Run: python tools/diag_fps.py            (CPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from splatformer_tpu.configs import build_full_config
from splatformer_tpu.data.synthetic import random_scene
from splatformer_tpu.training.loop import build_feature_predictor


def run(model, variables, scene):
    out, _ = model.apply(variables, scene, False)
    return out


def main():
    rng = np.random.default_rng(0)
    n, n_valid = 2048, 2000
    scene = random_scene(rng, n, sh_degree=1, n_valid=n_valid)

    base_cfg = build_full_config("ptv3_base", "synthetic", "default", []).model
    base_cfg.zeroinit = False   # zero-init heads would make out == scene
    base = build_feature_predictor(base_cfg)
    variables = base.init(jax.random.key(0), scene, False)

    out_b = run(base, variables, scene)

    for algo in ("fps", "drop"):
        for ratio in (0.999, 0.97, 0.9, 0.5):
            cfg = build_full_config(f"ptv3_{algo}", "synthetic", "default",
                                    []).model
            cfg.additional_info.downsample_ratio = ratio
            m = build_feature_predictor(cfg)
            out_f = run(m, variables, scene)
            print(f"--- {algo} keep={ratio} vs base ---")
            for k in ("means", "opacities"):
                a = np.asarray(getattr(out_b, k))[:n_valid]
                b = np.asarray(getattr(out_f, k))[:n_valid]
                d = np.abs(a - b)
                res = np.abs(a - np.asarray(getattr(scene, k))[:n_valid])
                sc = res.max() + 1e-12
                print(f"  {k:14s} max|d|={d.max():.3e} mean|d|={d.mean():.3e}"
                      f"  vs residual max={sc:.3e} mean={res.mean():.3e}")


if __name__ == "__main__":
    main()
