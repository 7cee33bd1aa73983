"""Stage-by-stage oracle check of the FPS downsampling path (VERDICT r4
item 2: repo fps loses 4.4 dB at 10% reduction where the reference family
loses ~0.5 dB at 80%).

Each stage of ops/downsample.fps_knn_downsample is compared against a dense
numpy oracle implementing the reference semantics
(/root/reference/models/pcd_downsampling_methods.py:8-83):
  1. furthest_point_sampling selection indices
  2. nearest-centroid assignment
  3. cluster-mean coords/features
  4. map-back gather
Then the model-level check: FeaturePredictor base vs fps at keep~=1.0 must
produce near-identical backbone outputs.

Run: python tools/diag_fps.py            (CPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from splatformer_tpu.ops import downsample as ds


def fps_oracle(xyz, m, start):
    n = xyz.shape[0]
    centroids = np.zeros(m, np.int64)
    dist = np.full(n, 1e10)
    farthest = start
    for i in range(m):
        centroids[i] = farthest
        d = np.sum((xyz - xyz[farthest]) ** 2, axis=1)
        dist = np.minimum(dist, d)
        farthest = int(np.argmax(dist))
    return centroids


def main():
    rng = np.random.default_rng(0)
    n, n_valid = 2048, 2000
    coord = rng.uniform(size=(n, 3)).astype(np.float32)
    coord[n_valid:] = 0.0
    feat = rng.normal(size=(n, 8)).astype(np.float32)
    feat[n_valid:] = 0.0
    mask = np.arange(n) < n_valid

    for ratio in (0.9, 0.5, 0.1):
        m_req = max(1, int(n * ratio))
        print(f"--- ratio {ratio} (m_req {m_req}) ---")
        # stage 1: selection
        sel = np.asarray(ds.furthest_point_sampling(
            jnp.asarray(coord), jnp.asarray(mask), m_req))
        start = int(np.argmax(mask))
        sel_o = fps_oracle(coord[:n_valid], min(m_req, n_valid), start)
        nsel = min(m_req, n_valid)
        match = np.mean(sel[:nsel] == sel_o[:nsel])
        print(f"  selection match vs oracle: {match:.4f} "
              f"(first mismatch at {np.argmin(sel[:nsel] == sel_o[:nsel]) if match < 1 else -1})")
        uniq = len(np.unique(sel[:nsel]))
        print(f"  unique selected: {uniq}/{nsel}; "
              f"any masked selected: {np.any(sel[:nsel] >= n_valid)}")

        # stages 2-4 through the public op
        c_coord, c_feat, c_mask, assign = jax.jit(
            lambda c, f, mk: ds.fps_knn_downsample(c, f, mk, ratio)
        )(jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask))
        c_coord, c_feat, c_mask, assign = map(
            np.asarray, (c_coord, c_feat, c_mask, assign))
        mv = int(c_mask.sum())
        print(f"  ds valid: {mv} (expected ~{nsel})")

        # assignment check: each valid point's assigned centroid must be its
        # nearest among the SELECTED ORIGINAL centroid coords (reference
        # assigns against coord[centroid_idx], pcd_downsampling_methods:49)
        cents = coord[sel[:nsel]]
        d2 = ((coord[:n_valid, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign_o = np.argmin(d2, axis=1)
        agree = np.mean(assign[:n_valid] == assign_o)
        print(f"  assignment agreement vs oracle: {agree:.4f}")

        # oracle cluster means on our OWN assignment (isolates aggregation)
        cm = _cluster_means(coord[:n_valid],
                            assign[:n_valid].clip(0, mv - 1), mv)
        fm = _cluster_means(feat[:n_valid],
                            assign[:n_valid].clip(0, mv - 1), mv)
        print(f"  cluster-mean coord max err: "
              f"{np.abs(c_coord[:mv] - cm).max():.2e}  "
              f"feat max err: {np.abs(c_feat[:mv] - fm).max():.2e}")

        # map-back via the dispatch's up()
        _, _, _, up = ds.downsample_dispatch(
            "fps", {"downsample_ratio": ratio},
            jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask))
        y = rng.normal(size=(c_coord.shape[0], 4)).astype(np.float32)
        back = np.asarray(up(jnp.asarray(y)))
        back_o = y[assign[:n_valid].clip(0, c_coord.shape[0] - 1)]
        print(f"  map-back max err (valid rows): "
              f"{np.abs(back[:n_valid] - back_o).max():.2e}")


def _cluster_means(x, assign, m):
    out = np.zeros((m, x.shape[1]), x.dtype)
    cnt = np.zeros(m)
    np.add.at(out, assign, x)
    np.add.at(cnt, assign, 1.0)
    return out / np.maximum(cnt, 1.0)[:, None]


if __name__ == "__main__":
    main()
