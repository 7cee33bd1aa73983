"""FeaturePredictor under XLA auto-SPMD with the scene sharded over a
`gauss` mesh axis.

The explicit collective path for rendering lives in parallel/gauss_shard.py;
for the point backbone the TPU-idiomatic route is sharding annotations + the
XLA SPMD partitioner (scaling-book recipe: pick a mesh, annotate, let XLA
insert the collectives). This test pins the semantics: a gauss-sharded
forward must be numerically identical to the single-device forward.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from splatformer_tpu.data.synthetic import random_scene
from splatformer_tpu.models.feature_predictor import FeaturePredictor

TINY = dict(enc_depths=(1, 1, 1), enc_channels=(16, 16, 32),
            enc_num_head=(2, 2, 4), enc_patch_size=(16, 16, 16),
            dec_depths=(1, 1), dec_channels=(16, 16), dec_num_head=(2, 2),
            dec_patch_size=(16, 16), stride=(1, 2), drop_path=0.0,
            pool_capacity_factors=(1.0, 0.75))


def test_auto_spmd_forward_matches_single_device(rng):
    n = 4096
    scene = random_scene(rng, n, sh_degree=1)
    model = FeaturePredictor(
        backbone_type="PT", sh_degree=1, grid_resolution=64,
        res_feature_activation={"means": "tanh"}, backbone_kwargs=TINY)
    variables = model.init(jax.random.key(0), scene, False)

    ref, _ = jax.jit(lambda v, s: model.apply(v, s, False))(variables, scene)

    mesh = Mesh(np.asarray(jax.devices()), ("gauss",))
    scene_sh = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(
            mesh, P("gauss") if a.ndim >= 1 and a.shape[0] == n else P())),
        scene)
    out, _ = jax.jit(
        lambda v, s: model.apply(v, s, False),
        in_shardings=(NamedSharding(mesh, P()), None))(variables, scene_sh)

    for k in ("means", "scales", "quats", "opacities", "features_dc"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, k)), np.asarray(getattr(ref, k)),
            atol=1e-5, rtol=1e-5, err_msg=k)
