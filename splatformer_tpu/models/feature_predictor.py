"""FeaturePredictor — Gaussian-attribute refinement heads over a point backbone.

Semantics match /root/reference/models/feature_predictor.py:24-245:

  * input feature = concat of the six per-Gaussian attributes in the
    configured order (features_rest flattened), (N, C_in);
  * backbone (PTv3 or SpUNet) over coords = normalized means, grid
    voxelization at grid_resolution;
  * optional concat of the raw input features onto the backbone output
    (input_feat_to_mlp);
  * one `output_head_nlayer`-layer ReLU MLP head per output attribute,
    final layer zero-initialized (so step 0 is an identity refinement);
  * residual outputs: out[attr] = in[attr] + act(head(y)) with Tanh on means
    and Identity elsewhere ('res' mode), or direct prediction with the
    -relu()+log(max_scale) clamp on scales ('dc' mode);
  * non-predicted attributes copied through.

TPU redesign: one scene per device slot, static N with mask; the reference's
Python batchify/unbatchify loop disappears (vmap/sharding handles batching).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from splatformer_tpu.models.point import make_point_batch
from splatformer_tpu.models.ptv3 import PointTransformerV3
from splatformer_tpu.models.spunet import SpUNet
from splatformer_tpu.ops.types import GaussianScene

ALL_FEATURES = ("means", "features_dc", "features_rest", "opacities",
                "scales", "quats")


def feature_channels(sh_degree: int) -> Dict[str, int]:
    return {
        "means": 3,
        "features_dc": 3,
        "features_rest": ((sh_degree + 1) ** 2 - 1) * 3,
        "opacities": 1,
        "scales": 3,
        "quats": 4,
    }


_ACTIVATIONS: Dict[str, Callable] = {
    "tanh": jnp.tanh,
    "identity": lambda x: x,
    "sigmoid": jax.nn.sigmoid,
}


class OutputHead(nn.Module):
    """mlp-relu head: (nlayer-1) x [Dense(width) + ReLU] + Dense(out),
    final layer zero-init when zeroinit (feature_predictor.py:74-94)."""

    out_dim: int
    nlayer: int
    width: int
    zeroinit: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for _ in range(self.nlayer - 1):
            x = nn.Dense(self.width)(x)
            x = nn.relu(x)
        final_init = (nn.initializers.zeros if self.zeroinit
                      else nn.initializers.lecun_normal())
        x = nn.Dense(self.out_dim, kernel_init=final_init,
                     bias_init=nn.initializers.zeros)(x)
        return x


class FeaturePredictor(nn.Module):
    backbone_type: str = "PT"
    sh_degree: int = 1
    input_features: Sequence[str] = ALL_FEATURES
    output_features: Sequence[str] = ALL_FEATURES
    input_feat_to_mlp: bool = True
    output_head_nlayer: int = 4
    output_head_width: int = 128
    output_features_type: str = "res"  # 'res' | 'dc'
    res_feature_activation: Optional[Dict[str, str]] = None  # name -> act
    max_scale_normalized: float = 1e-2
    grid_resolution: int = 384
    zeroinit: bool = True
    bn_axis_name: Optional[str] = None
    additional_info: Optional[Dict[str, Any]] = None
    backbone_kwargs: Optional[Dict[str, Any]] = None
    # "bfloat16" = mixed-precision block compute while training (TPU
    # equivalent of the reference's AMP, configs/train/default.gin:11);
    # params, norm statistics, heads, and eval stay f32
    compute_dtype: Optional[str] = None

    def _activation(self, feature: str) -> Callable:
        acts = self.res_feature_activation or {"means": "tanh"}
        return _ACTIVATIONS[acts.get(feature, "identity").lower()]

    @nn.compact
    def __call__(self, scene: GaussianScene, train: bool = False
                 ) -> Tuple[GaussianScene, Dict[str, Any]]:
        ch = feature_channels(self.sh_degree)
        mask = scene.valid_mask()

        feats = []
        for key in self.input_features:
            a = getattr(scene, key)
            if key == "features_rest":
                a = a.reshape(a.shape[0], -1)
            feats.append(a)
        feat = jnp.concatenate(feats, axis=1)
        feat = jnp.where(mask[:, None], feat, 0.0)

        info = self.additional_info or {}
        downsample = info.get("downsample")
        coord = scene.means
        # the MLP-head concat below uses the ORIGINAL per-point features:
        # with input downsampling active, `feat` is rebound to the reduced
        # set while `up(y)` maps logits back to all N points
        # (reference feature_predictor.py:190-202 semantics)
        feat_full = feat
        if downsample:
            from splatformer_tpu.ops import downsample as ds
            coord, feat, mask_ds, up = ds.downsample_dispatch(
                downsample, info, coord, feat, mask,
                rng=self.make_rng("downsample") if downsample == "random" and train
                else None)
        else:
            mask_ds, up = mask, None

        shuffle_rng = (self.make_rng("orders")
                       if train and self.backbone_type == "PT" else None)
        pb = make_point_batch(coord, feat, mask_ds,
                              grid_resolution=self.grid_resolution,
                              shuffle_rng=shuffle_rng)

        if self.backbone_type == "PT":
            bk = dict(self.backbone_kwargs or {})
            bk.setdefault("compute_dtype", self.compute_dtype)
            y, diagnostics = PointTransformerV3(
                in_channels=feat.shape[-1], bn_axis_name=self.bn_axis_name,
                additional_info=self.additional_info, name="backbone",
                **bk)(pb, train)
        elif self.backbone_type == "SP":
            bk = dict(self.backbone_kwargs or {})
            y, diagnostics = SpUNet(
                in_channels=feat.shape[-1], bn_axis_name=self.bn_axis_name,
                name="backbone", **bk)(pb, train)
        else:
            raise NotImplementedError(self.backbone_type)

        if up is not None:
            y = up(y)  # map reduced logits back to the original points

        if self.input_feat_to_mlp:
            y = jnp.concatenate([y, feat_full], axis=1)

        out = {}
        for feature in self.output_features:
            o = OutputHead(out_dim=ch[feature], nlayer=self.output_head_nlayer,
                           width=self.output_head_width, zeroinit=self.zeroinit,
                           name=f"head_{feature}")(y)
            if self.output_features_type == "dc":
                if feature == "scales" and self.max_scale_normalized > 0:
                    o = -nn.relu(o) + jnp.log(self.max_scale_normalized)
                if feature == "features_rest":
                    o = o.reshape(o.shape[0], -1, 3)
                out[feature] = o
            elif self.output_features_type == "res":
                o = self._activation(feature)(o)
                if feature == "features_rest":
                    o = o.reshape(o.shape[0], -1, 3)
                out[feature] = getattr(scene, feature) + o
            else:
                raise NotImplementedError(self.output_features_type)

        refined = {}
        for key in ALL_FEATURES:
            if self.sh_degree == 0 and key == "features_rest":
                refined[key] = scene.features_rest
                continue
            if key in out:
                refined[key] = jnp.where(
                    mask.reshape((-1,) + (1,) * (out[key].ndim - 1)),
                    out[key], getattr(scene, key))
            else:
                refined[key] = getattr(scene, key)  # copy-through

        return scene.replace(**refined), diagnostics
