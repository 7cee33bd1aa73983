"""Point Transformer V3 backbone — flax, static shapes, TPU-first.

Functional re-design of the Pointcept PTv3 consumed by the reference
(/root/reference/models/pointtransformer_v3.py; internals contract in
SURVEY.md §2.4):

  * serialization: four SFC orders precomputed once per forward
    (ops/serialization.py), shuffled when training;
  * Block = xCPE (sparse conv, shared neighbor map per stage) -> LN ->
    SerializedAttention -> droppath residual -> LN -> MLP -> droppath residual;
  * SerializedAttention: gather by (padded) serialized order, reshape to
    (patches, K, C), batched MHA on the MXU, scatter back; the fork's token
    merging family hooks in between qkv and softmax (ops/merging.py);
  * SerializedPooling/Unpooling: cluster by right-shifted SFC codes,
    segment-max reduce, broadcast back through the cluster map.

Static-shape discipline: each stage has a static point capacity (a multiple
of the patch size); cluster counts are dynamic but bounded by the capacity,
with overflow clusters dropped into a waste bucket (counted, and impossible
for real scenes at the default capacity factors).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from splatformer_tpu.models.layers import DropPath, MaskedBatchNorm, Mlp
from splatformer_tpu.models.point import PointBatch
from splatformer_tpu.ops.segment_ops import (pad_order_for_patches,
                                             segment_max, segment_mean,
                                             segment_sum)
from splatformer_tpu.ops.serialization import INVALID_CODE
from splatformer_tpu.ops.sparse_conv import build_neighbor_map, sparse_conv_apply

_INT32_MAX = 2**31 - 1


class SerializedAttention(nn.Module):
    """Windowed attention over fixed-size patches of the serialized order."""

    channels: int
    num_heads: int
    patch_size: int
    order_index: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    additional_info: Optional[Dict[str, Any]] = None
    dtype: Optional[jnp.dtype] = None
    # flash-attention control (reference enable_flash,
    # models/pointtransformer_v3.py:121-126): None = auto (TPU backend and
    # patch >= 256), True = force the Pallas kernel, False = einsum always
    use_flash: Optional[bool] = None

    @nn.compact
    def __call__(self, feat: jnp.ndarray, pb: PointBatch,
                 train: bool) -> jnp.ndarray:
        n, c = feat.shape
        k = self.patch_size
        h = self.num_heads
        ch = c // h
        assert n % k == 0, (n, k)
        scale = self.qk_scale or ch ** -0.5

        order = pad_order_for_patches(
            pb.order_perm[self.order_index], pb.n_valid, k)
        inverse = pb.inverse_perm[self.order_index]

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv",
                       dtype=self.dtype)(feat)
        # (N, 3C) -> (B, K, 3, H, ch) -> (3, B, H, K, ch)
        qkv = qkv[order].reshape(n // k, k, 3, h, ch).transpose(2, 0, 3, 1, 4)
        q, kk, v = qkv[0], qkv[1], qkv[2]

        info = self.additional_info or {}
        merge_mode = info.get("tome", "base")
        merge_r = float(info.get("r", 0.0) or 0.0)
        size_bias = None
        unmerge = None
        # tome_attention (reference configs/model/*.gin): merging applies
        # inside the attention module; when False the attention runs on the
        # full K tokens (merging then only affects the MLP via tome_mlp)
        if (merge_mode not in ("base", None, "none") and merge_r > 0.0
                and info.get("tome_attention", True)):
            from splatformer_tpu.ops import merging
            q, kk, v, size, unmerge = merging.process_merging(
                merge_mode, q, kk, v, info,
                rng=self.make_rng("merging") if train and merging.needs_rng(
                    merge_mode, info) else None)
            # proportional attention over the KEY axis (ToMe eq. 2,
            # visualize.py:170-174): keys representing s merged tokens get
            # +log(s); size 0 (ALGM dead slots) masks the key out entirely
            size_bias = jnp.log(jnp.maximum(size[..., 0], 1e-30))[..., None, :]

        # Flash path (reference enable_flash: varlen flash-attn at patch 1024,
        # models/pointtransformer_v3.py:121-126): fixed-size patches make this
        # a plain batched attention, served by the bundled Pallas TPU flash
        # kernel. Proportional attention (merging size bias) needs the
        # explicit logits, so it uses the einsum path at the reduced K'.
        if self.use_flash is None:
            use_flash = (size_bias is None and q.shape[-2] >= 256
                         and jax.default_backend() == "tpu")
        else:
            use_flash = self.use_flash and size_bias is None
        if use_flash:
            from jax.experimental.pallas.ops.tpu import flash_attention as fa
            d = q.shape[-1]
            d_pad = max(128, ((d + 127) // 128) * 128)
            if d_pad != d:
                padw = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
                qf, kf, vf = (jnp.pad(t, padw) for t in (q, kk, v))
            else:
                qf, kf, vf = q, kk, v
            out = fa.flash_attention(qf, kf, vf, sm_scale=scale)[..., :d]
            out = out.astype(feat.dtype)
        else:
            attn = jnp.einsum("bhqc,bhkc->bhqk", q * scale, kk,
                              preferred_element_type=jnp.float32)
            if size_bias is not None:
                # visualize.py:170-174 — attn = attn + size.log()
                attn = attn + size_bias
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=-1).astype(feat.dtype)
            out = jnp.einsum("bhqk,bhkc->bhqc", attn, v,
                             preferred_element_type=jnp.float32).astype(feat.dtype)
        if unmerge is not None:
            out = unmerge(out)  # back to (B, H, K, ch)
        out = out.transpose(0, 2, 1, 3).reshape(n, c)
        out = out[inverse]
        # per-block attention features + replay inputs for the visualizer
        # (collected only when apply(..., mutable=['intermediates']) requests
        # them — zero cost in training/eval). attn_in/order/inverse let
        # utils/attn_replay.py re-execute this attention per head with and
        # without merging (reference hook, visualize.py:137-247).
        self.sow("intermediates", "attn_feat", out)
        self.sow("intermediates", "attn_in", feat)
        self.sow("intermediates", "attn_order", order)
        self.sow("intermediates", "attn_inverse", inverse)
        self.sow("intermediates", "attn_coord", pb.coord)
        out = nn.Dense(c, name="proj", dtype=self.dtype)(out)
        return out


class Block(nn.Module):
    """xCPE + pre-LN attention + pre-LN MLP with droppath residuals
    (body confirmed by the fork's hook re-implementation,
    /root/reference/calflops.py:44-84)."""

    channels: int
    num_heads: int
    patch_size: int
    order_index: int
    drop_path: float
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    bn_axis_name: Optional[str] = None
    turn_off_bn: bool = False
    additional_info: Optional[Dict[str, Any]] = None
    dtype: Optional[jnp.dtype] = None
    use_flash: Optional[bool] = None

    @nn.compact
    def __call__(self, pb: PointBatch, nbr: jnp.ndarray,
                 train: bool) -> PointBatch:
        c = self.channels
        # mixed precision only while training (the reference's AMP wraps the
        # train loss, not evaluation — train.py:214-218)
        dt = self.dtype if train else None
        feat = pb.feat
        if dt is not None:
            feat = feat.astype(dt)
        # xCPE: SubMConv3d(3^3, bias) -> Linear -> BN, residual
        w = self.param("cpe_conv_kernel",
                       nn.initializers.lecun_normal(), (27, c, c))
        b = self.param("cpe_conv_bias", nn.initializers.zeros, (c,))
        wc = w.astype(feat.dtype)
        # named so the remat policy can save it: the conv's 27-tap gather is
        # the costliest recompute in a block (see remat_blocks)
        h = checkpoint_name(sparse_conv_apply(feat, nbr, wc,
                                              b.astype(feat.dtype)),
                            "cpe_conv_out")
        h = nn.Dense(c, name="cpe_linear", dtype=dt)(h)
        h = MaskedBatchNorm(axis_name=self.bn_axis_name, off=self.turn_off_bn,
                            name="cpe_norm")(h, pb.mask, train)
        feat = feat + h

        shortcut = feat
        # LayerNorms stay f32 internally (flax promotes); output in compute
        # dtype via the dtype arg
        h = nn.LayerNorm(name="norm1", dtype=dt)(feat)
        h = SerializedAttention(
            channels=c, num_heads=self.num_heads, patch_size=self.patch_size,
            order_index=self.order_index, qkv_bias=self.qkv_bias,
            additional_info=self.additional_info, name="attn",
            dtype=dt, use_flash=self.use_flash,
        )(h, pb.replace(feat=h), train)
        h = checkpoint_name(h, "attn_out")
        h = DropPath(self.drop_path)(h, train)
        feat = shortcut + h

        shortcut = feat
        h = nn.LayerNorm(name="norm2", dtype=dt)(feat)
        info = self.additional_info or {}
        merge_mode = info.get("tome", "base")
        merge_r = float(info.get("r", 0.0) or 0.0)
        mlp = Mlp(hidden=int(c * self.mlp_ratio), out=c, name="mlp",
                  dtype=dt)
        if (info.get("tome_mlp") and merge_r > 0.0
                and merge_mode not in ("base", None, "none")):
            # fork's tome_mlp: run the block MLP on merged patch tokens
            # (SURVEY.md §2.4), reconstructed with an independent merge over
            # the serialized patches of the MLP input
            from splatformer_tpu.ops import merging as merging_ops
            k = self.patch_size
            n = h.shape[0]
            order = pad_order_for_patches(
                pb.order_perm[self.order_index], pb.n_valid, k)
            inverse = pb.inverse_perm[self.order_index]
            hseq = h[order].reshape(n // k, 1, k, c)
            _, _, vtok, _, unmerge = merging_ops.process_merging(
                merge_mode, hseq, hseq, hseq, info,
                rng=self.make_rng("merging") if train and
                merging_ops.needs_rng(merge_mode, info) else None)
            kp = vtok.shape[-2]
            m = mlp(vtok.reshape(-1, c)).reshape(n // k, 1, kp, c)
            h = unmerge(m).reshape(n, c)[inverse]
        else:
            h = mlp(h)
        h = DropPath(self.drop_path)(h, train)
        feat = shortcut + h
        return pb.replace(feat=feat.astype(pb.feat.dtype))


class SerializedPooling(nn.Module):
    """Grid pooling by right-shifted SFC codes (SURVEY.md §2.4).

    child_capacity is the static size of the pooled stage; cluster ids beyond
    it fall into a waste bucket (dropped). Returns the pooled PointBatch and
    the (cluster map, parent mask) needed by SerializedUnpooling.
    """

    out_channels: int
    stride: int
    child_capacity: int
    bn_axis_name: Optional[str] = None
    turn_off_bn: bool = False

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool
                 ) -> Tuple[PointBatch, jnp.ndarray]:
        n = pb.num_points
        m = self.child_capacity
        pooling_depth = max(0, int(math.ceil(math.log2(self.stride))))
        shift = pooling_depth * 3

        sorted_idx = pb.order_perm[0]                    # (N,) first order
        sorted_codes = pb.codes[0][sorted_idx]
        pos = jnp.arange(n, dtype=jnp.int32)
        valid_sorted = pos < pb.n_valid
        shifted = jnp.where(valid_sorted, sorted_codes >> shift, _INT32_MAX)
        prev = jnp.concatenate([jnp.array([-1], jnp.int32), shifted[:-1]])
        is_head = valid_sorted & (shifted != prev)
        cid_sorted = jnp.cumsum(is_head.astype(jnp.int32)) - 1
        n_clusters = jnp.sum(is_head.astype(jnp.int32))
        # overflow & invalid -> waste bucket m
        cid_sorted = jnp.where(valid_sorted & (cid_sorted < m), cid_sorted, m)
        cluster = jnp.zeros((n,), jnp.int32).at[sorted_idx].set(cid_sorted)

        pf = nn.Dense(self.out_channels, name="proj")(pb.feat)
        child_feat = segment_max(pf, cluster, m + 1)[:m]
        child_coord = segment_mean(pb.coord, cluster, m + 1)[:m]

        # head point of each cluster carries grid_coord and codes
        head_target = jnp.where(is_head & (cid_sorted < m), cid_sorted, m)
        head_point = (jnp.zeros((m + 1,), jnp.int32)
                      .at[head_target].set(sorted_idx, mode="drop")[:m])
        child_grid = pb.grid_coord[head_point] >> pooling_depth
        child_codes = pb.codes[:, head_point] >> shift

        child_n_valid = jnp.minimum(n_clusters, m)
        child_mask = jnp.arange(m, dtype=jnp.int32) < child_n_valid
        child_codes = jnp.where(child_mask[None, :], child_codes, INVALID_CODE)

        iota = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32),
                                child_codes.shape)
        _, child_order = jax.lax.sort((child_codes, iota), dimension=-1,
                                      num_keys=1, is_stable=True)
        child_inverse = jax.vmap(
            lambda op: jnp.zeros((m,), jnp.int32).at[op].set(
                jnp.arange(m, dtype=jnp.int32)))(child_order)

        child_feat = MaskedBatchNorm(
            axis_name=self.bn_axis_name, off=self.turn_off_bn,
            name="norm")(child_feat, child_mask, train)
        child_feat = nn.gelu(child_feat)

        child = PointBatch(
            coord=child_coord, grid_coord=child_grid, feat=child_feat,
            mask=child_mask, n_valid=child_n_valid, codes=child_codes,
            order_perm=child_order, inverse_perm=child_inverse)
        return child, cluster


class SerializedUnpooling(nn.Module):
    """Broadcast pooled features back through the cluster map and add the
    projected skip (reference SerializedUnpooling semantics)."""

    out_channels: int
    bn_axis_name: Optional[str] = None
    turn_off_bn: bool = False

    @nn.compact
    def __call__(self, child: PointBatch, parent: PointBatch,
                 cluster: jnp.ndarray, train: bool) -> PointBatch:
        h = nn.Dense(self.out_channels, name="proj")(child.feat)
        h = MaskedBatchNorm(axis_name=self.bn_axis_name, off=self.turn_off_bn,
                            name="proj_norm")(h, child.mask, train)
        h = nn.gelu(h)
        skip = nn.Dense(self.out_channels, name="proj_skip")(parent.feat)
        skip = MaskedBatchNorm(axis_name=self.bn_axis_name,
                               off=self.turn_off_bn,
                               name="proj_skip_norm")(skip, parent.mask, train)
        skip = nn.gelu(skip)
        # waste-bucket / dropped clusters contribute zero
        safe = jnp.clip(cluster, 0, child.feat.shape[0] - 1)
        up = h[safe]
        up = jnp.where((cluster < child.feat.shape[0])[:, None]
                       & parent.mask[:, None], up, 0.0)
        return parent.replace(feat=skip + up)


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


class PointTransformerV3(nn.Module):
    """The full U-Net backbone.

    Defaults mirror the instantiation at
    /root/reference/models/pointtransformer_v3.py:100-161 +
    configs/model/ptv3_base.gin (enc_dim 64, output_dim 96, stride (1,2,2,2),
    MLP embedding, patch 128, 4 orders, drop_path 0.3).
    """

    in_channels: int
    enc_depths: Sequence[int] = (2, 2, 2, 6, 2)
    enc_channels: Sequence[int] = (64, 96, 128, 256, 512)
    enc_num_head: Sequence[int] = (2, 4, 8, 16, 32)
    enc_patch_size: Sequence[int] = (128, 128, 128, 128, 128)
    dec_depths: Sequence[int] = (2, 2, 2, 2)
    dec_channels: Sequence[int] = (96, 96, 128, 256)
    dec_num_head: Sequence[int] = (4, 4, 8, 16)
    dec_patch_size: Sequence[int] = (128, 128, 128, 128)
    stride: Sequence[int] = (1, 2, 2, 2)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.3
    num_orders: int = 4
    # static capacity of each pooled stage relative to its parent stage
    pool_capacity_factors: Sequence[float] = (1.0, 0.75, 0.625, 0.5)
    bn_axis_name: Optional[str] = None
    # replace every BatchNorm with identity (reference escape hatch,
    # models/pointtransformer_v3.py:249-251)
    turn_off_bn: bool = False
    # flash-attention control threaded to every block (None = auto on TPU)
    use_flash: Optional[bool] = None
    # 'MLP' (Linear+BN+GELU, the reference's configured choice,
    # configs/model/ptv3_base.gin:32) or 'PT_embedding' (submanifold-conv
    # stem; the reference uses a 5^3 kernel, this build's conv is 3^3 —
    # documented deviation, models/pointtransformer_v3.py:266-278)
    embedding_type: str = "MLP"
    additional_info: Optional[Dict[str, Any]] = None
    # rematerialize each Block on the backward pass: within-block attention
    # temps (notably the (B, H, K, ch) qkv layouts, which TPU tiling pads
    # 8x for ch=16 heads) otherwise dominate peak HBM at 100k-point scale
    # (measured 23.9 GB > 15.75 GB chip HBM for one train step; rematted the
    # live set is one block at a time)
    remat_blocks: bool = True
    # compute dtype inside blocks (conv/attention/MLP matmuls + gathers);
    # params, norms statistics, the inter-block residual stream, and pooling
    # stay f32. bfloat16 is the TPU equivalent of the reference's AMP
    # training (/root/reference/train.py:214-218, configs/train/default.gin:11)
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False
                 ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        num_stages = len(self.enc_depths)
        assert num_stages == len(self.stride) + 1
        cdtype = (jnp.dtype(self.compute_dtype)
                  if self.compute_dtype not in (None, "float32") else None)
        # remat each block, but keep the conv and attention outputs (cheap
        # (N, C) rows) so the backward recompute skips the 27-tap conv
        # gathers and the full attention replay
        policy = jax.checkpoint_policies.save_only_these_names(
            "cpe_conv_out", "attn_out")
        block_cls = (nn.remat(Block, static_argnums=(3,), policy=policy)
                     if self.remat_blocks else Block)

        import numpy as _np
        enc_dp = [float(x) for x in _np.linspace(
            0, self.drop_path, sum(self.enc_depths))]
        dec_dp = [float(x) for x in _np.linspace(
            0, self.drop_path, sum(self.dec_depths))]

        # stage-0 conv structure, shared by a PT_embedding stem and the
        # stage-0 blocks (same grid_coord/mask)
        nbr0 = build_neighbor_map(pb.grid_coord, pb.mask)

        if self.embedding_type == "MLP":
            # MLP embedding: Linear -> BN -> GELU
            h = nn.Dense(self.enc_channels[0], name="embed_linear")(pb.feat)
        elif self.embedding_type == "PT_embedding":
            # conv stem: submanifold conv -> BN -> GELU
            c0 = self.enc_channels[0]
            w = self.param("embed_conv_kernel",
                           nn.initializers.lecun_normal(),
                           (27, pb.feat.shape[-1], c0))
            bb = self.param("embed_conv_bias", nn.initializers.zeros, (c0,))
            h = sparse_conv_apply(pb.feat, nbr0, w, bb)
        else:
            raise NotImplementedError(self.embedding_type)
        h = MaskedBatchNorm(axis_name=self.bn_axis_name, off=self.turn_off_bn,
                            name="embed_norm")(h, pb.mask, train)
        h = nn.gelu(h)
        pb = pb.replace(feat=h)

        # encoder
        skips = []      # per-stage PointBatch after blocks
        clusters = []   # per-transition cluster maps
        stage_nbrs = []  # per-stage conv structures, reused by the decoder
        diagnostics = {}
        for s in range(num_stages):
            if s > 0:
                patch_mult = max(self.enc_patch_size[s],
                                 self.dec_patch_size[min(s, len(self.dec_patch_size) - 1)])
                child_cap = _round_up(
                    max(patch_mult,
                        int(pb.num_points * self.pool_capacity_factors[s - 1])),
                    patch_mult)
                child_cap = min(child_cap, _round_up(pb.num_points, patch_mult))
                pb_child, cluster = SerializedPooling(
                    out_channels=self.enc_channels[s], stride=self.stride[s - 1],
                    child_capacity=child_cap, bn_axis_name=self.bn_axis_name,
                    turn_off_bn=self.turn_off_bn,
                    name=f"enc{s}_down")(pb, train)
                clusters.append(cluster)
                skips.append(pb)
                pb = pb_child
            nbr = (nbr0 if s == 0
                   else build_neighbor_map(pb.grid_coord, pb.mask))
            stage_nbrs.append(nbr)
            dp_slice = enc_dp[sum(self.enc_depths[:s]):sum(self.enc_depths[:s + 1])]
            for i in range(self.enc_depths[s]):
                pb = block_cls(
                    channels=self.enc_channels[s],
                    num_heads=self.enc_num_head[s],
                    patch_size=self.enc_patch_size[s],
                    order_index=i % self.num_orders,
                    drop_path=dp_slice[i],
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    bn_axis_name=self.bn_axis_name,
                    turn_off_bn=self.turn_off_bn,
                    additional_info=self.additional_info,
                    dtype=cdtype, use_flash=self.use_flash,
                    name=f"enc{s}_block{i}")(pb, nbr, train)
            diagnostics[f"enc{s}_n_valid"] = pb.n_valid

        # decoder
        intermediates = {}
        dec_channels = list(self.dec_channels) + [self.enc_channels[-1]]
        for s in reversed(range(num_stages - 1)):
            parent = skips[s]
            cluster = clusters[s]
            pb = SerializedUnpooling(
                out_channels=dec_channels[s], bn_axis_name=self.bn_axis_name,
                turn_off_bn=self.turn_off_bn,
                name=f"dec{s}_up")(pb, parent, cluster, train)
            # the unpooled point set IS the encoder stage-s point set — reuse
            # its conv structure instead of rebuilding (the sort-join is the
            # costliest non-matmul op in the backbone)
            nbr = stage_nbrs[s]
            dp_slice = dec_dp[sum(self.dec_depths[:s]):sum(self.dec_depths[:s + 1])]
            dp_slice = dp_slice[::-1]  # reference reverses per-stage
            for i in range(self.dec_depths[s]):
                pb = block_cls(
                    channels=dec_channels[s],
                    num_heads=self.dec_num_head[s],
                    patch_size=self.dec_patch_size[s],
                    order_index=i % self.num_orders,
                    drop_path=dp_slice[i],
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    bn_axis_name=self.bn_axis_name,
                    turn_off_bn=self.turn_off_bn,
                    additional_info=self.additional_info,
                    dtype=cdtype, use_flash=self.use_flash,
                    name=f"dec{s}_block{i}")(pb, nbr, train)
            intermediates[f"dec{s}"] = {
                "feat": pb.feat, "code": pb.codes[0], "n_valid": pb.n_valid}

        diagnostics["intermediates"] = intermediates
        return pb.feat, diagnostics
