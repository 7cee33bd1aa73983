"""Per-head attention replay for the visualizer — the TPU equivalent of the
reference's forward-hook path (/root/reference/visualize.py:132-247).

The reference registers hooks on every SerializedAttention module and
re-executes the attention body twice (with and without merging), capturing
per-head merged/original attention features, merged-token coordinates, and
random merge-group colorings traced back to the original points. Here the
same replay runs from sown intermediates (`attn_in`, `attn_order`,
`attn_inverse`, `attn_coord` in models/ptv3.py): the module's own qkv params
re-execute the exact computation, head by head.

`trace_back` (reference configs/model/*.gin, declared but submodule-absent):
gates whether merge-group colorings are traced back through
unmerge -> serialized inverse to the block's ORIGINAL point order (True), or
reported on the merged tokens only (False, the reference default).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from splatformer_tpu.ops import merging


def collect_attention_blocks(model, variables, scene) -> Dict[str, Dict]:
    """Forward once with intermediates; returns {block_path: {attn_in, order,
    inverse, coord, attn_feat, qkv_kernel, qkv_bias}}."""
    _, state = model.apply(variables, scene, False, mutable=["intermediates"])
    inter = jax.device_get(state["intermediates"])

    blocks: Dict[str, Dict] = {}

    def walk(node, prefix=""):
        if not isinstance(node, dict):
            return
        keys = set(node.keys())
        if "attn_in" in keys:
            blocks[prefix.rstrip("/")] = {
                k: np.asarray(node[k][0]) for k in
                ("attn_in", "attn_order", "attn_inverse", "attn_coord",
                 "attn_feat")}
            return
        for k, v in node.items():
            walk(v, prefix + k + "/")

    walk(inter)

    # attach the module's qkv params (path mirrors the intermediates path)
    params = variables["params"]
    for path, rec in blocks.items():
        node = params
        for part in path.split("/"):
            node = node[part]
        rec["qkv_kernel"] = np.asarray(node["qkv"]["kernel"])
        rec["qkv_bias"] = np.asarray(node["qkv"].get("bias", 0.0))
    return blocks


def head_count_for(path: str, backbone_kwargs: Dict[str, Any]) -> int:
    """enc{s}_block{i} / dec{s}_block{i} -> configured head count."""
    name = path.split("/")[-2] if path.endswith("attn") else path.split("/")[-1]
    for part in path.split("/"):
        if part.startswith("enc") and "_block" in part:
            s = int(part[3:part.index("_")])
            return int(backbone_kwargs["enc_num_head"][s])
        if part.startswith("dec") and "_block" in part:
            s = int(part[3:part.index("_")])
            return int(backbone_kwargs["dec_num_head"][s])
    raise ValueError(f"cannot infer head count from {name!r} ({path})")


def replay_block(rec: Dict[str, np.ndarray], num_heads: int, patch_size: int,
                 additional_info: Optional[Dict[str, Any]] = None,
                 rng: Optional[np.random.Generator] = None) -> Dict[str, Any]:
    """Re-execute one block's serialized attention per head, with and without
    merging (reference hook body, visualize.py:144-198).

    Returns per-head lists in the block's original point order:
      attn_feats[h]      (N, ch) merged-path attention features
      ori_attn_feats[h]  (N, ch) base-path attention features
      merged_coords[h]   (N, 3)  token coords after merging, traced back
      merged_colors[h]   (N, 3)  random merge-group colorings (None unless
                                 merging ran and trace_back handling applies)
    plus 'size' (B, H, K', 1) and scalars n_tokens / n_effective_tokens.
    """
    rng = rng or np.random.default_rng(0)
    info = dict(additional_info or {})
    feat = jnp.asarray(rec["attn_in"])
    order = np.asarray(rec["attn_order"])
    inverse = np.asarray(rec["attn_inverse"])
    n, c = feat.shape
    k = patch_size
    h = num_heads
    ch = c // h
    scale = ch ** -0.5

    qkv = feat @ rec["qkv_kernel"] + rec["qkv_bias"]
    qkv = qkv[order].reshape(n // k, k, 3, h, ch).transpose(2, 0, 3, 1, 4)
    ori_q, ori_k, ori_v = qkv[0], qkv[1], qkv[2]
    coords = jnp.asarray(rec["attn_coord"])[order].reshape(n // k, 1, k, 3)
    coords = jnp.broadcast_to(coords, (n // k, h, k, 3))

    def attend(q, kk, v, size=None):
        logits = jnp.einsum("bhqc,bhkc->bhqk", q * scale, kk)
        if size is not None:  # proportional attention, key axis
            logits = logits + jnp.log(jnp.maximum(size[..., 0], 1e-30)
                                      )[..., None, :]
        a = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkc->bhqc", a, v)

    ori_feat = attend(ori_q, ori_k, ori_v)

    mode = info.get("tome", "base")
    r = float(info.get("r", 0.0) or 0.0)
    do_merge = (mode in merging.MERGE_MODES and r > 0.0
                and info.get("tome_attention", True))
    out: Dict[str, Any] = {"n_tokens": n}
    if do_merge:
        merge, unmerge, size = merging.build_merge(mode, ori_k, info)
        q, kk, v = merge(ori_q), merge(ori_k), merge(ori_v)
        m_feat = attend(q, kk, v, size)
        m_coords = merge(coords)  # same partition (visualize.py:163-166)
        kp = v.shape[-2]
        # random color per merged token marks the merge groups
        colors = jnp.asarray(rng.uniform(size=(n // k, h, kp, 3)),
                             jnp.float32)
        m_feat_full = unmerge(m_feat)
        out["size"] = np.asarray(size)
        out["n_effective_tokens"] = int(np.sum(np.asarray(size) > 0)
                                        / max(h, 1))
    else:
        m_feat_full = ori_feat
        colors = None
        m_coords = coords
        unmerge = None
        out["size"] = None
        out["n_effective_tokens"] = n

    def per_head(x):
        if x is None:
            return None
        return [np.asarray(x[:, i].reshape(-1, x.shape[-1]))[inverse]
                for i in range(h)]

    out["attn_feats"] = per_head(m_feat_full)
    out["ori_attn_feats"] = per_head(ori_feat)
    if info.get("trace_back", False) and unmerge is not None:
        # trace merge groups back to the block's original point order:
        # unmerge broadcasts each merged token's color/centroid to every
        # constituent, the serialized inverse restores input order
        out["merged_colors"] = per_head(unmerge(colors))
        out["merged_coords"] = per_head(unmerge(m_coords))
    else:
        # reference default: report the merged tokens themselves
        out["merged_colors"] = (None if colors is None else
                                [np.asarray(colors[:, i].reshape(-1, 3))
                                 for i in range(h)])
        out["merged_coords"] = [np.asarray(
            m_coords[:, i].reshape(-1, 3)) for i in range(h)]
    return out


def replay_model(model, variables, scene, backbone_kwargs: Dict[str, Any],
                 patch_size: int,
                 additional_info: Optional[Dict[str, Any]] = None,
                 blocks: Optional[List[str]] = None,
                 seed: int = 0) -> Dict[str, Dict[str, Any]]:
    """Replay every (or the selected) attention block per head."""
    recs = collect_attention_blocks(model, variables, scene)
    rng = np.random.default_rng(seed)
    out = {}
    for path, rec in recs.items():
        if blocks is not None and not any(b in path for b in blocks):
            continue
        heads = head_count_for(path, backbone_kwargs)
        res = replay_block(rec, heads, patch_size, additional_info, rng)
        res["coord"] = rec["attn_coord"]
        out[path] = res
    return out
