"""FLOPs accounting — reference C18 (calflops.py fvcore hooks) + C24.

Two mechanisms:
  * `xla_cost_analysis(fn, *args)`: compiled-HLO cost analysis — the idiomatic
    XLA equivalent of fvcore operator counting, covering the whole program;
  * `attention_mlp_gflops(...)`: analytic per-Block attention+MLP FLOPs given
    the per-stage point counts of a forward pass (diagnostics from
    PointTransformerV3) and the merge config — this mirrors exactly what the
    reference's hooks count (qkv/attn matmuls + proj + MLP,
    calflops.py:44-84), so gflops.csv rows are comparable.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax


def xla_cost_analysis(fn, *args) -> Dict[str, float]:
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return dict(ca) if ca else {}


def _merge_kprime(patch: int, info: Dict[str, Any]) -> int:
    mode = (info or {}).get("tome", "base")
    r = float((info or {}).get("r", 0.0) or 0.0)
    if (mode in ("base", None, "none") or r <= 0
            or not (info or {}).get("tome_attention", True)):
        return patch
    if mode == "algm":
        # the TPU-static ALGM keeps K' = K and masks merged-away slots
        # (ops/merging._algm) — actual matmul FLOPs stay at K; the
        # data-dependent effective-token count is reported separately by
        # the attention replay (n_effective_tokens)
        return patch
    from splatformer_tpu.ops.merging import _merge_count
    return patch - _merge_count(patch, r)


def block_attention_flops(n_points: float, channels: int, num_heads: int,
                          patch: int, info: Dict[str, Any]) -> float:
    """FLOPs of one SerializedAttention on n_points (matmul FLOPs = 2*m*n*k,
    matching fvcore's convention of counting multiply-adds as 1 -> the
    reference numbers use fvcore's 1 MAC = 1 FLOP, so we use m*n*k)."""
    c = channels
    ch = c // num_heads
    kp = _merge_kprime(patch, info)
    b = max(1.0, n_points / patch)
    qkv = n_points * c * 3 * c
    attn = b * num_heads * (kp * kp * ch) * 2  # q@k^T and attn@v
    proj = n_points * c * c
    return qkv + attn + proj


def block_mlp_flops(n_points: float, channels: int,
                    mlp_ratio: float = 4.0) -> float:
    return n_points * channels * int(channels * mlp_ratio) * 2


def ptv3_attention_mlp_gflops(
    backbone_kwargs: Dict[str, Any],
    stage_points: Dict[str, float],
    info: Dict[str, Any],
) -> Tuple[float, float]:
    """(attention GFLOPs, MLP GFLOPs) summed over all encoder+decoder blocks.

    stage_points: {'enc0': n, ..., 'dec0': n, ...} from model diagnostics."""
    bk = backbone_kwargs
    attn_total, mlp_total = 0.0, 0.0
    for s, depth in enumerate(bk["enc_depths"]):
        n = float(stage_points.get(f"enc{s}", 0.0))
        for _ in range(depth):
            attn_total += block_attention_flops(
                n, bk["enc_channels"][s], bk["enc_num_head"][s],
                bk["enc_patch_size"][s], info)
            mlp_total += block_mlp_flops(n, bk["enc_channels"][s],
                                         bk.get("mlp_ratio", 4.0))
    for s, depth in enumerate(bk["dec_depths"]):
        n = float(stage_points.get(f"dec{s}", 0.0))
        for _ in range(depth):
            attn_total += block_attention_flops(
                n, bk["dec_channels"][s], bk["dec_num_head"][s],
                bk["dec_patch_size"][s], info)
            mlp_total += block_mlp_flops(n, bk["dec_channels"][s],
                                         bk.get("mlp_ratio", 4.0))
    return attn_total / 1e9, mlp_total / 1e9


def stage_points_from_diagnostics(diag: Dict[str, Any]) -> Dict[str, float]:
    out = {}
    for k, v in diag.items():
        if k.startswith("enc") and k.endswith("_n_valid"):
            out[k.replace("_n_valid", "")] = float(v)
    for k, v in diag.get("intermediates", {}).items():
        out[k] = float(v["n_valid"])
    return out
