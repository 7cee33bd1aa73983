"""Optimizer/schedule builders — optax re-design of
/root/reference/utils/optimizers.py.

Per-group learning rates (backbone vs each output head) via
optax.multi_transform; Adam(eps=1e-15)/SGD; constant/linear/cosine schedules
with optional warmup; global-norm clip 2.0; gradient accumulation via
optax.MultiSteps (replacing the reference's manual accumulate_step loop,
train.py:286-303). The fork's hardcoded `finetune_list=['attn.qkv']`
(optimizers.py:46-47) becomes the optional `finetune_filter` argument —
default None trains everything (upstream behavior).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import optax


def build_schedule(base_lr: float, schedule: str, total_steps: int,
                   warmup_steps: int = 0) -> optax.Schedule:
    if schedule == "constant":
        sched = optax.constant_schedule(base_lr)
    elif schedule == "linear":
        sched = optax.linear_schedule(base_lr, 0.0, total_steps)
    elif schedule == "cosine":
        sched = optax.cosine_decay_schedule(base_lr, total_steps)
    else:
        raise NotImplementedError(schedule)
    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
        sched = optax.join_schedules([warmup, sched], [warmup_steps])
    return sched


def _param_label(path) -> str:
    """Label a param by its top-level module: 'backbone' or head feature."""
    top = path[0].key if hasattr(path[0], "key") else str(path[0])
    if top.startswith("head_"):
        return top[len("head_"):]
    return "backbone"


def build_optimizer(
    params,
    lr_dict: Dict[str, float],
    optimizer_type: str = "adam",
    eps: float = 1e-15,
    schedule: str = "constant",
    total_steps: int = 200_000,
    warmup_steps: int = 0,
    grad_clip_norm: float = 2.0,
    accumulate_steps: int = 1,
    finetune_filter: Optional[Sequence[str]] = None,
) -> optax.GradientTransformation:
    """Build the training transformation over a FeaturePredictor param tree.

    lr_dict follows the reference config shape: {'base': ..., 'backbone': ...,
    '<feature>': ...} (configs/train/default.gin:36-46)."""
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _param_label(path), params)
    label_set = set(jax.tree.leaves(labels))

    def make_tx(label: str) -> optax.GradientTransformation:
        lr = lr_dict.get(label, lr_dict.get("base", 0.0))
        sched = build_schedule(lr, schedule, total_steps, warmup_steps)
        if optimizer_type.lower() == "adam":
            return optax.adam(sched, eps=eps)
        if optimizer_type.lower() == "sgd":
            return optax.sgd(sched)
        raise NotImplementedError(optimizer_type)

    tx = optax.multi_transform({lb: make_tx(lb) for lb in label_set}, labels)
    chain = []
    if grad_clip_norm and grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(tx)
    if finetune_filter:
        def keep(path, _):
            flat = "/".join(p.key if hasattr(p, "key") else str(p)
                            for p in path)
            return any(s in flat for s in finetune_filter)
        mask = jax.tree_util.tree_map_with_path(keep, params)
        chain.append(optax.masked(optax.identity(), mask))
        chain.append(optax.masked(optax.set_to_zero(),
                                  jax.tree.map(lambda m: not m, mask)))
    out = optax.chain(*chain)
    if accumulate_steps > 1:
        out = optax.MultiSteps(out, every_k_schedule=accumulate_steps)
    return out


def build_gs_optimizer(gs_params: Dict[str, jax.Array],
                       lr_dict: Dict[str, float],
                       optimizer_type: str = "adam",
                       eps: float = 1e-15) -> optax.GradientTransformation:
    """Per-attribute optimizer over raw Gaussian parameters (reference
    build_3DGSoptimizer, utils/optimizers.py:18-37) — used for direct 3DGS
    fitting rather than the feed-forward model path."""
    labels = {k: k for k in gs_params}

    def make_tx(attr: str):
        lr = lr_dict.get(attr, lr_dict.get("base", 1e-3))
        if optimizer_type.lower() == "adam":
            return optax.adam(lr, eps=eps)
        if optimizer_type.lower() == "sgd":
            return optax.sgd(lr)
        raise NotImplementedError(optimizer_type)

    return optax.multi_transform({k: make_tx(k) for k in gs_params}, labels)
