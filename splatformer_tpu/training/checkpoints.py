"""Checkpoint save/restore via orbax — replaces the reference's
torch.save(state_dict) (train.py:341-346, which crashes on a typo there;
we additionally checkpoint optimizer state + step + PRNG, which the
reference never did — SURVEY.md §5.4)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True))


def save_checkpoint(ckpt_dir: str, state: Any, step: int) -> None:
    mgr = _manager(ckpt_dir)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(ckpt_dir: str, state: Any,
                       step: Optional[int] = None) -> Any:
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        return state
    restored = mgr.restore(step, args=ocp.args.StandardRestore(state))
    mgr.close()
    return restored


def load_partial_params(ckpt_dir: str, params: Any, scope: str = "backbone",
                        step: Optional[int] = None):
    """Shape-tolerant partial load of a param subtree from a checkpoint —
    the reference's pretrained-backbone path
    (/root/reference/models/pointtransformer_v3.py:164-178): keys missing
    from the checkpoint or with mismatched shapes keep their fresh init.

    Returns (merged_params, report) with report = {loaded, missing,
    mismatched} key-path lists."""
    from flax import traverse_util as tu

    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        return params, {"loaded": [], "missing": [], "mismatched": []}
    raw = mgr.restore(step)  # raw pytree (nested dicts)
    mgr.close()
    src = raw.get("params", raw) if isinstance(raw, dict) else raw

    flat_cur = tu.flatten_dict(jax.tree.map(lambda x: x, params))
    flat_src = tu.flatten_dict(src)
    report = {"loaded": [], "missing": [], "mismatched": []}
    merged = {}
    for k, v in flat_cur.items():
        path = "/".join(k)
        if scope and k[0] != scope:
            merged[k] = v
            continue
        if k not in flat_src:
            report["missing"].append(path)
            merged[k] = v
        elif tuple(flat_src[k].shape) != tuple(v.shape):
            report["mismatched"].append(path)
            merged[k] = v
        else:
            report["loaded"].append(path)
            merged[k] = jax.numpy.asarray(flat_src[k], v.dtype)
    return tu.unflatten_dict(merged), report


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step
