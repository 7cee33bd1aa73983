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


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step
