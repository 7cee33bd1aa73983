"""Config system: three-tier python configs (model / dataset / train) with
CLI overrides — the TPU-stack equivalent of the reference's gin file stack
(SURVEY.md §5.6: dataset gin + model gin + train gin + --gin_param).

Configs are plain `ml_collections.ConfigDict`-returning modules resolved by
name (e.g. "ptv3_base", "objaverse", "default"); `apply_overrides` implements
the `key=value` CLI override syntax, and `merge_rate` keeps the reference's
CLI-beats-config precedence for the merge-sweep knob (train.py:391-393).
"""
from __future__ import annotations

import ast
import importlib
from typing import Optional, Sequence

from ml_collections import ConfigDict


def load_config(kind: str, name: str) -> ConfigDict:
    """kind in {model, dataset, train}; name like 'ptv3_base'."""
    if name.endswith(".py"):
        name = name.rsplit("/", 1)[-1][:-3]
    mod = importlib.import_module(f"splatformer_tpu.configs.{kind}_{name}")
    return mod.get_config()


def apply_overrides(cfg: ConfigDict, overrides: Optional[Sequence[str]]):
    """Apply 'a.b.c=value' strings (values parsed as python literals)."""
    for item in overrides or ():
        key, _, raw = item.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
    return cfg


def build_full_config(model: str = "ptv3_base", dataset: str = "synthetic",
                      train: str = "default",
                      overrides: Optional[Sequence[str]] = None) -> ConfigDict:
    cfg = ConfigDict()
    cfg.model = load_config("model", model)
    cfg.dataset = load_config("dataset", dataset)
    cfg.train = load_config("train", train)
    return apply_overrides(cfg, overrides)
