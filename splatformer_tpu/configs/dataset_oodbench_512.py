"""512^2 resolution tier of the OOD benchmark (VERDICT r4 item 6): dense
65k-pad scenes rendered and evaluated at 512^2 — the stepping stone toward
the reference's ~1 MPx real-scene regime (dataset/GS.py:128-151), where
binning budgets, compositor walk lengths, and photometric-loss memory
change character.

Generate with scripts/run_512_tier.sh (or make_ood_benchmark --hw 512).
"""
from ml_collections import ConfigDict

from splatformer_tpu.configs.dataset_oodbench import get_config as _base


def get_config() -> ConfigDict:
    cfg = _base()
    cfg.max_gs_num = 65536
    cfg.pad_to = 65536
    cfg.train.nerfstudio_folder = "data/oodbench_512/train/nerfstudio"
    cfg.train.colmap_folder = "data/oodbench_512/train/colmap"
    cfg.test.folders = {
        "oodbench_512": ("data/oodbench_512/test/nerfstudio",
                         "data/oodbench_512/test/colmap"),
    }
    return cfg
