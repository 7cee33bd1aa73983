"""PTv3 model variant 'prune' — additional_info mirrors
/root/reference/configs/model/ptv3_prune.gin."""
from splatformer_tpu.configs.model_ptv3_base import get_config as _base


def get_config():
    cfg = _base()
    cfg.additional_info.tome = "prune"
    cfg.additional_info.r = 0.9
    cfg.additional_info.stride = 10
    return cfg
