"""PTv3 model variant 'drop' — additional_info mirrors
/root/reference/configs/model/ptv3_drop.gin."""
from splatformer_tpu.configs.model_ptv3_base import get_config as _base


def get_config():
    cfg = _base()
    cfg.additional_info.downsample = "random"
    cfg.additional_info.downsample_ratio = 0.6
    return cfg
