"""PTv3 model variant 'wpatch' — additional_info mirrors
/root/reference/configs/model/ptv3_wpatch.gin."""
from splatformer_tpu.configs.model_ptv3_base import get_config as _base


def get_config():
    cfg = _base()
    cfg.additional_info.tome = "wpatch"
    cfg.additional_info.r = 0.5
    cfg.additional_info.stride = 10
    cfg.additional_info.low_r = 16
    return cfg
