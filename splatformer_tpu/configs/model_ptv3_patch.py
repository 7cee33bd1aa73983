"""PTv3 model variant 'patch' — additional_info mirrors
/root/reference/configs/model/ptv3_patch.gin."""
from splatformer_tpu.configs.model_ptv3_base import get_config as _base


def get_config():
    cfg = _base()
    cfg.additional_info.tome = "patch"
    cfg.additional_info.r = 0.5
    cfg.additional_info.stride = 10
    return cfg
