"""PTv3 model variant 'tofu' — additional_info mirrors
/root/reference/configs/model/ptv3_tofu.gin."""
from splatformer_tpu.configs.model_ptv3_base import get_config as _base


def get_config():
    cfg = _base()
    cfg.additional_info.tome = "tofu"
    cfg.additional_info.r = 0.9
    return cfg
