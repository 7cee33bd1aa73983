"""PTv3 model variant 'algm' — additional_info mirrors
/root/reference/configs/model/ptv3_algm.gin."""
from splatformer_tpu.configs.model_ptv3_base import get_config as _base


def get_config():
    cfg = _base()
    cfg.additional_info.tome = "algm"
    cfg.additional_info.r = 0.5
    cfg.additional_info.threshold = 0.9
    return cfg
