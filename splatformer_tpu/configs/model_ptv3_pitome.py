"""PTv3 model variant 'pitome' — additional_info mirrors
/root/reference/configs/model/ptv3_pitome.gin."""
from splatformer_tpu.configs.model_ptv3_base import get_config as _base


def get_config():
    cfg = _base()
    cfg.additional_info.tome = "pitome"
    cfg.additional_info.r = 0.52
    cfg.additional_info.margin = 0.9
    cfg.additional_info.alpha = 1.0
    cfg.additional_info.protected_ratio = 0.01
    return cfg
