"""PTv3 model variant 'tome' — additional_info mirrors
/root/reference/configs/model/ptv3_tome.gin."""
from splatformer_tpu.configs.model_ptv3_base import get_config as _base


def get_config():
    cfg = _base()
    cfg.additional_info.tome = "tome"
    cfg.additional_info.r = 0.9
    return cfg
