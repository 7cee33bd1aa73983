"""PTv3 model variant 'voxel' — additional_info mirrors
/root/reference/configs/model/ptv3_voxel.gin."""
from splatformer_tpu.configs.model_ptv3_base import get_config as _base


def get_config():
    cfg = _base()
    cfg.additional_info.downsample = "voxel"
    cfg.additional_info.voxel_size = 0.0075
    return cfg
