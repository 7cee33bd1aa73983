"""ShapeNet-OOD dataset config — mirrors
/root/reference/configs/dataset/shapenet.gin."""
from splatformer_tpu.configs.dataset_objaverse import get_config as _base


def get_config():
    cfg = _base()
    cfg.train.nerfstudio_folder = "train-set/shapenetOOD/nerfstudio"
    cfg.train.colmap_folder = "train-set/shapenetOOD/colmap"
    cfg.test.folders = {
        "shapenet": ("test-set/shapenetOOD/nerfstudio",
                     "test-set/shapenetOOD/colmap"),
    }
    return cfg
