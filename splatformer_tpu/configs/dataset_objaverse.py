"""Objaverse-OOD dataset config — mirrors
/root/reference/configs/dataset/objaverse.gin."""
from ml_collections import ConfigDict


def get_config() -> ConfigDict:
    cfg = ConfigDict()
    cfg.remove_outlier_ndevs = -1.0
    cfg.max_gs_num = 100_000
    cfg.pad_to = 0  # 0 -> round max_gs_num up to a patch multiple
    cfg.load_pose_src = "nerfstudio"
    cfg.batch_size = 1          # scenes per device per micro-step
    cfg.accumulate_step = 1
    cfg.num_workers = 4

    cfg.train = ConfigDict()
    cfg.train.nerfstudio_folder = "train-set/objaverseOOD/nerfstudio"
    cfg.train.colmap_folder = "train-set/objaverseOOD/colmap"
    cfg.train.image_per_scene = 4
    cfg.train.sample_ratio_test = 0.7
    cfg.train.cache_steps = 1
    cfg.train.cache_num_scenes = 1
    cfg.train.split_across_processes = True
    cfg.train.background_color = "random"

    cfg.test = ConfigDict(type_safe=False)
    cfg.test.folders = {
        "objaverse": ("test-set/objaverseOOD/nerfstudio",
                      "test-set/objaverseOOD/colmap"),
        "GSO": ("test-set/GSOOOD/nerfstudio", "test-set/GSOOOD/colmap"),
        "real": ("test-set/realOOD/nerfstudio", "test-set/realOOD/colmap"),
    }
    cfg.test.background_color = (0, 0, 0)
    cfg.test.split_across_processes = False
    return cfg
