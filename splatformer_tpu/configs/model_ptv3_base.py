"""PTv3-base model config — values mirror
/root/reference/configs/model/ptv3_base.gin."""
from ml_collections import ConfigDict


def get_config() -> ConfigDict:
    cfg = ConfigDict()
    cfg.backbone_type = "PT"
    cfg.sh_degree = 1
    cfg.output_head_nlayer = 4
    cfg.output_head_type = "mlp-relu"
    cfg.max_scale_normalized = 1e-2
    cfg.grid_resolution = 384
    cfg.resume_ckpt = ""
    cfg.output_features_type = "res"
    cfg.input_features = ("means", "scales", "opacities", "quats",
                          "features_dc", "features_rest")
    cfg.output_features = ("means", "scales", "opacities", "quats",
                           "features_dc", "features_rest")
    cfg.output_head_width = 128
    cfg.zeroinit = True
    cfg.res_feature_activation = {
        "means": "tanh", "features_dc": "identity",
        "features_rest": "identity", "scales": "identity",
        "opacities": "identity", "quats": "identity"}
    cfg.input_feat_to_mlp = True

    cfg.backbone = ConfigDict()
    cfg.backbone.enable_flash = False
    cfg.backbone.output_dim = 96     # -> dec_channels (96, 96, 128, 256)
    cfg.backbone.enc_dim = 64        # -> enc_channels (64, 96, 128, 256, 512)
    cfg.backbone.turn_off_bn = False
    cfg.backbone.stride = (1, 2, 2, 2)
    cfg.backbone.embedding_type = "MLP"
    cfg.backbone.enc_depths = (2, 2, 2, 6, 2)
    cfg.backbone.enc_num_head = (2, 4, 8, 16, 32)
    cfg.backbone.dec_depths = (2, 2, 2, 2)
    cfg.backbone.dec_num_head = (4, 4, 8, 16)
    cfg.backbone.drop_path = 0.3
    cfg.backbone.mlp_ratio = 4.0
    cfg.backbone.pool_capacity_factors = (1.0, 0.75, 0.625, 0.5)
    # explicit overrides (empty tuple / 0 = derive from enc_dim/output_dim/flash)
    cfg.backbone.enc_channels = ()
    cfg.backbone.dec_channels = ()
    cfg.backbone.patch_size = 0

    cfg.additional_info = ConfigDict(type_safe=False)
    cfg.additional_info.tome = "base"
    cfg.additional_info.r = 0.0
    cfg.additional_info.tome_mlp = True
    cfg.additional_info.tome_attention = True
    cfg.additional_info.trace_back = False
    cfg.additional_info.single_head_tome = False
    cfg.additional_info.margin = 0.9
    return cfg
