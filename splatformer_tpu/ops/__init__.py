from splatformer_tpu.ops.types import Camera, GaussianScene, RasterizeConfig
from splatformer_tpu.ops.render import (
    render_image,
    render_images,
    activate_gaussians,
)
