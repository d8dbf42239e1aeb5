from gsmpm_tpu.render.camera import (
    Camera,
    focal2fov,
    fov2focal,
    projection_matrix,
    world_to_view,
    make_camera,
)
from gsmpm_tpu.render.renderer import render, RasterConfig
