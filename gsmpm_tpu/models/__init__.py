from gsmpm_tpu.models.gaussians import (
    GaussianScene,
    load_gaussians,
    search_for_max_iteration,
)
from gsmpm_tpu.models.synthetic import synthetic_blob_scene, synthetic_box_scene
