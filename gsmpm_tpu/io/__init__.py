from gsmpm_tpu.io.ply import (
    read_gaussian_ply,
    write_gaussian_ply,
    write_particle_ply,
    read_particle_ply,
)
from gsmpm_tpu.io.cameras import load_cameras, Camera
