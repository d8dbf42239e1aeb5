from gsmpm_tpu.ops.svd3 import svd3x3, polar_rotation
from gsmpm_tpu.ops.bspline import quadratic_bspline_weights, SPLINE_OFFSETS
