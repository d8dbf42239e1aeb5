from gsmpm_tpu.sim.state import MPMState, MPMModel, material_types
from gsmpm_tpu.sim.solver import MPMSolver, substep
from gsmpm_tpu.sim.volume import particle_volume
