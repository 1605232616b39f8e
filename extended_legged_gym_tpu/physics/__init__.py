from .model import RobotModel
from .urdf import load_urdf, attach_feet, geom_indices_matching
from .engine import (
    SimParams, PhysState, EnvPhysParams, StepReport,
    default_sim_params, default_env_params, initial_state, physics_step, step_batch,
)
from .contact import ContactParams, default_contact_params
