"""extended_legged_gym_tpu — a TPU-native legged-robot simulation, sampling-MPC
and RL training framework (JAX / XLA / Pallas / pjit).

Built from scratch with the capability surface of MasterYip/extended_legged_gym:
batched articulated rigid-body physics replaces Isaac Gym/PhysX, Pallas/XLA
terrain queries replace NVIDIA Warp, and jittable functional environments +
trajectory optimizers replace the mutable-buffer torch stack.
"""

__version__ = "0.1.0"
