from .heightfield import TerrainData, flat_terrain, from_numpy, sample_height, sample_normal, sample_ceiling
from .dynamic_obstacles import (DynamicObstacleConfig, StoneState, generate_stones,
                                reset_stones, step_stones, stone_robot_forces)
