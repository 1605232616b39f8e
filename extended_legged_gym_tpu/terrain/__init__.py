from .heightfield import TerrainData, flat_terrain, from_numpy, sample_height, sample_normal, sample_ceiling
