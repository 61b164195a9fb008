# Device meshes, sharding, data-parallel training, rank-zero gating.
