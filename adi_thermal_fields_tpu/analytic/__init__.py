from .endface import (EndFaceProblem, dirichlet_end_profile,
                      neumann_end_profile, robin_end_profile, robin_disk_modes)
from .kernels import robin_halfspace_G
from .layer_birth import LayerBirthConfig, layer_birth_centerline
from .spiral import (SpiralAnalyticConfig, SpiralModeCache, build_mode_cache,
                     temperature_map_at_probe)
