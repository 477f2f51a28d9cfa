from .spiral import (SpiralAnalyticConfig, SpiralModeCache, build_mode_cache,
                     temperature_map_at_probe)
