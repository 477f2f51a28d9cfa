from .layers import (activation_times_from_layer_times, layer_activation_times,
                     track_activation_times)
from .spiral import (active_at, newborn_between, ring_activation_times,
                     spiral_activation_times)
from .heat_source import GoldakSource, gaussian_ellipsoid_source, goldak_source
