from .spiral import (spiral_activation_times, ring_activation_times,
                     active_at, newborn_between)
