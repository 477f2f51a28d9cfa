from .checkpoint import (RunState, load_checkpoint, load_checkpoint_orbax,
                         save_checkpoint, save_checkpoint_orbax)
from .logging import Metrics, fmt_bytes, log
from .vtk import (read_vtk_structured_grid,
                  write_vtk_cylindrical_grid,
                  write_vtk_structured_points)
from .profiling import StepTimer, trace
