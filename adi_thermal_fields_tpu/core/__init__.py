from .grid import CartesianGrid, CylindricalGrid
from .material import Material
from .timestep import TimeControls
