from .cartesian import adi_step as adi_step_cartesian
from .cartesian import apply_surface_impulse, implicit_sweep, masked_laplacian_1d
from .cylindrical import RobinBC, ZFaceBC
from .cylindrical import adi_step as adi_step_cylindrical
from .cylindrical import adi_step_masked as adi_step_cylindrical_masked
from .cylindrical_masked import adi_step_masked_robin
