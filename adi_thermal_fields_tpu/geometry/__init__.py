from .perimeter import digital_perimeter, perimeter_correction_factor
from .shapes import cylinder_mask, plate_mask
