from .loader import get_library, native_available, voxelize_parity_native
