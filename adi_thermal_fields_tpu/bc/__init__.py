from .faces import FACES, exposed_face, exposed_faces
from .packs import CoeffPacks, build_coeff_packs
