from .scalar import Fp, P, GENERATOR, TWO_ADICITY, pow2_generator, batch_inv  # noqa: F401
from . import limbs, ops  # noqa: F401
