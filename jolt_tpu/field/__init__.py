from .params import FR, FQ, FieldParams, LIMB_BITS, LIMB_MASK, NUM_LIMBS, int_to_limbs, limbs_to_int
from . import ops
