from . import bn254_host
from .g1 import (jacobian_add, jacobian_double, tree_sum, pack_points,
                 unpack_points, msm_binary, msm_u8, msm)
