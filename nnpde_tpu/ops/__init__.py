from .calculus import (
    value_grad_lap,
    batched_value_grad_lap,
    value_and_grad_x,
    batched_value_and_grad_x,
)
from .fwdlap import Jet, activation_jet, mlp_fwdlap, compose_product_jet
from .bump import bump_w_1d_jet, bump_w, bump_grid, bump_w_multi, BUMP_I1
from .quadrature import integral_mean, inner_product, normalize_l2, sign_aware_mse
