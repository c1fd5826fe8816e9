from .fwdlap_pallas import mlp_fwdlap_pallas, pallas_available
from .fused_step import fused_linear_residual, residual_coefficients
