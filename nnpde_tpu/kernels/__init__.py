from .fwdlap_pallas import mlp_fwdlap_pallas, pallas_available
from .fused_step import (
    drm_coefficients,
    fused_drm_energy,
    fused_linear_residual,
    residual_coefficients,
)
