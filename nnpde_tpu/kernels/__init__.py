from .fwdlap_pallas import mlp_fwdlap_pallas, pallas_available
from .fused_step import (
    drm_coefficients,
    fused_drm_energy,
    fused_linear_residual,
    fused_poisson_analytic,
    fused_residual_analytic,
    residual_coefficients,
)
from .fused_quotient import (
    fused_linear_sums,
    fused_quad_sums,
    fused_quad_seeded_grads,
    fused_seeded_grads,
    linear_functional_coefficients,
    make_fused_quad_mean,
    make_fused_rayleigh,
    make_fused_wan_u,
    make_fused_wan_v,
    quotient_coefficients,
)
from .fused_multibump import (
    fused_multi_seeded_grads,
    fused_multi_sums,
    make_fused_wan_multi_u,
    make_fused_wan_multi_v,
    pack_multibump_coefficients,
)
