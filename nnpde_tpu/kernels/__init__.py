from .fwdlap_pallas import mlp_fwdlap_pallas, pallas_available
