from .mlp import NetSpec, init_mlp, mlp_apply_point, mlp_apply_batch
from .trial import (
    Factor1D,
    SeparableFactor,
    unit_factor,
    poly_box,
    exp_window,
    nodes_poly,
    product1d,
    factor_for_technique,
)
from .inputmap import CosineInputMap
from .solution import ChannelSolutionModel, SolutionModel
