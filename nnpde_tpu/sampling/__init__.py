from .samplers import (
    uniform_box,
    sobol_box,
    sobol_unit,
    shifted_qmc,
    linspace_grid,
    meshgrid_2d,
    face_points,
    first_fraction_every_kth,
    mid_fraction_every_kth,
    first_fraction_indices,
)
