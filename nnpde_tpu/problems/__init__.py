from .ipw3d import IPW3DConfig, train_ipw_3d
from .kh_floquet import KHFloquetConfig, train_kh_floquet
from .poisson import PoissonConfig, train_poisson_nd
