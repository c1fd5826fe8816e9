from .poisson import PoissonConfig, train_poisson_nd
