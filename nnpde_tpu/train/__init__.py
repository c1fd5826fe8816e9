from .trainer import FitResult, fit, fit_wan, tree_where
from .lbfgs import lbfgs_fit, lbfgs_polish
from .optim import make_optimizer, make_wan_optimizers
