from .domain import Box
from . import poisson, ipw, qho, kh
