"""Model registry: rebuild a SolutionModel from checkpoint metadata.

The reference's plotter re-declares every network class by copy to load
checkpoints (``/root/reference/Data_process/plot.py:135-252``) — an
architecture-coupling the framework removes: checkpoints carry a small meta
dict (problem / layers / activation / technique / quantum numbers) and this
module rebuilds the exact model, trial factor included.
"""

from __future__ import annotations

from typing import Dict

from ..pde import ipw as ipw_phys
from ..pde import qho as qho_phys
from .mlp import NetSpec
from .solution import SolutionModel
from .trial import factor_for_technique


def build_solution_model(meta: Dict) -> SolutionModel:
    """meta schema: {problem, layers, activation, technique, n|nx/ny,
    L|x_max, role?}.  ``role='critic'`` rebuilds the WAN critic with the
    critic's factor rules (which differ from the primal's)."""
    problem = meta["problem"]
    layers = tuple(meta["layers"])
    activation = meta.get("activation", "tanh")
    technique = meta.get("technique", "RAW")
    spec = NetSpec(layers, activation=activation)

    if meta.get("role") == "critic":
        # critic factor rules per problem:
        #   poisson / ipw_1d / kh: raw critic (no factor)
        #   qho_1d_wan: same exp window as the primal when technique != BC
        #   ipw_2d / qho_2d: always the FBC factor
        if problem in ("poisson_nd", "ipw_1d", "ipw_1d_wan", "kh_1d"):
            return SolutionModel(spec)
        if problem in ("qho_1d", "qho_1d_wan"):
            factor = (
                factor_for_technique("OG", dim=1, kind="window",
                                     L=meta["x_max"])
                if technique != "BC" else None
            )
            return SolutionModel(spec, factor)
        if problem == "ipw_2d":
            return SolutionModel(
                spec, factor_for_technique("FBC", dim=2, kind="box",
                                           L=meta["L"])
            )
        if problem == "qho_2d":
            return SolutionModel(
                spec, factor_for_technique("FBC", dim=2, kind="window",
                                           L=meta["L"])
            )
        raise ValueError(f"Unknown critic problem {problem!r}")

    if problem in ("poisson_nd",):
        dim = layers[0]
        if (meta.get("bc_type", "dirichlet") == "neumann"
                and meta.get("bc_mode", "FBC") == "FBC"):
            # hard Neumann: raw net on the cosine input features
            # (models/inputmap.py) — no output factor
            from .inputmap import CosineInputMap

            return SolutionModel(
                spec, input_map=CosineInputMap(dim, 0.0, meta["L"]))
        factor = factor_for_technique(
            "FBC" if meta.get("bc_mode", "FBC") == "FBC" else "RB",
            dim=dim, kind="box", L=meta["L"],
        )
        return SolutionModel(spec, factor)
    if problem in ("ipw_1d", "ipw_1d_wan"):
        n, L = meta["n"], meta["L"]
        factor = factor_for_technique(
            technique, dim=1, kind="box", L=L,
            nodes_per_dim=[ipw_phys.nodes(n, L)] if technique == "FN" else None,
        )
        return SolutionModel(spec, factor)
    if problem == "ipw_2d":
        nx, ny, L = meta["nx"], meta["ny"], meta["L"]
        factor = factor_for_technique(
            technique, dim=2, kind="box", L=L,
            nodes_per_dim=[ipw_phys.nodes(nx, L), ipw_phys.nodes(ny, L)]
            if technique == "FN" else None,
        )
        return SolutionModel(spec, factor)
    if problem in ("qho_1d", "qho_1d_wan"):
        n, x_max = meta["n"], meta["x_max"]
        factor = factor_for_technique(
            "OG" if technique in ("OG", "FBC") else technique,
            dim=1, kind="window", L=x_max,
            nodes_per_dim=[qho_phys.nodes(n)] if technique == "FN" else None,
        )
        return SolutionModel(spec, factor)
    if problem == "qho_2d":
        nx, ny, L = meta["nx"], meta["ny"], meta["L"]
        factor = factor_for_technique(
            technique, dim=2, kind="window", L=L,
            nodes_per_dim=[qho_phys.nodes(nx), qho_phys.nodes(ny)]
            if technique == "FN" else None,
        )
        return SolutionModel(spec, factor)
    if problem == "kh_1d":
        factor = factor_for_technique(
            technique, dim=1, kind="window", L=meta["L"]
        )
        return SolutionModel(spec, factor)
    raise ValueError(f"Unknown problem {problem!r}")
