"""Functional MLP as a plain pytree — the solution/critic network family.

Replaces the reference's per-script ``nn.Module`` copies (``SolutionNet`` /
``CriticNet`` ``/root/reference/Poisson_Equations/Poisson_ND.py:11-46``, the
``FCN`` variants in every Schrodinger script) with one parameterised spec:
``layers`` list, activation in {sin, tanh}, and the two init schemes the
reference uses (PyTorch Linear default for the sin nets, Xavier-uniform with
tanh gain + zero bias for the tanh nets,
``IPW_1D_PINN_DRM.py:57-61``).  Params are tuples of ``(W, b)`` so the model
is trivially jit/vmap/shard-able and feeds the fused forward-Laplacian path.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class NetSpec(NamedTuple):
    layers: Tuple[int, ...]          # e.g. (1, 50, 50, 50, 1)
    activation: str = "tanh"         # 'tanh' | 'sin'
    init: str = "auto"               # 'auto' | 'torch_default' | 'xavier_tanh'

    def resolved_init(self) -> str:
        if self.init != "auto":
            return self.init
        # Reference pairing: tanh nets use Xavier(tanh gain), sin nets use
        # the PyTorch nn.Linear default init.
        return "xavier_tanh" if self.activation == "tanh" else "torch_default"


def init_mlp(key, spec: NetSpec, dtype=jnp.float32):
    """Initialise MLP params: list of (W (in,out), b (out,))."""
    layers = spec.layers
    scheme = spec.resolved_init()
    params = []
    keys = jax.random.split(key, len(layers) - 1)
    for k, fan_in, fan_out in zip(keys, layers[:-1], layers[1:]):
        kw, kb = jax.random.split(k)
        if scheme == "xavier_tanh":
            gain = 5.0 / 3.0  # torch.nn.init.calculate_gain('tanh')
            bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
            W = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
            b = jnp.zeros((fan_out,), dtype)
        elif scheme == "torch_default":
            # PyTorch nn.Linear: kaiming_uniform(a=sqrt(5)) => U(-1/sqrt(fan_in), ..)
            bound = 1.0 / math.sqrt(fan_in)
            W = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
            b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
        else:
            raise ValueError(f"Unknown init scheme {scheme!r}")
        params.append((W, b))
    return params


_ACTIVATIONS = {
    "sin": jnp.sin,
    "tanh": jnp.tanh,
    "gelu": lambda v: jax.nn.gelu(v, approximate=False),
}


def _resolve_activation(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Unknown activation {name!r}") from None


def mlp_apply_point(params, x, activation: str):
    """Per-point forward: x (d,) -> scalar."""
    act = _resolve_activation(activation)
    h = x
    for (W, b) in params[:-1]:
        h = act(h @ W + b)
    W, b = params[-1]
    return (h @ W + b)[0]


def mlp_apply_batch(params, X, activation: str):
    """Batched forward: X (N, d) -> (N,)."""
    act = _resolve_activation(activation)
    h = X
    for (W, b) in params[:-1]:
        h = act(h @ W + b)
    W, b = params[-1]
    return (h @ W + b)[..., 0]


def mlp_apply_batch_channels(params, X, activation: str):
    """Batched multi-output forward: X (N, d) -> (N, C)."""
    act = _resolve_activation(activation)
    h = X
    for (W, b) in params[:-1]:
        h = act(h @ W + b)
    W, b = params[-1]
    return h @ W + b


def num_params(params) -> int:
    return sum(int(W.size + b.size) for (W, b) in params)
