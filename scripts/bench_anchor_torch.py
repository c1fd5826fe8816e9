"""Measure the baseline anchor: the reference's PyTorch training loop.

The reference publishes no throughput numbers (README.md:86-100 shows only
result images), so bench.py's ``vs_baseline`` needs an anchor.  Round 2
used an *assumed* 1e7 pts/s for an A100 (generous; the loop is
dispatch-bound) plus a measured same-host CPU figure buried in prose.
This script makes the measured anchor reproducible and committable:

it re-implements the reference's exact hot-path pattern — width-64 x
depth-5 MLP, per-dim looped ``autograd.grad`` Laplacian
(``/root/reference/Poisson_Equations/Poisson_ND.py:61-71``), residual MSE
(``:91-96``), Adam step (``:240``) — in PyTorch on this host's CPU (the
only hardware both stacks share), times the steady state, and writes
``artifacts/anchor_cpu_torch.json`` which bench.py reads to emit
``vs_baseline_measured_cpu``.

Usage: python scripts/bench_anchor_torch.py [n_points] [steps]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import torch


def build_mlp(d: int, width: int = 64, depth: int = 5) -> torch.nn.Module:
    """Width/depth of Poisson_ND.py:11-33 (sin activation, depth 5)."""

    class Sin(torch.nn.Module):
        def forward(self, x):
            return torch.sin(x)

    layers, prev = [], d
    for _ in range(depth - 1):
        layers += [torch.nn.Linear(prev, width), Sin()]
        prev = width
    layers.append(torch.nn.Linear(prev, 1))
    return torch.nn.Sequential(*layers)


def laplacian_looped(u, X):
    """The reference Laplacian: one reverse pass for the gradient, then one
    ``autograd.grad`` per input dimension (Poisson_ND.py:64-71)."""
    grad = torch.autograd.grad(u.sum(), X, create_graph=True)[0]
    lap = torch.zeros_like(u[:, 0])
    for i in range(X.shape[1]):
        lap = lap + torch.autograd.grad(
            grad[:, i].sum(), X, create_graph=True
        )[0][:, i]
    return lap


def measure(n: int = 20000, steps: int = 30, d: int = 2) -> dict:
    torch.manual_seed(0)
    net = build_mlp(d)
    X = (torch.rand(n, d) * 2.0).requires_grad_(True)  # leaf, as :187-190
    with torch.no_grad():
        f = (2.0 * (math.pi / 2.0) ** 2
             * torch.sin(math.pi * X[:, 0] / 2.0)
             * torch.sin(math.pi * X[:, 1] / 2.0)).detach()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    def step():
        opt.zero_grad()
        u = net(X)
        lap = laplacian_looped(u, X)
        loss = torch.mean((-lap - f) ** 2)
        loss.backward()
        opt.step()

    for _ in range(3):  # warmup
        step()
    t0 = time.time()
    for _ in range(steps):
        step()
    dt = time.time() - t0
    return {
        "pts_per_sec": round(n * steps / dt, 1),
        "ms_per_step": round(1e3 * dt / steps, 2),
        "n_points": n,
        "steps": steps,
        "dim": d,
        "device": "cpu",
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "pattern": "Poisson_ND.py:61-71 looped autograd.grad Laplacian, "
                   "width-64 depth-5 sin MLP, Adam",
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    row = measure(n, steps)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "anchor_cpu_torch.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    json.dump(row, open(out, "w"), indent=2)
    print(json.dumps(row))
