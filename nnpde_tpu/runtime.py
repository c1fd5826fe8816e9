"""Runtime/platform helpers: compilation cache, backend selection.

The deployment environment compiles TPU programs through a remote service
(PALLAS_AXON_REMOTE_COMPILE); a full train-step scan costs minutes to
compile but ~1 ms/epoch to run.  The persistent compilation cache makes that
a one-time cost across processes, so every entry point calls
:func:`enable_compilation_cache` first.
"""

from __future__ import annotations

import os

import jax

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Idempotently enable the persistent XLA compilation cache."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    path = path or os.environ.get(
        "NNPDE_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_ENABLED = True
    except Exception:  # pragma: no cover - cache is an optimisation only
        pass


_DEFAULT_PALLAS_CHUNK_CAP = 1000


def pallas_chunk_cap() -> int:
    """Epoch-scan length cap applied on the Pallas jet path.

    Round 2 observed a >9-min compile at chunk=1000 on the remote TPU
    compile service once and capped the scan at 500.  The round-3
    measurement (``scripts/bench_compile_cliff.py`` ->
    ``artifacts/compile_cliff.json``) could NOT reproduce a cliff on either
    step shape: the Poisson PINN step compiles flat at 3.4-3.9 s (pallas) /
    5.7-6.5 s (xla) for chunk in 125..1000, and the WAN extragradient step
    (the biggest scan body in the repo: critic fori_loop + double jet
    evaluation) compiles+runs 1000 epochs in 42 s total.  The round-2
    observation is best explained as a silent tunnel hang (a known failure
    mode of the remote compile service) misread as compile time.  Default
    cap is therefore 1000 — every shipped config's chunk, i.e. uncapped in
    practice; override with ``NNPDE_PALLAS_CHUNK_CAP`` (0 = no cap) if a
    genuine cliff ever reappears.
    """
    cap = int(os.environ.get("NNPDE_PALLAS_CHUNK_CAP", _DEFAULT_PALLAS_CHUNK_CAP))
    return cap if cap > 0 else 1 << 30


def scan_chunk_cap() -> int:
    """Global epoch-scan dispatch-length cap (``NNPDE_SCAN_CHUNK_CAP``).

    Applied by the trainer's ``_run_chunks`` on EVERY path (xla and
    pallas), bounding how many epochs one device dispatch executes.
    Motivation (round 4): after the round-3/4 backend outage the remote
    TPU worker began killing long-running dispatches — a grid400 WAN
    extragradient step scanned 500 epochs/dispatch (~3 min on-device)
    dies with ``UNAVAILABLE: TPU device error`` on the first
    ``block_until_ready``, reproduced with round-3 code (so not a code
    regression), while the identical program at 100 epochs/dispatch
    completes (``/tmp/repro_c100.log``, 348 s).  Chunk boundaries are
    numerics-free: per-epoch PRNG keys are ``fold_in(key, epoch)`` so
    the trajectory is bitwise independent of chunking
    (``tests/test_resume.py``).  Default 0 = uncapped; set e.g.
    ``NNPDE_SCAN_CHUNK_CAP=100`` when the worker is killing dispatches.
    """
    cap = int(os.environ.get("NNPDE_SCAN_CHUNK_CAP", "0"))
    return cap if cap > 0 else 1 << 30


def enable_debug_nans(on: bool = True) -> None:
    """Opt-in NaN trapping (the reference's nearest analogue is scattered
    eps/nan_to_num guards — SURVEY.md §5 'race detection / sanitizers')."""
    jax.config.update("jax_debug_nans", on)


def profile_trace(log_dir: str):
    """Context manager capturing a jax.profiler trace into ``log_dir``
    (viewable in TensorBoard / Perfetto)."""
    return jax.profiler.trace(log_dir)


def force_cpu(n_devices: int = 8) -> None:
    """Switch this process to a virtual multi-device CPU backend (tests,
    multi-chip dry runs).  Safe to call even after another backend was
    initialised (clears live backends so the CPU client re-reads XLA_FLAGS)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < n_devices:
        try:
            jax.clear_backends()
        except Exception:  # pragma: no cover
            from jax.extend import backend as _backend

            _backend.clear_backends()
