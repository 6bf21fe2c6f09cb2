"""manifold_constrained_gaussian_process_inference_tpu

A TPU-native JAX framework for MAGI (MAnifold-constrained Gaussian process
Inference): fully-Bayesian estimation of ODE parameters, latent trajectories,
and observation noise from noisy, sparse, partially observed time series —
no ODE solver in the inference loop.

Built from scratch against the capabilities of the Julia reference (MagiJl);
see SURVEY.md for the layer map and parity citations.
"""

from .config import MagiConfig, default_dtype  # noqa: F401
from .models import OdeSystem, get_system, registered_systems  # noqa: F401
from .ops import (  # noqa: F401
    GPCov,
    build_gp_cov,
    calculate_gp_covariances,
    log_likelihood_and_gradient_banded,
    log_posterior,
)
from .inference import MagiTarget, run_nuts  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports for the orchestration/postprocessing layers so importing
    # the core math never drags in matplotlib etc.
    if name in ("solve_magi", "MagiResult"):
        from .inference import solve as _solve

        return getattr(_solve, name)
    if name in ("magi_summary", "results_to_chain", "plot_magi"):
        from . import postprocess as _pp

        return getattr(_pp, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
