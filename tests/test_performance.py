"""Performance micro-benchmarks — counterpart of the reference's
test/test_performance.jl (print-only timings of kernel eval, GPCov build,
ODE sweeps, likelihood scaling), gated behind the same style of env flag
(the reference uses MAGI_RUN_PERFORMANCE_TESTS; runtests2.jl:70-72 keeps it
off by default). One hard assertion carries over: the likelihood+gradient
empirical scaling exponent in n stays < 3 (test_likelihoods.jl:318-321)."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import manifold_constrained_gaussian_process_inference_tpu as m
from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM
from manifold_constrained_gaussian_process_inference_tpu.ops.likelihood import (
    log_posterior,
    make_likelihood_data,
)

RUN = os.environ.get("MAGI_RUN_PERFORMANCE_TESTS", "") == "true"
pytestmark = pytest.mark.skipif(
    not RUN, reason="set MAGI_RUN_PERFORMANCE_TESTS=true to run"
)


def _timeit(fn, n=20):
    fn()  # warm/compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def test_gp_cov_build_timings():
    for n in (10, 50, 100):
        for band in (0, 2, n - 1):
            for complexity in (0, 2):
                t = np.linspace(0, 4, n)
                t0 = time.perf_counter()
                m.build_gp_cov(
                    "matern52", np.array([[1.0, 1.0], [1.0, 1.0]]), t,
                    bandsize=band, complexity=complexity,
                    check_eigenvalues=False,
                )
                dt = time.perf_counter() - t0
                print(f"gp_cov n={n} band={band} cx={complexity}: {dt*1e3:.1f} ms")


def test_likelihood_scaling_exponent():
    """Empirical scaling of value+grad in n must stay well below cubic."""
    times = {}
    theta = jnp.asarray([0.2, 0.2, 3.0])
    sigma = jnp.asarray([0.2, 0.2])
    for n in (40, 80, 160):
        t = np.linspace(0, 4, n)
        rng = np.random.default_rng(0)
        y = rng.normal(size=(n, 2))
        cov = m.build_gp_cov(
            "matern52", np.array([[1.0, 1.0], [1.0, 1.0]]), t, bandsize=20,
            complexity=2, check_eigenvalues=False,
        )
        data = make_likelihood_data(y, cov, (1.0, 1.0, 1.0))
        x = jnp.asarray(rng.normal(size=(n, 2)))
        vg = jax.jit(
            jax.value_and_grad(
                lambda xx: log_posterior(xx, theta, sigma, data, FN_SYSTEM.f)
            )
        )
        times[n] = _timeit(lambda: vg(x), n=50)
        print(f"likelihood value+grad n={n}: {times[n]*1e6:.0f} us")
    exponent = np.log(times[160] / times[40]) / np.log(4.0)
    print(f"empirical scaling exponent: {exponent:.2f}")
    assert exponent < 3.0


def test_ode_sweep_timings():
    for n in (100, 1000, 10000):
        x = jnp.ones((n, 2))
        theta = jnp.asarray([0.2, 0.2, 3.0])
        tv = jnp.zeros(n)
        f = jax.jit(FN_SYSTEM.f)
        dt = _timeit(lambda: f(x, theta, tv), n=50)
        print(f"fn_f sweep n={n}: {dt*1e6:.1f} us")
