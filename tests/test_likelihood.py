"""Likelihood core tests — mirrors test/test_likelihoods.jl: finiteness,
finite-difference gradient checks (FN + Hes1), NaN missing-data semantics,
temperature sensitivity, extreme-theta robustness, and a first-order
gradient-predicts-delta check."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import manifold_constrained_gaussian_process_inference_tpu as m
from manifold_constrained_gaussian_process_inference_tpu.models import (
    FN_SYSTEM,
    HES1_SYSTEM,
)
from manifold_constrained_gaussian_process_inference_tpu.ops.likelihood import (
    log_likelihood_and_gradient_banded,
    log_posterior,
    make_likelihood_data,
)


def _setup(system, n=15, d=None, seed=0, t1=4.0, bandsize=20):
    d = d or (2 if system is FN_SYSTEM else 3)
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, t1, n)
    phi = np.vstack([np.full(d, 1.2), np.full(d, 1.0)])
    cov = m.build_gp_cov("matern52", phi, t, bandsize=bandsize, complexity=2, jitter=1e-6)
    x = rng.normal(size=(n, d)) * 0.5 + 1.0
    y = x + rng.normal(size=(n, d)) * 0.2
    return t, cov, x, y


def _fd_grad(fun, v0, eps=1e-6):
    g = np.zeros_like(v0)
    for i in range(len(v0)):
        vp, vm = v0.copy(), v0.copy()
        vp[i] += eps
        vm[i] -= eps
        g[i] = (fun(vp) - fun(vm)) / (2 * eps)
    return g


@pytest.mark.parametrize(
    "system,theta",
    [
        (FN_SYSTEM, np.array([0.2, 0.2, 3.0])),
        (HES1_SYSTEM, np.array([0.022, 0.3, 0.031, 0.028, 0.5, 20.0, 0.3])),
    ],
)
def test_gradient_vs_finite_differences(system, theta):
    """(test_likelihoods.jl:76-103, 165-179; rtol 1e-3 there, tighter here)."""
    t, cov, x, y = _setup(system, n=12)
    n, d = x.shape
    k = len(theta)
    sigma = np.full(d, 0.25)
    y = y.copy()
    y[4, 0] = np.nan  # one missing obs

    ll, grad = log_likelihood_and_gradient_banded(
        jnp.asarray(x), jnp.asarray(theta), jnp.asarray(sigma), y, cov,
        system.f, (2.0, 1.5, 3.0),
    )
    assert np.isfinite(float(ll))
    assert grad.shape == (n * d + k + d,)

    def f_flat(v):
        xx = v[: n * d].reshape(d, n).T
        th = v[n * d : n * d + k]
        sg = v[n * d + k :]
        ll2, _ = log_likelihood_and_gradient_banded(
            jnp.asarray(xx), jnp.asarray(th), jnp.asarray(sg), y, cov,
            system.f, (2.0, 1.5, 3.0),
        )
        return float(ll2)

    v0 = np.concatenate([x.T.reshape(-1), theta, sigma])
    fd = _fd_grad(f_flat, v0)
    assert np.allclose(np.asarray(grad), fd, rtol=1e-5, atol=1e-4)


def test_missing_data_semantics():
    """NaN masking: ll increases when an obs is removed; the gradient differs
    ONLY in the masked element's obs contribution (test_likelihoods.jl:106-155)."""
    theta = np.array([0.2, 0.2, 3.0])
    t, cov, x, y = _setup(FN_SYSTEM, n=12)
    sigma = np.full(2, 0.3)
    beta = (1.0, 1.0, 1.0)

    ll_full, g_full = log_likelihood_and_gradient_banded(
        jnp.asarray(x), jnp.asarray(theta), jnp.asarray(sigma), y, cov, FN_SYSTEM.f, beta
    )
    y_miss = y.copy()
    miss_i, miss_d = 5, 1
    y_miss[miss_i, miss_d] = np.nan
    ll_miss, g_miss = log_likelihood_and_gradient_banded(
        jnp.asarray(x), jnp.asarray(theta), jnp.asarray(sigma), y_miss, cov,
        FN_SYSTEM.f, beta,
    )
    # Masking removes exactly the obs residual + its normalization constant
    # (likelihoods.jl:139-143): delta = (r^2/(2 s^2) + log(2 pi s^2)/2) / b3
    r = x[miss_i, miss_d] - y[miss_i, miss_d]
    expected_delta = 0.5 * r**2 / sigma[miss_d] ** 2 + 0.5 * np.log(
        2 * np.pi * sigma[miss_d] ** 2
    )
    assert np.isclose(float(ll_miss) - float(ll_full), expected_delta, rtol=1e-8)
    diff = np.asarray(g_miss) - np.asarray(g_full)
    n, d = x.shape
    flat_idx = miss_d * n + miss_i  # column-major position
    # x-gradient differs only at the masked element
    expected = np.zeros(n * d)
    expected[flat_idx] = (x[miss_i, miss_d] - y[miss_i, miss_d]) / sigma[miss_d] ** 2
    assert np.allclose(diff[: n * d], expected, atol=1e-10)
    # theta gradient unchanged
    assert np.allclose(diff[n * d : n * d + 3], 0.0, atol=1e-10)


def test_temperature_sensitivity():
    """Different beta -> different ll (test_likelihoods.jl:158-163)."""
    theta = np.array([0.2, 0.2, 3.0])
    t, cov, x, y = _setup(FN_SYSTEM)
    sigma = np.full(2, 0.3)
    args = (jnp.asarray(x), jnp.asarray(theta), jnp.asarray(sigma), y, cov, FN_SYSTEM.f)
    ll1, _ = log_likelihood_and_gradient_banded(*args, (1.0, 1.0, 1.0))
    ll2, _ = log_likelihood_and_gradient_banded(*args, (10.0, 1.0, 1.0))
    ll3, _ = log_likelihood_and_gradient_banded(*args, (1.0, 1.0, 10.0))
    assert not np.isclose(float(ll1), float(ll2))
    assert not np.isclose(float(ll1), float(ll3))


@pytest.mark.parametrize("scale", [1e-8, 1e8])
def test_extreme_theta_finite(scale):
    """(test_likelihoods.jl:181-190)."""
    t, cov, x, y = _setup(FN_SYSTEM)
    theta = np.array([scale, scale, max(scale, 1e-4)])
    sigma = np.full(2, 0.3)
    ll, grad = log_likelihood_and_gradient_banded(
        jnp.asarray(x), jnp.asarray(theta), jnp.asarray(sigma), y, cov,
        FN_SYSTEM.f, (1.0, 1.0, 1.0),
    )
    assert np.isfinite(float(ll))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_mostly_missing_data():
    """(test_likelihoods.jl:192-205)."""
    t, cov, x, y = _setup(FN_SYSTEM, n=15)
    y = y.copy()
    y[1:, 0] = np.nan
    y[:-1, 1] = np.nan  # one obs per dim remains
    theta = np.array([0.2, 0.2, 3.0])
    sigma = np.full(2, 0.3)
    ll, grad = log_likelihood_and_gradient_banded(
        jnp.asarray(x), jnp.asarray(theta), jnp.asarray(sigma), y, cov,
        FN_SYSTEM.f, (1.0, 1.0, 1.0),
    )
    assert np.isfinite(float(ll))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_gradient_predicts_delta_ll():
    """First-order Taylor check (test_likelihoods.jl:207-257)."""
    t, cov, x, y = _setup(FN_SYSTEM)
    n, d = x.shape
    theta = np.array([0.2, 0.2, 3.0])
    sigma = np.full(2, 0.3)
    beta = (1.0, 1.0, 1.0)
    ll0, g = log_likelihood_and_gradient_banded(
        jnp.asarray(x), jnp.asarray(theta), jnp.asarray(sigma), y, cov, FN_SYSTEM.f, beta
    )
    rng = np.random.default_rng(9)
    dv = rng.normal(size=n * d + 3 + d) * 1e-5
    v1 = np.concatenate([x.T.reshape(-1), theta, sigma]) + dv
    x1 = v1[: n * d].reshape(d, n).T
    ll1, _ = log_likelihood_and_gradient_banded(
        jnp.asarray(x1), jnp.asarray(v1[n * d : n * d + 3]),
        jnp.asarray(v1[n * d + 3 :]), y, cov, FN_SYSTEM.f, beta,
    )
    predicted = float(np.asarray(g) @ dv)
    actual = float(ll1) - float(ll0)
    assert np.isclose(predicted, actual, rtol=1e-3)


def test_band_size_affects_value_but_stays_finite():
    """Banded approximation changes the value smoothly; full band == dense."""
    theta = np.array([0.2, 0.2, 3.0])
    sigma = np.full(2, 0.3)
    rng = np.random.default_rng(0)
    n, d = 20, 2
    t = np.linspace(0, 4, n)
    x = rng.normal(size=(n, d))
    y = x + 0.1 * rng.normal(size=(n, d))
    lls = {}
    for bs in [0, 2, n - 1]:
        phi = np.vstack([np.full(d, 1.2), np.full(d, 1.0)])
        cov = m.build_gp_cov("matern52", phi, t, bandsize=bs, complexity=2)
        ll, grad = log_likelihood_and_gradient_banded(
            jnp.asarray(x), jnp.asarray(theta), jnp.asarray(sigma), y, cov,
            FN_SYSTEM.f, (1.0, 1.0, 1.0),
        )
        assert np.isfinite(float(ll))
        lls[bs] = float(ll)
    assert lls[0] != lls[n - 1]


def test_jit_and_dtype_float32():
    """The hot path compiles and runs in float32 (TPU mode)."""
    t, cov32_src, x, y = _setup(FN_SYSTEM)
    phi = np.vstack([np.full(2, 1.2), np.full(2, 1.0)])
    cov32 = m.build_gp_cov(
        "matern52", phi, t, bandsize=20, complexity=2, dtype=jnp.float32
    )
    data = make_likelihood_data(y, cov32, (1.0, 1.0, 1.0))
    fn = jax.jit(
        lambda xx, th, sg: log_posterior(xx, th, sg, data, FN_SYSTEM.f)
    )
    out = fn(
        jnp.asarray(x, jnp.float32),
        jnp.asarray([0.2, 0.2, 3.0], jnp.float32),
        jnp.asarray([0.3, 0.3], jnp.float32),
    )
    assert out.dtype == jnp.float32
    assert np.isfinite(float(out))
