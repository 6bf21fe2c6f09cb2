"""NLML initialization tests — mirrors test coverage of
/root/reference/src/initialization.jl: objective value vs a direct dense
computation, NaN subsetting equivalence, recovery of known hyperparameters,
and the fall-back-to-initial-guess path."""
import jax.numpy as jnp
import numpy as np

from manifold_constrained_gaussian_process_inference_tpu.inference.nlml import (
    default_initial_guesses,
    negative_log_marginal_likelihood,
    optimize_gp_hyperparameters,
)
from manifold_constrained_gaussian_process_inference_tpu.ops import kernels as K


def _direct_nlml(log_params, y, t, jitter=1e-6):
    var, ell, sig = np.exp(log_params)
    n = len(y)
    kmat = np.asarray(K.kernel_matrix("matern52", t, var, ell))
    kfull = kmat + (sig**2 + jitter) * np.eye(n)
    sign, logdet = np.linalg.slogdet(kfull)
    quad = y @ np.linalg.solve(kfull, y)
    return 0.5 * (logdet + quad + n * np.log(2 * np.pi))


def test_nlml_matches_direct_dense():
    rng = np.random.default_rng(0)
    n = 25
    t = np.linspace(0, 3, n)
    y = np.sin(2 * t) + 0.1 * rng.normal(size=n)
    lp = np.log(np.array([1.2, 0.7, 0.15]))
    got = float(
        negative_log_marginal_likelihood(
            jnp.asarray(lp), jnp.asarray(y), jnp.ones(n), jnp.asarray(t), "matern52"
        )
    )
    assert np.isclose(got, _direct_nlml(lp, y, t), rtol=1e-10)


def test_nlml_nan_masking_equals_subsetting():
    """Masked-covariance identity == explicit subsetting
    (initialization.jl:91-99)."""
    rng = np.random.default_rng(1)
    n = 20
    t = np.linspace(0, 3, n)
    y = np.cos(t) + 0.1 * rng.normal(size=n)
    miss = np.array([2, 7, 13])
    mask = np.ones(n)
    mask[miss] = 0.0
    yf = y.copy()
    yf[miss] = 0.0
    lp = np.log(np.array([0.8, 0.5, 0.2]))
    got = float(
        negative_log_marginal_likelihood(
            jnp.asarray(lp), jnp.asarray(yf), jnp.asarray(mask), jnp.asarray(t),
            "matern52",
        )
    )
    keep = mask.astype(bool)
    want = _direct_nlml(lp, y[keep], t[keep])
    assert np.isclose(got, want, rtol=1e-8)


def test_optimizer_recovers_noise_scale():
    """On data from a known GP + noise, the optimized sigma lands near truth
    (loose — same spirit as the reference's E2E sigma tolerance +-0.3)."""
    rng = np.random.default_rng(2)
    n = 60
    t = np.linspace(0, 6, n)
    kmat = np.asarray(K.kernel_matrix("matern52", t, 2.0, 1.0))
    f = np.linalg.cholesky(kmat + 1e-10 * np.eye(n)) @ rng.normal(size=n)
    sigma_true = 0.3
    y = (f + sigma_true * rng.normal(size=n))[:, None]
    res = optimize_gp_hyperparameters(y, t, "matern52", max_iters=80)
    assert res.shape == (1, 3)
    var, ell, sig = res[0]
    assert 0.1 < sig < 0.6
    assert 0.2 < ell < 5.0
    assert np.all(res > 0)


def test_fallback_on_degenerate_data():
    """All-NaN dimension must fall back to the initial guess
    (initialization.jl:242-248 / Inf objective path)."""
    n = 15
    t = np.linspace(0, 2, n)
    y = np.full((n, 2), np.nan)
    y[:, 0] = np.sin(t)
    guesses = default_initial_guesses(y, t)
    res = optimize_gp_hyperparameters(y, t, "matern52", max_iters=20)
    assert np.allclose(res[1], np.exp(guesses[1]))
    assert np.all(np.isfinite(res))


def test_tolerance_early_stop():
    """gpOptimFTol/GTol parity (MagiJl.jl:266-271): a loose gtol stops the
    L-BFGS scan early (iters_used < max_iters) without changing the
    optimum materially, and the stopped optimum equals a fresh run capped
    at the stopping iteration."""
    import jax

    from manifold_constrained_gaussian_process_inference_tpu.inference.nlml import (
        _lbfgs_minimize,
    )
    from manifold_constrained_gaussian_process_inference_tpu.ops import (
        kernels as K,
    )

    rng = np.random.default_rng(4)
    n = 40
    t = np.linspace(0, 4, n)
    kmat = np.asarray(K.kernel_matrix("matern52", t, 1.5, 0.8))
    y = np.linalg.cholesky(kmat + 1e-10 * np.eye(n)) @ rng.normal(size=n)
    y = y + 0.2 * rng.normal(size=n)
    lp0 = jnp.asarray(np.log([1.0, 0.5, 0.3]))

    fun = lambda lp: negative_log_marginal_likelihood(
        lp, jnp.asarray(y), jnp.ones(n), jnp.asarray(t), "matern52"
    )
    run = jax.jit(
        lambda gtol: _lbfgs_minimize(fun, lp0, 100, ftol=0.0, gtol=gtol)
    )
    p_tight, v_tight, _, it_tight = run(1e-12)
    p_loose, v_loose, _, it_loose = run(1e-2)
    assert int(it_loose) < int(it_tight) <= 100
    # Loose-tolerance stop is still essentially converged on this problem.
    assert float(v_loose) <= float(v_tight) + 0.05 * abs(float(v_tight))
    # The frozen tail of the scan is a true no-op: the best value at the
    # loose stop matches the tight trajectory's value at that iteration.
    _, _, trace_tight, _ = run(1e-12)
    assert float(v_loose) <= float(np.min(np.asarray(trace_tight))) + 0.5


def test_show_trace_logs(caplog):
    """gpOptimShowTrace parity: show_trace=True emits per-dimension NLML
    traces at INFO level."""
    import logging

    rng = np.random.default_rng(5)
    t = np.linspace(0, 3, 25)
    y = (np.sin(t) + 0.1 * rng.normal(size=25))[:, None]
    with caplog.at_level(
        logging.INFO,
        logger="manifold_constrained_gaussian_process_inference_tpu.inference.nlml",
    ):
        optimize_gp_hyperparameters(
            y, t, "matern52", max_iters=15, show_trace=True
        )
    assert any("NLML dim 0" in r.getMessage() for r in caplog.records)


def test_default_guesses_match_reference_recipe():
    """log var, log(range/10), log(1.4826 MAD) (MagiJl.jl:279-293)."""
    rng = np.random.default_rng(3)
    t = np.linspace(0, 20, 50)
    y = rng.normal(size=(50, 1)) * 2 + 1
    g = default_initial_guesses(y, t)
    valid = y[:, 0]
    assert np.isclose(g[0, 0], np.log(max(np.var(valid, ddof=1), 1e-4)))
    assert np.isclose(g[0, 1], np.log(2.0))
    mad = np.median(np.abs(valid - np.median(valid))) * 1.4826
    assert np.isclose(
        g[0, 2], np.log(max(mad, 1e-3 * (valid.max() - valid.min()), 1e-4))
    )
