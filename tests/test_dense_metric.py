"""Dense-metric NUTS + cross-chain pooled adaptation tests.

The reference uses AdvancedHMC's DiagEuclideanMetric only (samplers.jl:144);
the dense metric and its cross-chain pooled estimation are TPU-native
extensions (inference/nuts.py DenseMetric, parallel/chains.py
mass_matrix="dense-pooled")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.inference.nuts import (
    DenseMetric,
    _draw_momentum,
    _kinetic,
    run_nuts,
)
from manifold_constrained_gaussian_process_inference_tpu.parallel.chains import (
    make_chain_mesh,
    run_chains,
)

pytestmark = pytest.mark.slow  # heavy sampler E2E; fast suite = -m "not slow"

N_DEV = len(jax.devices())


def _corr_gaussian(dim=8, rho=0.95):
    """Strongly equicorrelated Gaussian: the worst case for a diagonal
    metric (unit marginals, one long principal axis)."""
    cov = np.full((dim, dim), rho) + (1 - rho) * np.eye(dim)
    prec = np.linalg.inv(cov)
    prec_j = jnp.asarray(prec)

    def vg(q):
        return jax.value_and_grad(lambda x: -0.5 * x @ prec_j @ x)(q)

    return vg, cov


def test_dense_identity_matches_diag_unit():
    """DenseMetric(I, I) must reproduce the diagonal unit-metric sampler
    bitwise (identical momentum draws and leapfrog arithmetic paths are not
    guaranteed to fuse identically, so compare trajectories loosely)."""
    vg, _ = _corr_gaussian(dim=4, rho=0.5)
    q0 = jnp.zeros(4)
    key = jax.random.PRNGKey(0)
    s_diag, _ = run_nuts(vg, q0, key, 120, 60, initial_step_size=0.3)
    eye = jnp.eye(4)

    from manifold_constrained_gaussian_process_inference_tpu.inference import nuts

    # Drive nuts_transition directly under both metrics from one state.
    logp0, grad0 = vg(q0)
    k = jax.random.PRNGKey(1)
    qd, ld, _, _ = nuts.nuts_transition(
        vg, q0, logp0, grad0, k, jnp.asarray(0.3), jnp.ones(4)
    )
    qD, lD, _, _ = nuts.nuts_transition(
        vg, q0, logp0, grad0, k, jnp.asarray(0.3),
        DenseMetric(minv=eye, chol_minv=eye),
    )
    np.testing.assert_allclose(np.asarray(qd), np.asarray(qD), rtol=1e-12)
    np.testing.assert_allclose(float(ld), float(lD), rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(s_diag)))


def test_momentum_draw_covariance_matches_mass():
    """p ~ N(0, M) with M = (L L^T)^{-1}: sample covariance of the draws
    must match M, and kinetic energy must equal 0.5 p' Minv p."""
    rng = np.random.default_rng(3)
    a = rng.normal(size=(3, 3))
    minv = a @ a.T + 3.0 * np.eye(3)
    metric = DenseMetric(
        minv=jnp.asarray(minv), chol_minv=jnp.asarray(np.linalg.cholesky(minv))
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 40000)
    draws = jax.vmap(lambda k: _draw_momentum(k, jnp.zeros(3), metric))(keys)
    emp = np.cov(np.asarray(draws).T)
    np.testing.assert_allclose(emp, np.linalg.inv(minv), atol=0.02)
    p = np.asarray(draws[0])
    np.testing.assert_allclose(
        float(_kinetic(jnp.asarray(p), metric)),
        0.5 * p @ minv @ p, rtol=1e-10,
    )


def test_pooled_dense_beats_diag_on_correlated_gaussian():
    """On a 0.99-equicorrelated Gaussian (condition number ~1.6e3 — a long
    ridge, the geometry a per-chain diagonal cannot see) the pooled dense
    metric must (a) recover the target covariance and (b) need far fewer
    leapfrogs per iteration than the diagonal adaptation."""
    dim = 16
    vg, cov = _corr_gaussian(dim=dim, rho=0.99)
    n_chains = 8
    psi0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_chains, dim)) * 0.1
    )
    keys = jax.random.split(jax.random.PRNGKey(2), n_chains)

    s_dense, info_dense = run_chains(
        vg, psi0, keys, n_samples=900, n_adapts=500,
        initial_step_size=0.2, mass_matrix="dense-pooled",
    )
    s_diag, info_diag = run_chains(
        vg, psi0, keys, n_samples=900, n_adapts=500,
        initial_step_size=0.2, mass_matrix="diag",
    )
    assert info_dense["metric"] == "dense-pooled"
    assert info_dense["inv_mass"].shape == (dim, dim)
    # (a) moments: pooled metric run recovers the strong correlation.
    flat = np.asarray(s_dense).reshape(-1, dim)
    emp = np.cov(flat.T)
    assert abs(emp[0, 1] - 0.99) < 0.15
    assert np.all(np.abs(flat.mean(0)) < 0.2)
    # The learned metric itself must capture the equicorrelation.
    learned = np.asarray(info_dense["inv_mass"])
    assert learned[0, 1] > 0.5
    # (b) efficiency along the ridge: under a diagonal metric trajectories
    # U-turn on the tight directions (eigenvalue 0.01) long before they
    # traverse the long axis (eigenvalue ~16), so the slow-direction ESS
    # per leapfrog craters; the dense metric whitens the ridge away.
    from manifold_constrained_gaussian_process_inference_tpu.postprocess.diagnostics import (
        ess,
    )

    long_axis = np.ones(dim) / np.sqrt(dim)  # principal eigenvector
    proj_dense = np.asarray(s_dense) @ long_axis  # (C, S)
    proj_diag = np.asarray(s_diag) @ long_axis
    eff_dense = ess(proj_dense) / float(np.sum(info_dense["num_leapfrog"]))
    eff_diag = ess(proj_diag) / float(np.sum(info_diag["num_leapfrog"]))
    assert eff_dense > 3.0 * eff_diag, (eff_dense, eff_diag)


def test_pooled_dense_on_mesh_matches_single_device():
    """shard_map path executes and stays statistically sane."""
    if N_DEV < 2:
        pytest.skip("needs >= 2 devices")
    vg, _ = _corr_gaussian(dim=4, rho=0.9)
    mesh = make_chain_mesh(N_DEV)
    psi0 = jnp.zeros((N_DEV, 4))
    keys = jax.random.split(jax.random.PRNGKey(5), N_DEV)
    s, info = run_chains(
        vg, psi0, keys, n_samples=400, n_adapts=200,
        initial_step_size=0.2, mass_matrix="dense-pooled", mesh=mesh,
    )
    assert s.shape == (N_DEV, 200, 4)
    flat = np.asarray(s).reshape(-1, 4)
    assert np.all(np.isfinite(flat))
    assert np.all(np.abs(flat.mean(0)) < 0.3)


def test_pooled_metric_divergence_aware():
    """_pooled_dense_metric drops divergent window draws and refuses
    windows dominated by divergences (VERDICT r2 item 4: one bad window
    adopting a mid-pathology covariance poisoned the seed-7 run)."""
    from manifold_constrained_gaussian_process_inference_tpu.parallel.chains import (
        _pooled_dense_metric,
    )

    dim = 4
    rng = np.random.default_rng(0)
    eye = jnp.eye(dim)
    prev = DenseMetric(minv=2.0 * eye, chol_minv=np.sqrt(2.0) * eye)

    # Healthy draws ~ N(0, I); divergent iterations frozen at a far-off
    # boundary point (the sticky-reject signature).
    c, L = 4, 200
    qs = rng.normal(size=(c, L, dim))
    div = np.zeros((c, L), bool)
    div[:, ::4] = True  # 25% divergent
    qs[div] = 40.0      # boundary-stuck repeats would wreck the covariance

    m = _pooled_dense_metric([qs], [np.ones(L, bool)], dim, jnp.float64,
                             prev, [div])
    # Divergent draws dropped -> estimate is near the healthy identity,
    # not inflated by the 40-offset repeats.
    assert float(jnp.max(jnp.abs(m.minv - eye))) < 0.5

    # A window where most draws diverged keeps the previous metric.
    div_heavy = np.ones((c, L), bool)
    div_heavy[:, : L // 4] = False
    m2 = _pooled_dense_metric([qs], [np.ones(L, bool)], dim, jnp.float64,
                              prev, [div_heavy])
    assert m2 is prev

    # Without divergence info the contaminated draws poison the estimate
    # (the pre-fix behavior this test pins down).
    m3 = _pooled_dense_metric([qs], [np.ones(L, bool)], dim, jnp.float64,
                              prev)
    assert float(jnp.max(jnp.abs(m3.minv - eye))) > 10.0


def test_pooled_moments_match_sample_pooling():
    """The device-accumulated moment path (pooled_dense_metric_from_moments)
    must reproduce the host sample-pooling estimator exactly (f64): same
    divergence-masked covariance, same shrinkage, same keep-previous
    policies."""
    from manifold_constrained_gaussian_process_inference_tpu.parallel.chains import (
        _pooled_dense_metric,
        pooled_dense_metric_from_moments,
    )

    rng = np.random.default_rng(5)
    c, L, dim = 6, 40, 5
    qs = rng.normal(size=(c, L, dim)) * 1.3 + 0.4
    iw = np.ones(L, bool)
    iw[:7] = False                      # some out-of-window draws
    div = rng.random((c, L)) < 0.1      # some divergent draws
    prev = DenseMetric(minv=jnp.eye(dim), chol_minv=jnp.eye(dim))

    ref = _pooled_dense_metric([qs], [iw], dim, jnp.float64, prev,
                               window_div=[div])

    w = iw[None, :].astype(float) * (~div).astype(float)
    qm = qs * w[:, :, None]
    cnt = w.sum()
    s1 = qm.sum(axis=(0, 1))
    s2 = np.einsum("cld,cle->de", qm, qs)
    n_win = float(iw.sum() * c)
    n_div = float((div & iw[None, :]).sum())
    got = pooled_dense_metric_from_moments(
        [(cnt, s1, s2, n_win, n_div)], dim, jnp.float64, prev
    )
    np.testing.assert_allclose(
        np.asarray(got.minv), np.asarray(ref.minv), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(got.chol_minv), np.asarray(ref.chol_minv),
        rtol=1e-10, atol=1e-12,
    )

    # mostly-divergent window -> previous metric kept (policy parity)
    div_all = np.ones((c, L), bool)
    kept = pooled_dense_metric_from_moments(
        [(0.0, 0 * s1, 0 * s2, n_win, n_win)], dim, jnp.float64, prev
    )
    assert kept is prev
    assert _pooled_dense_metric([qs], [iw], dim, jnp.float64, prev,
                                window_div=[div_all]) is prev
