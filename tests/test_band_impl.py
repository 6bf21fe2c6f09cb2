"""Band-storage / Pallas execution-path tests: the three band_impl modes of
MagiTarget must agree on values and gradients (dense is ground truth)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import manifold_constrained_gaussian_process_inference_tpu as m
from manifold_constrained_gaussian_process_inference_tpu.inference.target import (
    MagiTarget,
)
from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM
from manifold_constrained_gaussian_process_inference_tpu.ops.band import (
    dense_to_band_storage,
    mat2band,
)
from manifold_constrained_gaussian_process_inference_tpu.ops.pallas_band import (
    band_matvec,
    transpose_band_storage,
)


def test_transpose_band_storage_roundtrip():
    rng = np.random.default_rng(0)
    n, b = 17, 3
    a = mat2band(rng.normal(size=(n, n)), b, b)
    bs = dense_to_band_storage(a, b)
    bst = transpose_band_storage(bs, b)
    # reconstruct A^T via matvec agreement
    x = rng.normal(size=n)
    got = np.asarray(
        band_matvec(jnp.asarray(bst)[None], jnp.asarray(bs)[None],
                    jnp.asarray(x)[None], b, False)
    )[0]
    assert np.allclose(got, a.T @ x, atol=1e-12)


def test_band_matvec_vjp_matches_dense():
    rng = np.random.default_rng(1)
    n, b, m_ = 23, 4, 3
    dense = np.stack([mat2band(rng.normal(size=(n, n)), b, b) for _ in range(m_)])
    bs = jnp.asarray(np.stack([dense_to_band_storage(a, b) for a in dense]))
    bst = jnp.asarray(
        np.stack([transpose_band_storage(np.asarray(s), b) for s in np.asarray(bs)])
    )
    xs = jnp.asarray(rng.normal(size=(m_, n)))

    def f_band(v):
        return jnp.sum(jnp.sin(band_matvec(bs, bst, v, b, False)))

    def f_dense(v):
        return jnp.sum(jnp.sin(jnp.einsum("mij,mj->mi", jnp.asarray(dense), v)))

    v1, g1 = jax.value_and_grad(f_band)(xs)
    v2, g2 = jax.value_and_grad(f_dense)(xs)
    assert np.allclose(float(v1), float(v2), rtol=1e-12)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-10)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    n, d = 40, 2
    t = np.linspace(0, 8, n)
    y = np.stack([np.sin(t), np.cos(t)], -1) + 0.15 * rng.normal(size=(n, d))
    y[5, 0] = np.nan
    phi = np.array([[1.5, 1.5], [1.0, 1.0]])
    cov = m.build_gp_cov("matern52", phi, t, bandsize=6, complexity=2, jitter=1e-6)
    psi = np.concatenate(
        [rng.normal(size=n * d) * 0.3, [0.2, 0.2, 3.0], np.log([0.2, 0.2])]
    )
    return y, cov, psi


def _target(y, cov, band_impl):
    return MagiTarget.build(
        y, cov, FN_SYSTEM, sigma_init=np.array([0.2, 0.2]),
        prior_temperature=(1.0, 1.0, 2.0), sigma_is_fixed=False,
        band_impl=band_impl,
    )


def test_band_impl_agrees_with_dense(problem):
    y, cov, psi = problem
    psi = jnp.asarray(psi)
    v_dense, g_dense = _target(y, cov, "dense").value_and_grad_fn()(psi)
    v_band, g_band = _target(y, cov, "band").value_and_grad_fn()(psi)
    assert np.isclose(float(v_dense), float(v_band), rtol=1e-10)
    assert np.allclose(np.asarray(g_dense), np.asarray(g_band), atol=1e-8)


def test_pallas_impl_on_cpu_falls_back(problem):
    """On non-TPU backends band_impl='pallas' routes to the XLA fallback and
    must still agree with dense."""
    y, cov, psi = problem
    psi = jnp.asarray(psi)
    v_dense, g_dense = _target(y, cov, "dense").value_and_grad_fn()(psi)
    v_pl, g_pl = _target(y, cov, "pallas").value_and_grad_fn()(psi)
    assert np.isclose(float(v_dense), float(v_pl), rtol=1e-10)
    assert np.allclose(np.asarray(g_dense), np.asarray(g_pl), atol=1e-8)


def test_pallas_kernel_interpret_mode(problem):
    """Run the actual Pallas kernel in interpreter mode (CPU) and compare."""
    from jax.experimental import pallas as pl  # noqa: F401

    import manifold_constrained_gaussian_process_inference_tpu.ops.pallas_band as pb

    rng = np.random.default_rng(5)
    n, b, m_ = 33, 5, 2
    dense = np.stack([mat2band(rng.normal(size=(n, n)), b, b) for _ in range(m_)])
    bs = jnp.asarray(np.stack([dense_to_band_storage(a, b) for a in dense]))
    xs = jnp.asarray(rng.normal(size=(m_, n)))

    from functools import partial
    import jax.experimental.pallas as plx

    kernel = partial(pb._band_matvec_kernel, bandwidth=b, n=n, m=m_)
    out = plx.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_, n), xs.dtype),
        interpret=True,
    )(bs, xs)
    want = np.einsum("mij,mj->mi", dense, np.asarray(xs))
    assert np.allclose(np.asarray(out), want, atol=1e-10)
