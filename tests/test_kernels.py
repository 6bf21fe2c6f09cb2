"""Kernel layer tests — transplants the invariants of the reference's
test/test_kernels.jl (closed-form values, PSD, symmetry, decay) onto the
TPU-native kernel module."""
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.ops import kernels as K


def test_rbf_closed_form_values():
    # k(0) = var; k(r) = var * exp(-r^2 / (2 l^2))  (test_kernels.jl:29-48)
    var, ell = 2.5, 0.7
    assert np.isclose(K.rbf_k(0.0, var, ell), var)
    for r in [0.1, 0.5, 1.3]:
        assert np.isclose(K.rbf_k(r, var, ell), var * np.exp(-(r**2) / (2 * ell**2)))


def test_matern52_closed_form_values():
    # (test_kernels.jl:62-85)
    var, ell = 1.2, 0.9
    s5 = np.sqrt(5.0)
    assert np.isclose(K.matern52_k(0.0, var, ell), var)
    for r in [0.05, 0.4, 2.0]:
        z = s5 * r / ell
        expected = var * (1 + z + z**2 / 3) * np.exp(-z)
        assert np.isclose(K.matern52_k(r, var, ell), expected)


def test_general_matern_special_cases():
    # nu=1/2 -> exponential; nu=5/2 -> matern52 (test_kernels.jl:88-211)
    var, ell = 0.8, 1.1
    r = np.linspace(0, 3, 17)
    k_half = K.general_matern_k(r, var, ell, 0.5)
    assert np.allclose(k_half, var * np.exp(-r / ell))
    k_52 = K.general_matern_k(r, var, ell, 2.5)
    assert np.allclose(k_52, K.matern52_k(r, var, ell), rtol=1e-12)
    k_32 = K.general_matern_k(r, var, ell, 1.5)
    z = np.sqrt(3.0) * r / ell
    assert np.allclose(k_32, var * (1 + z) * np.exp(-z))


def test_general_matern_arbitrary_nu_bessel_identity():
    # The Bessel-K form must agree with the half-integer closed forms when
    # evaluated at nu arbitrarily close to a half-integer (continuity in nu),
    # matching the reference's arbitrary-nu support (kernels.jl:109-118).
    var, ell = 0.8, 1.1
    r = np.linspace(0, 3, 17)
    for nu in [0.5, 1.5, 2.5]:
        k_closed = K.general_matern_k(r, var, ell, nu)
        k_bessel = K.general_matern_k(r, var, ell, nu + 1e-9)
        assert np.allclose(k_bessel, k_closed, rtol=1e-6)


def test_general_matern_non_half_integer_numpy():
    # nu = 2.0 on the host path: k(0) = var, symmetric PSD matrix, decay.
    var, ell = 1.3, 0.9
    r = np.linspace(0, 4, 9)
    k = np.asarray(K.general_matern_k(r, var, ell, 2.0))
    assert np.isclose(k[0], var)
    assert np.all(np.isfinite(k))
    assert np.all(np.diff(k) < 0)  # monotone decay in r
    # Sandwiched between the rougher (1.5) and smoother (2.5) neighbours
    # (the kernel is monotone in nu at fixed r, with the orientation
    # flipping between the near field and the tail).
    k15 = np.asarray(K.general_matern_k(r, var, ell, 1.5))
    k25 = np.asarray(K.general_matern_k(r, var, ell, 2.5))
    lo = np.minimum(k15, k25)
    hi = np.maximum(k15, k25)
    assert np.all(k >= lo - 1e-12) and np.all(k <= hi + 1e-12)

    t = np.sort(np.random.default_rng(3).uniform(0, 4, size=20))
    c = np.asarray(K.kernel_matrix("matern-2.0", t, var, ell))
    assert np.allclose(c, c.T)
    assert np.linalg.eigvalsh(c).min() > -1e-8


def test_general_matern_non_half_integer_jit_grad():
    # The traced path (pure_callback + custom JVP) must produce finite values
    # and gradients under jit — this is what the NLML optimizer needs.
    import jax
    import jax.numpy as jnp

    t = jnp.linspace(0.0, 2.0, 7)

    @jax.jit
    def f(log_ell):
        c = K.kernel_matrix("matern-2.0", t, 1.0, jnp.exp(log_ell))
        return jnp.sum(c)

    v, g = jax.value_and_grad(f)(jnp.asarray(0.1))
    assert np.isfinite(float(v)) and np.isfinite(float(g))
    # Gradient check against central differences.
    eps = 1e-5
    fd = (float(f(0.1 + eps)) - float(f(0.1 - eps))) / (2 * eps)
    assert np.isclose(float(g), fd, rtol=1e-4)


def test_nlml_runs_with_arbitrary_nu():
    from manifold_constrained_gaussian_process_inference_tpu.inference.nlml import (
        optimize_gp_hyperparameters,
    )

    rng = np.random.default_rng(0)
    t = np.linspace(0, 10, 31)
    y = np.sin(t)[:, None] + 0.1 * rng.normal(size=(31, 1))
    out = optimize_gp_hyperparameters(y, t, "matern-2.0", max_iters=20)
    assert out.shape == (1, 3)
    assert np.all(np.isfinite(out)) and np.all(out > 0)


def test_general_matern_invalid_nu_raises():
    with pytest.raises(ValueError):
        K.general_matern_k(1.0, 1.0, 1.0, -1.0)
    with pytest.raises(ValueError):
        K.parse_kernel_type("matern-0")


@pytest.mark.parametrize("ktype", ["matern52", "rbf"])
def test_kernel_matrix_psd_symmetric_diag(ktype):
    t = np.sort(np.random.default_rng(0).uniform(0, 4, size=25))
    var, ell = 1.7, 0.6
    c = np.asarray(K.kernel_matrix(ktype, t, var, ell))
    assert np.allclose(c, c.T)
    assert np.allclose(np.diag(c), var)
    eig = np.linalg.eigvalsh(c)
    assert eig.min() > -1e-8
    # distance decay
    assert c[0, -1] < c[0, 1]


def test_unsupported_kernel_raises():
    with pytest.raises(ValueError):
        K.kernel_matrix("cosine", np.linspace(0, 1, 5), 1.0, 1.0)
