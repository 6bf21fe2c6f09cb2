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


def test_general_matern_non_half_integer_raises():
    with pytest.raises(NotImplementedError):
        K.general_matern_k(1.0, 1.0, 1.0, 1.7)


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
