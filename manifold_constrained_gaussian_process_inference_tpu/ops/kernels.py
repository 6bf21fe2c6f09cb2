"""GP kernels and their analytic time-derivative cross-covariances.

TPU-native counterpart of the reference's kernel layer:
- kernel factories            /root/reference/src/kernels.jl:42-118
- Matern-5/2 derivative forms /root/reference/src/gaussian_process.jl:78-123
- RBF derivative forms        /root/reference/src/gaussian_process.jl:128-154

Instead of kernel *objects* composed at runtime (KernelFunctions.jl), kernels
here are closed-form functions over the pairwise time-difference grid,
vectorized so XLA fuses the whole C/C'/C'' construction into a handful of
elementwise kernels. Every function accepts either numpy or jax.numpy arrays
(the math is pure elementwise algebra): the one-time float64 host setup path
calls them with numpy, the jit'd NLML optimizer calls them with traced jnp
arrays.

Conventions (matching the reference):
- ``C[i, j]     = k(t_i, t_j)``
- ``Cprime[i,j] = d k(t_i, t_j) / d t_i``            (anti-symmetric, zero diag)
- ``Cdoubleprime[i,j] = d^2 k(t_i, t_j) / dt_i dt_j`` (symmetric)
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax.numpy as jnp
import numpy as np

SQRT5 = math.sqrt(5.0)

_SUPPORTED_KERNELS = ("matern52", "rbf")


def _xp(*arrays):
    """Pick the array namespace: numpy if all inputs are plain numpy/python."""
    for a in arrays:
        if not isinstance(a, (np.ndarray, float, int, np.floating, np.integer)):
            return jnp
    return np


# ---------------------------------------------------------------------------
# Kernel values k(r) as a function of distance r >= 0
# ---------------------------------------------------------------------------

def matern52_k(r, variance, lengthscale):
    """Matern-5/2: sigma^2 (1 + sqrt5 r/l + 5 r^2/(3 l^2)) exp(-sqrt5 r/l).

    Parity: /root/reference/src/kernels.jl:74-81.
    """
    xp = _xp(r, variance, lengthscale)
    s = SQRT5 * r / lengthscale
    return variance * (1.0 + s + s * s / 3.0) * xp.exp(-s)


def rbf_k(r, variance, lengthscale):
    """Squared-exponential: sigma^2 exp(-r^2 / (2 l^2)).

    Parity: /root/reference/src/kernels.jl:42-50.
    """
    xp = _xp(r, variance, lengthscale)
    return variance * xp.exp(-0.5 * (r / lengthscale) ** 2)


def _bessel_kv(nu: float, z):
    """Modified Bessel K_nu(z) for a STATIC order nu and array argument z.

    numpy inputs go straight to scipy (the host f64 setup path). Traced jax
    inputs go through a pure_callback with a custom JVP using the recurrence
    d/dz K_nu(z) = -(K_{nu-1}(z) + K_{nu+1}(z)) / 2, so the jit'd NLML
    optimizer can differentiate through arbitrary-nu Matern kernels.
    """
    import scipy.special as _sps

    if isinstance(z, np.ndarray):
        return _sps.kv(nu, z)
    return _bessel_kv_jax(float(nu))(z)


def _bessel_kv_jax(nu: float):
    import jax
    import scipy.special as _sps

    cache = _bessel_kv_jax.__dict__.setdefault("_cache", {})
    if nu in cache:
        return cache[nu]

    @jax.custom_jvp
    def kv(z):
        def host(x):
            x = np.asarray(x)
            return _sps.kv(nu, x.astype(np.float64)).astype(x.dtype)

        return jax.pure_callback(
            host,
            jax.ShapeDtypeStruct(jnp.shape(z), jnp.result_type(z)),
            z,
            vmap_method="broadcast_all",
        )

    @kv.defjvp
    def kv_jvp(primals, tangents):
        (z,), (zdot,) = primals, tangents
        dk = -0.5 * (_bessel_kv_jax(nu - 1.0)(z) + _bessel_kv_jax(nu + 1.0)(z))
        return kv(z), dk * zdot

    cache[nu] = kv
    return kv


def general_matern_k(r, variance, lengthscale, nu):
    """General Matern kernel for arbitrary nu > 0.

    Parity: /root/reference/src/kernels.jl:109-118 —

        k(r) = sigma^2 (2^{1-nu}/Gamma(nu)) z^nu K_nu(z),  z = sqrt(2 nu) r / l.

    Half-integer nu (1/2, 3/2, 5/2, ...) uses the exact closed form

        k(r) = sigma^2 exp(-z) (p!/(2p)!) sum_{i=0}^p (p+i)!/(i!(p-i)!) (2z)^{p-i}

    with p = nu - 1/2 (cheaper and exact); other nu use modified-Bessel-K
    evaluation — scipy on the host setup path, a differentiable
    pure_callback under jit (see ``_bessel_kv``). ``nu`` must be a static
    Python number (it selects the formula at trace time).
    """
    nu = float(nu)
    if nu <= 0:
        raise ValueError(f"Matern smoothness nu must be positive; got {nu}.")
    two_nu = 2.0 * nu
    p_float = nu - 0.5
    p = int(round(p_float))
    xp = _xp(r, variance, lengthscale)
    if abs(p_float - p) <= 1e-12 and p >= 0:
        z = math.sqrt(two_nu) * r / lengthscale
        prefac = math.factorial(p) / math.factorial(2 * p)
        acc = 0.0
        for i in range(p + 1):
            coef = math.factorial(p + i) / (
                math.factorial(i) * math.factorial(p - i)
            )
            acc = acc + coef * (2.0 * z) ** (p - i)
        return variance * prefac * xp.exp(-z) * acc
    # Arbitrary nu: Bessel-K form. K_nu diverges at z=0 while z^nu -> 0;
    # the limit of the product is Gamma(nu) 2^{nu-1}, i.e. k(0) = variance.
    # Double-where keeps both the value and the gradient finite at r=0
    # (the true dk/dr at 0 is 0 for nu > 1/2).
    z = math.sqrt(two_nu) * r / lengthscale
    z_safe = xp.where(z > 0, z, 1.0)
    coef = 2.0 ** (1.0 - nu) / math.gamma(nu)
    k_off = variance * coef * z_safe**nu * _bessel_kv(nu, z_safe)
    return xp.where(z > 0, k_off, variance)


# ---------------------------------------------------------------------------
# Pairwise covariance matrices on a time grid
# ---------------------------------------------------------------------------

def _tdiff(tvec):
    t = tvec.reshape(-1, 1)
    return t - t.T  # (n, n), entry [i, j] = t_i - t_j


def parse_kernel_type(kernel_type: str):
    """Normalize a kernel spec. "matern52" | "rbf" | "matern-<nu>" (general
    Matern with arbitrary nu > 0, e.g. "matern-1.5", "matern-2.0").
    Returns (name, nu_or_None)."""
    if kernel_type in _SUPPORTED_KERNELS:
        return kernel_type, None
    if kernel_type.startswith("matern-"):
        nu = float(kernel_type.split("-", 1)[1])
        if nu <= 0:
            raise ValueError(f"Matern nu must be positive; got {nu}.")
        return "matern", nu
    raise ValueError(
        f"Unsupported kernel type '{kernel_type}'. Supported: "
        f"{_SUPPORTED_KERNELS} or 'matern-<nu>' with nu > 0."
    )


def kernel_matrix(kernel_type: str, tvec, variance, lengthscale):
    """Dense covariance C[i,j] = k(|t_i - t_j|)."""
    xp = _xp(tvec, variance, lengthscale)
    r = xp.abs(_tdiff(tvec))
    name, nu = parse_kernel_type(kernel_type)
    if name == "matern52":
        return matern52_k(r, variance, lengthscale)
    if name == "rbf":
        return rbf_k(r, variance, lengthscale)
    return general_matern_k(r, variance, lengthscale, nu)


def matern52_cov_blocks(tvec, variance, lengthscale) -> Tuple:
    """C, Cprime, Cdoubleprime for the Matern-5/2 kernel, fully vectorized.

    Closed forms match /root/reference/src/gaussian_process.jl:78-123:
      Cprime[i,j]       = -sign(dt) sigma^2 e^{-sqrt5 d/l} (5d/(3l^2) + 5 sqrt5 d^2/(3 l^3))
      Cdoubleprime[i,j] = sigma^2 [ -sqrt5/l e (...) + e (5/(3l^2) + 10 sqrt5 d/(3l^3)) ]
      Cdoubleprime[i,i] = 5 sigma^2 / (3 l^2)
    (the diagonal falls out of the off-diagonal formula at d=0 as well).
    """
    xp = _xp(tvec, variance, lengthscale)
    l = lengthscale
    dt = _tdiff(tvec)
    d = xp.abs(dt)
    sgn = xp.sign(dt)
    e = xp.exp(-SQRT5 * d / l)

    c = matern52_k(d, variance, lengthscale)

    base = 5.0 * d / (3.0 * l**2) + 5.0 * SQRT5 * d * d / (3.0 * l**3)
    cprime = -sgn * variance * e * base
    cdouble = variance * (
        -SQRT5 / l * e * base + e * (5.0 / (3.0 * l**2) + 10.0 * SQRT5 * d / (3.0 * l**3))
    )
    return c, cprime, cdouble


def rbf_cov_blocks(tvec, variance, lengthscale) -> Tuple:
    """C, Cprime, Cdoubleprime for the RBF kernel.

    Parity: /root/reference/src/gaussian_process.jl:128-154:
      Cprime[i,j]       = -C[i,j] * dt / l^2
      Cdoubleprime[i,j] =  C[i,j] * (1/l^2 - dt^2 / l^4)
    """
    xp = _xp(tvec, variance, lengthscale)
    dt = _tdiff(tvec)
    c = rbf_k(xp.abs(dt), variance, lengthscale)
    l2 = lengthscale**2
    cprime = -c * dt / l2
    cdouble = c * (1.0 / l2 - dt * dt / (l2 * l2))
    return c, cprime, cdouble


def cov_blocks(kernel_type: str, tvec, variance, lengthscale) -> Tuple:
    """Dispatch to the analytic C/C'/C'' construction for a kernel type.

    Kernels without implemented derivatives mirror the reference's fallback
    (zero Cprime/Cdoubleprime -> Kphi collapses to jitter*I downstream;
    /root/reference/src/gaussian_process.jl:264-288, 319-331).
    """
    if kernel_type == "matern52":
        return matern52_cov_blocks(tvec, variance, lengthscale)
    if kernel_type == "rbf":
        return rbf_cov_blocks(tvec, variance, lengthscale)
    # Parity with the reference's unsupported-derivative fallback: C is
    # computed, C'/C'' stay zero (gaussian_process.jl:264-288) and Kphi
    # collapses to jitter*I downstream.
    import warnings

    warnings.warn(
        f"Time-derivative blocks not implemented for kernel "
        f"'{kernel_type}'; derivatives set to zero (Kphi -> jitter*I).",
        stacklevel=2,
    )
    xp = _xp(tvec, variance, lengthscale)
    c = kernel_matrix(kernel_type, tvec, variance, lengthscale)
    z = xp.zeros_like(c)
    return c, z, z
