"""GP covariance engine: the TPU-native GPCov.

Counterpart of the reference's GPCov struct and builder
(/root/reference/src/gaussian_process.jl:14-54, 219-363), redesigned:

- Instead of a mutable per-dimension struct, covariances are a frozen PyTree
  with all D dimensions batched into (D, n, n) stacks, ready for batched
  einsum matvecs on the MXU.
- The one-time construction (kernel matrices, analytic derivatives, Cholesky
  inverses) runs on host in float64 via numpy/LAPACK — the reference's
  numerical hazards (Kphi condition numbers ~1e8, test/test_gp.jl:695-825)
  rule out doing this once-per-solve step in float32. Results are then cast
  to the working dtype (float32 on TPU) for the jit'd hot path.
- PositiveFactorizations' repair-Cholesky becomes a deterministic
  jitter-escalation with an eigenvalue-floor fallback (never throws).

Math (Documentation of Algorithm.pdf section 2; gaussian_process.jl:290-331):
  Cinv = (C + jitter I)^-1
  mphi = Cprime @ Cinv
  Kphi = Cdoubleprime - mphi @ Cprime^T + jitter I
  Kinv = Kphi^-1
Banded copies truncate Cinv/mphi/Kinv to the given bandwidth
(gaussian_process.jl:357-360).
"""
from __future__ import annotations

import logging
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from . import kernels as _kernels
from .band import mat2band

logger = logging.getLogger(__name__)


class GPCov(NamedTuple):
    """Batched GP covariance bundle for all D state dimensions.

    Shapes: phi (D, 2) [variance, lengthscale]; tvec (n,); dense matrices
    (D, n, n); mu/dotmu (D, n). *_band are band-masked dense copies (zeros
    outside the band) — bit-equivalent to the reference's BandedMatrix in
    every product. ``bandsize`` is a plain int (static).
    """

    phi: jnp.ndarray
    tvec: jnp.ndarray
    C: jnp.ndarray
    Cinv: jnp.ndarray
    Cprime: jnp.ndarray
    Cdoubleprime: jnp.ndarray
    mphi: jnp.ndarray
    Kphi: jnp.ndarray
    Kinv: jnp.ndarray
    Cinv_band: jnp.ndarray
    mphi_band: jnp.ndarray
    Kinv_band: jnp.ndarray
    Cinv_band_chol: jnp.ndarray
    Kinv_band_chol: jnp.ndarray
    mu: jnp.ndarray
    dotmu: jnp.ndarray
    bandsize: int

    @property
    def n_times(self) -> int:
        return self.tvec.shape[0]

    @property
    def n_dims(self) -> int:
        return self.C.shape[0]


def banded_cholesky(a_band: np.ndarray, bandwidth: int, max_tries: int = 10):
    """Lower Cholesky factor of a band-masked SPD matrix (host, float64).

    The factor of a matrix with bandwidth b is itself lower-banded with
    bandwidth b, so quadratic forms x' A x = ||L' x||^2 keep the O(n*b)
    structure. Truncating a PD matrix to a band can lose definiteness;
    repaired deterministically by escalating a relative diagonal jitter.
    Returns (L, jitter_used).

    Why factors at all: the hot path runs in float32 on TPU, and the MAGI
    derivative term e' Kinv e has Kinv entries ~1/jitter (Kphi condition
    numbers ~1e8, test_gp.jl:695-825). Computed via the inverse directly
    the f32 value loses ~1e-1 relative accuracy (measured); as a sum of
    squares it is accurate to ~n*eps.
    """
    a_band = np.asarray(a_band, dtype=np.float64)
    n = a_band.shape[0]
    scale = float(np.max(np.abs(np.diagonal(a_band)))) or 1.0
    for trial in range(max_tries):
        j = 0.0 if trial == 0 else scale * 1e-14 * (10.0 ** (trial - 1))
        try:
            chol = np.linalg.cholesky(a_band + j * np.eye(n))
            if j > 0:
                logger.warning(
                    "banded_cholesky: banded truncation lost definiteness; "
                    "repaired with relative jitter %.3e.", j / scale,
                )
            return mat2band(chol, bandwidth, 0), j
        except np.linalg.LinAlgError:
            continue
    # Last resort: shift the diagonal by |lambda_min| + margin. Keeps the
    # factor exactly banded (unlike an eigenvalue floor) so the dense and
    # band-storage execution paths stay bit-compatible. The shift changes
    # the truncated quadratic form — acceptable: aggressive truncation has
    # already left reference semantics (an indefinite "precision" matrix),
    # and full-band inputs never reach this path.
    sym = 0.5 * (a_band + a_band.T)
    lam_min = float(np.linalg.eigvalsh(sym).min())
    shift = max(0.0, -lam_min) + scale * 1e-10
    rel = shift / scale
    msg = (
        "banded_cholesky: diagonal-shift fallback engaged "
        "(lambda_min=%.3e, shift=%.3e, relative=%.2e)."
    )
    # Relative shifts below ~1e-6 are numerically invisible in the
    # quadratic forms; only larger ones deserve a warning.
    (logger.warning if rel > 1e-6 else logger.debug)(msg, lam_min, shift, rel)
    chol = np.linalg.cholesky(sym + shift * np.eye(n))
    return mat2band(chol, bandwidth, 0), shift


def robust_spd_inverse(a: np.ndarray, jitter: float, max_tries: int = 8):
    """Invert a symmetric matrix, repairing non-PD inputs deterministically.

    Equivalent role to cholesky(PositiveFactorizations.Positive, A) + inv
    (/root/reference/src/gaussian_process.jl:295-296,317-318): never raises.
    Strategy: Cholesky with jitter escalated x10 per retry; if that exhausts,
    eigenvalue-floor the matrix. Returns (inverse, effective_jitter).
    """
    a = np.asarray(a, dtype=np.float64)
    a = 0.5 * (a + a.T)
    n = a.shape[0]
    eye = np.eye(n)
    j = 0.0
    for trial in range(max_tries):
        j = 0.0 if trial == 0 else jitter * (10.0 ** (trial - 1))
        try:
            chol = np.linalg.cholesky(a + j * eye)
            inv_l = np.linalg.inv(chol)
            return inv_l.T @ inv_l, j
        except np.linalg.LinAlgError:
            continue
    # Eigenvalue floor fallback (always succeeds for symmetric input).
    w, v = np.linalg.eigh(a)
    floor = max(jitter, 1e-12 * max(np.max(np.abs(w)), 1.0))
    w = np.maximum(w, floor)
    logger.warning(
        "robust_spd_inverse: Cholesky failed after jitter escalation; "
        "using eigenvalue floor %.3e.", floor,
    )
    return (v / w) @ v.T, float("nan")


def calculate_gp_covariances(
    kernel_type: str,
    phi: np.ndarray,
    tvec: np.ndarray,
    bandsize: int,
    complexity: int = 0,
    jitter: float = 1e-7,
    check_eigenvalues: bool = True,
):
    """Single-dimension covariance build (host, float64). Returns dict of
    numpy arrays with the same fields as GPCov (minus batching).

    Parity: calculate_gp_covariances! (/root/reference/src/gaussian_process.jl:219-363).
    complexity >= 2 computes the full MAGI derivative blocks; otherwise
    mphi = 0 and Kphi falls back to jitter*I (:319-331).
    """
    tvec = np.asarray(tvec, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    variance, lengthscale = float(phi[0]), float(phi[1])
    n = tvec.shape[0]
    l = u = int(bandsize)

    if complexity >= 2:
        c, cprime, cdouble = _kernels.cov_blocks(kernel_type, tvec, variance, lengthscale)
    else:
        c = _kernels.kernel_matrix(kernel_type, tvec, variance, lengthscale)
        cprime = np.zeros_like(c)
        cdouble = np.zeros_like(c)

    derivatives_calculated = complexity >= 2 and (
        np.any(cprime != 0.0) or np.any(cdouble != 0.0)
    )

    c_jittered = 0.5 * (c + c.T) + jitter * np.eye(n)
    cinv, _ = robust_spd_inverse(c_jittered, jitter)

    if derivatives_calculated:
        mphi = cprime @ cinv
        kphi = cdouble - mphi @ cprime.T
        kphi = 0.5 * (kphi + kphi.T) + jitter * np.eye(n)
        if check_eigenvalues:
            min_eig = float(np.linalg.eigvalsh(kphi).min())
            if min_eig <= 0:
                logger.warning(
                    "Kphi (after jitter) still has non-positive eigenvalues "
                    "(min=%.3e, jitter=%.1e, phi=%s). Check derivatives or "
                    "increase jitter.", min_eig, jitter, phi,
                )
        kinv, _ = robust_spd_inverse(kphi, jitter)
    else:
        mphi = np.zeros_like(c)
        kphi = jitter * np.eye(n)
        kinv = (1.0 / jitter) * np.eye(n)

    cinv_band = mat2band(cinv, l, u)
    kinv_band = mat2band(kinv, l, u)
    cinv_band_chol, shift_c = banded_cholesky(cinv_band, l)
    kinv_band_chol, shift_k = banded_cholesky(kinv_band, l)
    # Relative PSD-repair magnitude: how far the banded factorization had to
    # move the truncated matrix. Large values mean the band is too narrow
    # for these hyperparameters (see build_gp_cov auto-escalation).
    scale_c = float(np.max(np.abs(np.diagonal(cinv_band)))) or 1.0
    scale_k = float(np.max(np.abs(np.diagonal(kinv_band)))) or 1.0
    band_repair_rel = max(shift_c / scale_c, shift_k / scale_k)

    return dict(
        band_repair_rel=band_repair_rel,
        phi=phi,
        tvec=tvec,
        C=c_jittered - jitter * np.eye(n),  # store un-jittered C like the reference
        Cinv=cinv,
        Cprime=cprime,
        Cdoubleprime=cdouble,
        mphi=mphi,
        Kphi=kphi,
        Kinv=kinv,
        Cinv_band=cinv_band,
        mphi_band=mat2band(mphi, l, u),
        Kinv_band=kinv_band,
        Cinv_band_chol=cinv_band_chol,
        Kinv_band_chol=kinv_band_chol,
        mu=np.zeros(n),
        dotmu=np.zeros(n),
        bandsize=int(bandsize),
    )


def build_gp_cov(
    kernel_type: str,
    phi_all: np.ndarray,
    tvec: np.ndarray,
    bandsize: int,
    complexity: int = 2,
    jitter: float = 1e-6,
    dtype: Optional[jnp.dtype] = None,
    check_eigenvalues: bool = True,
    auto_escalate_bandsize: bool = True,
    band_repair_tol: float = 1e-2,
) -> GPCov:
    """Build the batched GPCov for all dimensions.

    ``phi_all`` has shape (2, D) (reference layout, MagiJl.jl:165) —
    [variance; lengthscale] per dimension. Band size is clipped to n-1
    (parity: /root/reference/src/MagiJl.jl:459-461).

    Band-size auto-escalation: truncating the precision matrices to a band
    can lose positive-definiteness; the banded factorization repairs that
    with a diagonal shift, which moves the quadratic forms away from the
    reference's (indefinite) truncated semantics. When the relative repair
    shift exceeds ``band_repair_tol`` (default 1%) on any dimension, the
    band is widened (doubled, capped at n-1) and the build retried, with a
    warning — posterior parity beats the reference's silent indefinite
    sampling (likelihoods.jl:129-135). Disable with
    ``auto_escalate_bandsize=False`` to keep the requested band exactly.
    """
    phi_all = np.asarray(phi_all, dtype=np.float64)
    tvec = np.asarray(tvec, dtype=np.float64)
    n = tvec.shape[0]
    n_dims = phi_all.shape[1]
    bs = max(min(int(bandsize), n - 1), 0)
    if dtype is None:
        from ..config import default_dtype

        dtype = default_dtype()

    while True:
        per_dim = [
            calculate_gp_covariances(
                kernel_type, phi_all[:, d], tvec, bs,
                complexity=complexity, jitter=jitter,
                check_eigenvalues=check_eigenvalues,
            )
            for d in range(n_dims)
        ]
        max_rel = max(p["band_repair_rel"] for p in per_dim)
        if (
            not auto_escalate_bandsize
            or max_rel <= band_repair_tol
            or bs >= n - 1
        ):
            if max_rel > band_repair_tol:
                logger.warning(
                    "GPCov band repair shift %.2e exceeds tol %.1e at "
                    "bandsize %d%s; quadratic forms deviate from the exact "
                    "band-truncated semantics.", max_rel, band_repair_tol,
                    bs, "" if auto_escalate_bandsize else " (escalation off)",
                )
            break
        new_bs = min(max(2 * bs, bs + 10), n - 1)
        logger.warning(
            "GPCov: PSD repair shift %.2e at bandsize %d exceeds tol %.1e; "
            "escalating bandsize to %d for posterior parity.",
            max_rel, bs, band_repair_tol, new_bs,
        )
        bs = new_bs
    for p in per_dim:
        p.pop("band_repair_rel")

    def stack(key):
        return jnp.asarray(np.stack([p[key] for p in per_dim]), dtype=dtype)

    return GPCov(
        phi=jnp.asarray(phi_all.T, dtype=dtype),
        tvec=jnp.asarray(tvec, dtype=dtype),
        C=stack("C"),
        Cinv=stack("Cinv"),
        Cprime=stack("Cprime"),
        Cdoubleprime=stack("Cdoubleprime"),
        mphi=stack("mphi"),
        Kphi=stack("Kphi"),
        Kinv=stack("Kinv"),
        Cinv_band=stack("Cinv_band"),
        mphi_band=stack("mphi_band"),
        Kinv_band=stack("Kinv_band"),
        Cinv_band_chol=stack("Cinv_band_chol"),
        Kinv_band_chol=stack("Kinv_band_chol"),
        mu=stack("mu"),
        dotmu=stack("dotmu"),
        bandsize=bs,
    )
