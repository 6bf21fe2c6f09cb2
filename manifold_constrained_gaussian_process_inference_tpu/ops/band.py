"""Band truncation utilities.

TPU-native counterpart of the reference's BandedMatrices usage:
- ``mat2band`` dense->banded truncation  /root/reference/src/gaussian_process.jl:70-74
- banded matvecs on the hot path         /root/reference/src/likelihoods.jl:129-135,192

Semantics to preserve exactly: entries outside the band are DROPPED (treated
as zero), not wrapped or kept. On TPU the natural first representation is the
band-masked dense matrix — matvecs against it are (n x n) @ (n,) matmuls that
map straight onto the MXU and are bit-identical to a banded matvec. A
diagonal-extracted band layout + Pallas kernel (ops/pallas_band.py) is the
large-n alternative; both layouts share this module's truncation semantics.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def band_mask(n: int, lower: int, upper: int, xp=np) -> np.ndarray:
    """Boolean (n, n) mask: True inside the band (j - l <= i <= j + u ...).

    Entry (i, j) is kept iff -lower <= (j - i) <= upper, i.e. j-i within
    [-lower, upper] — matching BandedMatrix((l, u)) storage.
    """
    idx = xp.arange(n)
    off = idx[None, :] - idx[:, None]  # j - i
    return (off >= -lower) & (off <= upper)


def mat2band(mat, lower: int, upper: int):
    """Zero out entries outside the (lower, upper) band.

    Parity with mat2band (/root/reference/src/gaussian_process.jl:70-74):
    the result acts identically to the reference's BandedMatrix in any
    matvec/matmul, because off-band entries there are structural zeros.
    Works for numpy (host setup) and jnp (traced) inputs.
    """
    n = mat.shape[-1]
    if isinstance(mat, np.ndarray):
        mask = band_mask(n, lower, upper, np)
        return np.where(mask, mat, 0.0)
    mask = jnp.asarray(band_mask(n, lower, upper, np))
    return jnp.where(mask, mat, jnp.zeros((), mat.dtype))


def dense_to_band_storage(mat: np.ndarray, bandwidth: int) -> np.ndarray:
    """Extract diagonals into a (2*bandwidth+1, n) band-storage layout.

    Row k of the output holds diagonal offset (k - bandwidth): entry
    ``out[k, j] = mat[j - (k - bandwidth), j]`` where valid, else 0. This is
    the layout consumed by the Pallas banded matvec kernel.
    """
    n = mat.shape[-1]
    out = np.zeros((2 * bandwidth + 1, n), dtype=mat.dtype)
    for k in range(-bandwidth, bandwidth + 1):
        # diagonal with offset k: elements mat[i, i + k]
        diag = np.diagonal(mat, offset=k)
        if k >= 0:
            out[k + bandwidth, k : k + diag.shape[0]] = diag
        else:
            out[k + bandwidth, : diag.shape[0]] = diag
    return out


def band_storage_matvec(band: jnp.ndarray, x: jnp.ndarray, bandwidth: int) -> jnp.ndarray:
    """y = A @ x for A in (2b+1, n) band storage (see dense_to_band_storage).

    Pure-XLA reference implementation (rolls + elementwise FMA): O(n*b) work,
    used to validate the Pallas kernel and as the small-n fallback.

    out[i] = sum_k band[b + k, i + k] * x[i + k]  for k in [-b, b]
    """
    n = x.shape[-1]
    acc = jnp.zeros_like(x)
    for k in range(-bandwidth, bandwidth + 1):
        # v[i] = x[i + k], zero-padded
        v = jnp.roll(x, -k)
        if k > 0:
            v = v.at[n - k :].set(0.0)
        elif k < 0:
            v = v.at[: -k].set(0.0)
        row = band[k + bandwidth]
        # band[b+k, j] = A[j - k, j]; we need A[i, i+k] = band[b+k, i+k]
        r = jnp.roll(row, -k)
        if k > 0:
            r = r.at[n - k :].set(0.0)
        elif k < 0:
            r = r.at[: -k].set(0.0)
        acc = acc + r * v
    return acc
