"""Pallas TPU kernel: stacked banded matvec in diagonal band storage.

For large time grids the (D, n, n) band-masked dense matvecs of the MAGI
hot path read O(n^2) HBM per evaluation while only O(n*b) entries are
nonzero. This kernel consumes the (W=2b+1, n) diagonal-extracted layout
(ops/band.py: dense_to_band_storage) so HBM traffic drops by n/(2b+1)
(~10x at n=3200, b=20 — the dense-grid configs of BASELINE.json).

  y[m, i] = sum_{k=-b..b} band[m, b+k, i+k] * x[m, i+k]

The kernel runs one (W, n) problem per grid step, unrolling the W diagonal
shifts as lane-rolls + edge masks on the VPU. Gradients are provided by a
custom VJP that applies the TRANSPOSED operator, whose band storage is
precomputed on host (transpose_band_storage) — no O(n^2) materialization
anywhere.

A pure-XLA fallback (ops/band.py: band_storage_matvec) computes the same
contraction with jnp.roll; `use_pallas=False` (or non-TPU backends /
interpret mode) routes there. Both share tests for bit-level agreement
with the masked-dense matvec.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .band import band_storage_matvec


def transpose_band_storage(band: np.ndarray, bandwidth: int) -> np.ndarray:
    """Band storage of A^T given band storage of A (host-side).

    A^T[i, i+k] = A[i+k, i]  =>  bandT[b+k, j] = A^T[j-k, j] = A[j, j-k]
                                              = band[b-k, j-k] shifted.
    """
    w, n = band.shape
    b = bandwidth
    out = np.zeros_like(band)
    for k in range(-b, b + 1):
        src = band[b - k]
        # bandT[b+k, j] = band[b-k, j-k] for valid j
        if k >= 0:
            out[b + k, k:] = src[: n - k]
        else:
            out[b + k, : n + k] = src[-k:]
    return out


def _band_matvec_kernel(band_ref, x_ref, out_ref, *, bandwidth: int, n: int, m: int):
    """All M stacked matvecs in one step: (M, n) blocks ride the VPU's
    (sublane, lane) layout; the W=2b+1 diagonal shifts unroll as lane-rolls
    with edge masks."""
    import jax.lax as lax
    from jax.experimental.pallas import tpu as pltpu

    def roll_lanes(v, k):
        # shifted[i] = v[i + k] == np.roll(v, -k); pltpu.roll is the native
        # lane rotate (jnp.roll lowers to zero-size slices at k == 0, which
        # Mosaic rejects).
        if k == 0:
            return v
        return pltpu.roll(v, (-k) % n, 1)

    x = x_ref[:, :]  # (M, n)
    col = lax.broadcasted_iota(jnp.int32, (m, n), 1)
    acc = jnp.zeros((m, n), dtype=x.dtype)
    for k in range(-bandwidth, bandwidth + 1):
        rows = band_ref[:, k + bandwidth, :]  # (M, n)
        # need band[m, b+k, i+k] * x[m, i+k] at position i -> roll lanes by k
        shifted_r = roll_lanes(rows, k)
        shifted_x = roll_lanes(x, k)
        valid = (col + k >= 0) & (col + k < n)
        acc = acc + jnp.where(valid, shifted_r * shifted_x, 0.0)
    out_ref[:, :] = acc


def _pallas_band_matvec_impl(bands: jnp.ndarray, xs: jnp.ndarray, bandwidth: int):
    """bands (M, W, n), xs (M, n) -> (M, n); whole problem in VMEM
    (M*W*n*4 bytes — e.g. 3 MB at M=6, b=20, n=3200)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, w, n = bands.shape
    kernel = partial(_band_matvec_kernel, bandwidth=bandwidth, n=n, m=m)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), xs.dtype),
    )(bands, xs)


def _xla_band_matvec(bands, xs, bandwidth):
    return jax.vmap(lambda b, x: band_storage_matvec(b, x, bandwidth))(bands, xs)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def band_matvec(bands, bands_t, xs, bandwidth: int, use_pallas: bool = False):
    """y[m] = A_m @ x[m] with A in band storage; bands_t is A^T's storage
    (used only by the backward pass). Differentiable in xs only — the band
    coefficients are static GP data in MAGI."""
    return _dispatch(bands, xs, bandwidth, use_pallas)


def _tpu_available() -> bool:
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    # Plugin platforms may report a custom name (e.g. 'axon'); the device
    # kind is authoritative.
    return "TPU" in getattr(dev, "device_kind", "") or dev.platform == "tpu"


# The kernel unrolls all W = 2b+1 diagonal shifts as lane-rolls; beyond
# this bandwidth the Mosaic program grows pathological (multi-minute
# compiles / kernel faults observed at W = 321 on v5e). The XLA roll path
# computes the identical contraction and compiles fine.
_PALLAS_MAX_BANDWIDTH = 64


def _dispatch(bands, xs, bandwidth, use_pallas):
    if (
        use_pallas
        and bandwidth <= _PALLAS_MAX_BANDWIDTH
        and _tpu_available()
    ):
        return _pallas_band_matvec_impl(bands, xs, bandwidth)
    return _xla_band_matvec(bands, xs, bandwidth)


def _band_matvec_fwd(bands, bands_t, xs, bandwidth, use_pallas):
    return _dispatch(bands, xs, bandwidth, use_pallas), (bands, bands_t)


def _band_matvec_bwd(bandwidth, use_pallas, res, g):
    bands, bands_t = res
    dx = _dispatch(bands_t, g, bandwidth, use_pallas)
    return jnp.zeros_like(bands), jnp.zeros_like(bands_t), dx


band_matvec.defvjp(_band_matvec_fwd, _band_matvec_bwd)
