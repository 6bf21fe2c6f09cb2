"""Within-posterior (time-grid) sharding: one chain, state split over devices.

The second parallel axis of the framework (the first — chain parallelism —
lives in parallel/chains.py). For very large discretization grids a SINGLE
likelihood/gradient evaluation is split across the device mesh along the
time axis: every device owns a contiguous block of the grid plus a static
halo of the band operators, evaluates its block's share of the three MAGI
terms, and the partial sums/gradients are reduced on the host side of the
shard_map. This is sequence parallelism in the scaling-book sense, riding
ICI — the reference (single-threaded Julia, /root/reference/src/likelihoods.jl)
has no counterpart.

Key design points (TPU/XLA-first):
- Psi stays REPLICATED across devices (it is the NUTS state; the sampler
  machinery is unchanged). Each device slices the rows it needs — including
  operator halos — with a static-size `lax.dynamic_slice`, so the forward
  pass needs NO collective at all: the only cross-device data movement is
  the (n_dev,)-stacked partial values/gradients gathered at the end.
- All band operators are pre-sharded on the HOST with their halos baked in
  (they are constants); columns outside the global grid are zero, which
  reproduces the band-truncation semantics of ops/band.py exactly, so the
  sharded value/gradient is bit-for-bit the banded-path math, just summed
  in a different order.
- The per-device partial gradient is computed INSIDE the shard_map
  (jax.value_and_grad of the local partial) and summed outside. Gradients
  therefore never rely on the transpose of replicated-input shard_map
  (check_vma=False), which keeps the construction robust under vmap/scan.

Band-storage indexing (ops/band.py): bs[b+k, j] = A[j-k, j], and a matvec
out[i] = sum_k bs[b+k, i+k] * v[i+k]. Producing output rows [s0, s0+m)
therefore needs storage columns and input entries [s0-b, s0+m+b).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.band import dense_to_band_storage
from ..ops.likelihood import LOG_2PI

GRID_AXIS = "grid"


def make_grid_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = np.array(jax.devices()[: n_devices] if n_devices else jax.devices())
    return Mesh(devices, (GRID_AXIS,))


class GridBlocks(NamedTuple):
    """Per-device constant blocks (leading axis = n_dev, sharded over GRID_AXIS).

    Haloed band storages (see module docstring for ranges):
      mphi_h: (n_dev, D, 2b+1, nloc+4b)  — output rows [s-b, s+nloc+b)
      gkt_h:  (n_dev, D, 2b+1, nloc+2b)  — output rows [s, s+nloc)
      gct_h:  (n_dev, D, 2b+1, nloc+2b)
    Haloed pointwise data:
      tvec_h2, mu_h4, dotmu_h2 — on the ranges their consumers need
    Local observation block: yobs_loc / mask_loc (n_dev, nloc, D).
    """

    mphi_h: jnp.ndarray
    gkt_h: jnp.ndarray
    gct_h: jnp.ndarray
    tvec_h2: jnp.ndarray
    mu_h4: jnp.ndarray
    dotmu_h2: jnp.ndarray
    yobs_loc: jnp.ndarray
    mask_loc: jnp.ndarray


class GridShardedData(NamedTuple):
    """Everything the sharded log-posterior closes over."""

    blocks: GridBlocks
    nobs: jnp.ndarray   # (D,) global finite-observation counts
    beta: jnp.ndarray   # (3,)
    n: int
    nloc: int
    bandwidth: int
    n_dev: int


def _slice_cols_with_zeros(arr: np.ndarray, start: int, width: int) -> np.ndarray:
    """arr[..., start:start+width] where out-of-range columns are zero."""
    out = np.zeros(arr.shape[:-1] + (width,), dtype=arr.dtype)
    lo, hi = max(start, 0), min(start + width, arr.shape[-1])
    if hi > lo:
        out[..., lo - start : hi - start] = arr[..., lo:hi]
    return out


def _slice_rows_with_edge(arr: np.ndarray, start: int, width: int) -> np.ndarray:
    """arr[start:start+width] along axis 0; out-of-range rows clamp to the
    nearest valid row (used for tvec/mu so the ODE f sees finite inputs)."""
    idx = np.clip(np.arange(start, start + width), 0, arr.shape[0] - 1)
    return arr[idx]


def make_grid_sharded_data(
    yobs: np.ndarray,
    gp_cov,
    prior_temperature,
    n_dev: int,
    dtype=None,
    mu=None,
    dotmu=None,
) -> GridShardedData:
    """Host-side construction of the per-device blocks (float64 numpy, cast
    at the end — same policy as ops/likelihood.make_banded_likelihood_data)."""
    if dtype is None:
        dtype = gp_cov.Cinv_band.dtype
    yobs = np.asarray(yobs, dtype=np.float64)
    mask = np.isfinite(yobs)
    n, d = yobs.shape
    b = int(gp_cov.bandsize)
    nloc = -(-n // n_dev)  # ceil: last shard zero-padded

    from ..ops.likelihood import _resolve_mean
    from ..ops.pallas_band import transpose_band_storage

    mu_j, dotmu_j = _resolve_mean(mu, dotmu, n, d, np.float64)
    mu_np, dotmu_np = np.asarray(mu_j), np.asarray(dotmu_j)

    def storage(stack):
        arr = np.asarray(stack, dtype=np.float64)
        return np.stack([dense_to_band_storage(a, b) for a in arr])

    mphi_bs = storage(gp_cov.mphi_band)                       # (D, 2b+1, n)
    gkt_bs = np.stack(
        [
            transpose_band_storage(s, b)
            for s in storage(gp_cov.Kinv_band_chol)
        ]
    )
    gct_bs = np.stack(
        [
            transpose_band_storage(s, b)
            for s in storage(gp_cov.Cinv_band_chol)
        ]
    )

    yobs_filled = np.where(mask, yobs, 0.0)
    maskf = mask.astype(np.float64)

    mphi_h, gkt_h, gct_h = [], [], []
    tvec_h2, mu_h4, dotmu_h2, y_loc, m_loc = [], [], [], [], []
    tvec_np = np.asarray(gp_cov.tvec, dtype=np.float64)
    for sdev in range(n_dev):
        s = sdev * nloc
        mphi_h.append(_slice_cols_with_zeros(mphi_bs, s - 2 * b, nloc + 4 * b))
        gkt_h.append(_slice_cols_with_zeros(gkt_bs, s - b, nloc + 2 * b))
        gct_h.append(_slice_cols_with_zeros(gct_bs, s - b, nloc + 2 * b))
        tvec_h2.append(_slice_rows_with_edge(tvec_np, s - b, nloc + 2 * b))
        mu_h4.append(_slice_rows_with_edge(mu_np, s - 2 * b, nloc + 4 * b))
        dotmu_h2.append(
            _slice_rows_with_edge(dotmu_np, s - b, nloc + 2 * b)
        )
        y_loc.append(
            _slice_cols_with_zeros(yobs_filled.T, s, nloc).T
        )
        m_loc.append(_slice_cols_with_zeros(maskf.T, s, nloc).T)

    j = lambda a: jnp.asarray(np.stack(a), dtype=dtype)
    blocks = GridBlocks(
        mphi_h=j(mphi_h), gkt_h=j(gkt_h), gct_h=j(gct_h),
        tvec_h2=j(tvec_h2), mu_h4=j(mu_h4), dotmu_h2=j(dotmu_h2),
        yobs_loc=j(y_loc), mask_loc=j(m_loc),
    )
    return GridShardedData(
        blocks=blocks,
        nobs=jnp.asarray(mask.sum(axis=0).astype(np.float64), dtype=dtype),
        beta=jnp.asarray(np.asarray(prior_temperature, np.float64), dtype=dtype),
        n=n, nloc=nloc, bandwidth=b, n_dev=n_dev,
    )


def _halo_band_matvec(bs: jnp.ndarray, v: jnp.ndarray, b: int) -> jnp.ndarray:
    """out[j] = sum_k bs[b+k, j+b+k] * v[j+b+k] for bs (2b+1, L), v (L,):
    the haloed-block banded matvec (returns length L - 2b)."""
    L = v.shape[0]
    m = L - 2 * b
    acc = jnp.zeros((m,), v.dtype)
    for k in range(-b, b + 1):
        prod = bs[b + k] * v
        acc = acc + jax.lax.dynamic_slice_in_dim(prod, b + k, m)
    return acc


def _local_log_posterior_terms(
    blk: GridBlocks,
    x: jnp.ndarray,        # (n, D) replicated full state
    theta: jnp.ndarray,
    ode_f: Callable,
    n: int,
    nloc: int,
    b: int,
    n_dev: int,
):
    """One device's share of (sse, qform_deriv, qform_level), each (D,)."""
    d = x.shape[1]
    s = jax.lax.axis_index(GRID_AXIS) * nloc
    # Rows [s-2b, s+nloc+2b) of x, zero-padded beyond the global grid. The
    # right pad covers ceil-division slack too (nloc*n_dev - n extra rows),
    # so dynamic_slice never clamps (a clamped start would silently
    # misalign the block against its precomputed operator halos).
    pad_hi = 2 * b + nloc * n_dev - n
    xp = jnp.pad(x, ((2 * b, pad_hi), (0, 0)))
    xh4 = jax.lax.dynamic_slice(
        xp, (s, jnp.zeros((), s.dtype)), (nloc + 4 * b, d)
    )
    xh4c = xh4 - blk.mu_h4
    xh2 = xh4[b : b + nloc + 2 * b]
    xh2c = xh4c[b : b + nloc + 2 * b]
    xloc = xh4[2 * b : 2 * b + nloc]

    f_h2 = ode_f(xh2, theta, blk.tvec_h2)                  # (nloc+2b, D)
    mv = jax.vmap(_halo_band_matvec, in_axes=(0, 1, None), out_axes=1)
    mphi_x_h2 = mv(blk.mphi_h, xh4c, b)                     # (nloc+2b, D)
    e_h2 = f_h2 - blk.dotmu_h2 - mphi_x_h2
    gk_e = mv(blk.gkt_h, e_h2, b)                           # (nloc, D)
    gc_x = mv(blk.gct_h, xh2c, b)                           # (nloc, D)

    resid = blk.mask_loc * (xloc - blk.yobs_loc)
    sse = jnp.sum(resid * resid, axis=0)
    qd = jnp.sum(gk_e * gk_e, axis=0)
    ql = jnp.sum(gc_x * gc_x, axis=0)
    return sse, qd, ql


def make_grid_value_and_grad(
    data: GridShardedData,
    system,
    sigma_init,
    sigma_is_fixed: bool,
    mesh: Mesh,
    theta_transform=None,
) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Fused value-and-grad of the MAGI log-posterior, grid-sharded.

    Same Psi contract as MagiTarget.value_and_grad_fn (inference/target.py):
    [vec(X) column-major; theta; log_sigma?], log-sigma clamp +-15 with
    Jacobian, optional bounded theta reparameterization. The returned
    closure is jit/scan/vmap-composable (the shard_map is inside).
    """
    from ..inference.target import LOG_SIGMA_CLAMP

    blk0 = data.blocks
    n, nloc, b, n_dev = data.n, data.nloc, data.bandwidth, data.n_dev
    d = int(blk0.yobs_loc.shape[-1])
    k = system.theta_size
    beta, nobs = data.beta, data.nobs
    sigma_fixed = jnp.asarray(sigma_init, dtype=blk0.mask_loc.dtype)
    ode_f = system.f

    def local_partial(psi, blk):
        """This device's share of the log-posterior. Global terms (the
        sigma normalizer, the transform Jacobians) ride on device 0."""
        x = psi[: n * d].reshape(d, n).T
        theta = psi[n * d : n * d + k]
        jac = jnp.zeros((), dtype=psi.dtype)
        if theta_transform is not None:
            from ..inference.transforms import constrain

            theta, tjac = constrain(theta_transform, theta)
            jac = jac + tjac
        if sigma_is_fixed:
            sigma = sigma_fixed
        else:
            clamped = jnp.clip(
                psi[n * d + k :], -LOG_SIGMA_CLAMP, LOG_SIGMA_CLAMP
            )
            sigma = jnp.exp(clamped)
            jac = jac + jnp.sum(clamped)
        sse, qd, ql = _local_log_posterior_terms(
            blk, x, theta, ode_f, n, nloc, b, n_dev
        )
        sigma_sq = sigma * sigma
        ll_obs_local = -0.5 * jnp.sum(sse / sigma_sq)
        norm = -0.5 * jnp.sum(
            nobs * (LOG_2PI + jnp.log(sigma_sq)) * (nobs > 0)
        )
        on_dev0 = (jax.lax.axis_index(GRID_AXIS) == 0).astype(psi.dtype)
        return (
            (ll_obs_local + on_dev0 * norm) / beta[2]
            - 0.5 * jnp.sum(qd) / beta[0]
            - 0.5 * jnp.sum(ql) / beta[1]
            + on_dev0 * jac
        )

    def _shard_vg(psi, blk_stacked):
        blk = jax.tree.map(lambda a: a[0], blk_stacked)
        val, grad = jax.value_and_grad(local_partial)(psi, blk)
        return val[None], grad[None]

    shard_vg = jax.shard_map(
        _shard_vg,
        mesh=mesh,
        in_specs=(P(), P(GRID_AXIS)),
        out_specs=(P(GRID_AXIS), P(GRID_AXIS)),
        check_vma=False,
    )

    def vg(psi):
        partials, grads = shard_vg(psi, blk0)
        return jnp.sum(partials), jnp.sum(grads, axis=0)

    return vg


def make_grid_logdensity(
    data: GridShardedData,
    system,
    sigma_init,
    sigma_is_fixed: bool,
    mesh: Mesh,
    theta_transform=None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Value-only variant of make_grid_value_and_grad."""
    vg = make_grid_value_and_grad(
        data, system, sigma_init, sigma_is_fixed, mesh, theta_transform
    )
    return lambda psi: vg(psi)[0]
