"""Mode-centered whitened evaluation tests.

The centered path (whiten.make_centered_whitened_vg +
ops.likelihood.log_posterior_centered) must be the SAME function of zeta
as the generic wrap (float64 equality), and in float32 it must cut the
cancellation-noise floor that collapses step sizes on dense grids (the
root cause measured in docs/BENCHMARKS.md config-5 diagnosis)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import manifold_constrained_gaussian_process_inference_tpu as m
from manifold_constrained_gaussian_process_inference_tpu.inference.solve import (
    _init_x_interpolation,
)
from manifold_constrained_gaussian_process_inference_tpu.inference.target import (
    MagiTarget,
)
from manifold_constrained_gaussian_process_inference_tpu.inference.transforms import (
    make_theta_transform,
    unconstrain,
)
from manifold_constrained_gaussian_process_inference_tpu.inference.whiten import (
    build_psi_whitener,
    make_centered_whitened_vg,
    wrap_value_and_grad,
)
from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM


def _problem(n=41, t_end=4.0, band_impl="dense", sigma_fixed=False,
             transform=False, dtype=None):
    """Dense-in-time grid -> large mphi entries (the f32-hostile regime)."""
    rng = np.random.default_rng(0)
    t = np.linspace(0, t_end, n)
    y = np.stack([np.sin(1.5 * t), np.cos(1.5 * t)], -1)
    y += 0.2 * rng.normal(size=(n, 2))
    phi = np.array([[1.5, 1.5], [1.2, 1.2]])
    cov = m.build_gp_cov("matern52", phi, t, bandsize=12, complexity=2)
    tr = (
        make_theta_transform(
            FN_SYSTEM.theta_lower_bound, FN_SYSTEM.theta_upper_bound
        )
        if transform else None
    )
    tgt = MagiTarget.build(
        y, cov, FN_SYSTEM, np.array([0.2, 0.2]), (1.0, 1.0, 2.0),
        sigma_fixed, band_impl=band_impl, theta_transform=tr, dtype=dtype,
    )
    x0 = _init_x_interpolation(y, t)
    th0 = np.array([0.3, 0.3, 2.5])
    if transform:
        th0 = unconstrain(tr, th0)
    parts = [x0.T.reshape(-1), th0]
    if not sigma_fixed:
        parts.append(np.log([0.2, 0.2]))
    psi0 = np.concatenate(parts)
    return y, cov, tgt, psi0


@pytest.mark.parametrize("band_impl", ["dense", "band"])
@pytest.mark.parametrize("sigma_fixed", [False, True])
def test_centered_equals_wrap_f64(band_impl, sigma_fixed):
    y, cov, tgt, psi0 = _problem(
        band_impl=band_impl, sigma_fixed=sigma_fixed
    )
    wh = build_psi_whitener(cov, y, tgt, psi0, (1.0, 1.0, 2.0), jnp.float64)
    vg_ref = wrap_value_and_grad(tgt.value_and_grad_fn(), wh)
    vg_cent = make_centered_whitened_vg(tgt, wh)
    rng = np.random.default_rng(1)
    for _ in range(3):
        z = jnp.asarray(rng.normal(size=psi0.shape) * 0.5)
        v_r, g_r = vg_ref(z)
        v_c, g_c = vg_cent(z)
        np.testing.assert_allclose(float(v_c), float(v_r), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(g_c), np.asarray(g_r), rtol=1e-6, atol=1e-8
        )


def test_centered_equals_wrap_with_transform():
    y, cov, tgt, psi0 = _problem(transform=True)
    wh = build_psi_whitener(cov, y, tgt, psi0, (1.0, 1.0, 2.0), jnp.float64)
    vg_ref = wrap_value_and_grad(tgt.value_and_grad_fn(), wh)
    vg_cent = make_centered_whitened_vg(tgt, wh)
    z = jnp.asarray(np.random.default_rng(2).normal(size=psi0.shape) * 0.3)
    v_r, g_r = vg_ref(z)
    v_c, g_c = vg_cent(z)
    np.testing.assert_allclose(float(v_c), float(v_r), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(g_c), np.asarray(g_r), rtol=1e-6, atol=1e-8
    )


def test_centered_f32_energy_difference_noise_is_lower():
    """What the sampler consumes is ENERGY DIFFERENCES along trajectories.
    On a dense grid the generic wrap's f32 lp surface is staircased by
    |mphi| * |x| cancellation (the rounding of x = center + W z
    decorrelates between nearby z); the centered path computes dx = (W z)_x
    directly, so its differences track the f64 truth much closer (measured
    ~4.5x at this grid on TPU; require 2x).

    The 2x RATIO is a TPU claim: the advantage is largest where f32
    matmuls take bf16 passes (TPU default). On CPU, XLA computes f32
    matmuls in true f32, both paths sit near the same (much lower) noise
    floor, and the ratio is a coin flip (measured median ratio ~0.5-1.5
    across seeds — a statistical assert there is flaky by construction,
    VERDICT r2 item 1). CPU keeps the deterministic exactness checks
    above (test_centered_equals_wrap_f64); the ratio asserts only on TPU,
    where both sides are regression-guarded by an absolute sanity bound.
    """
    import jax

    from manifold_constrained_gaussian_process_inference_tpu.inference.whiten import (
        gauss_newton_map,
    )

    y, cov, tgt, psi0 = _problem(n=161, t_end=4.0)
    temps = (1.0, 1.0, 2.0)
    psi0 = gauss_newton_map(
        jax.jit(tgt.value_and_grad_fn()), cov, y, tgt, psi0, temps,
    )
    wh64 = build_psi_whitener(cov, y, tgt, psi0, temps, jnp.float64)
    vg64 = jax.jit(make_centered_whitened_vg(tgt, wh64))

    # f32 replicas of the same target/whitener
    tgt32 = MagiTarget.build(
        y, cov, FN_SYSTEM, np.array([0.2, 0.2]), temps, False,
        dtype=jnp.float32,
    )
    wh32 = build_psi_whitener(cov, y, tgt32, psi0, temps, jnp.float32)
    vg32_wrap = jax.jit(wrap_value_and_grad(tgt32.value_and_grad_fn(), wh32))
    vg32_cent = jax.jit(make_centered_whitened_vg(tgt32, wh32))

    rng = np.random.default_rng(3)
    err_wrap, err_cent = [], []
    for _ in range(10):
        z1 = rng.normal(size=psi0.shape) * 0.5
        z2 = z1 + rng.normal(size=psi0.shape) * 0.01

        def dE(vg, dtype):
            return float(vg(jnp.asarray(z1, dtype))[0]) - float(
                vg(jnp.asarray(z2, dtype))[0]
            )

        d_true = dE(vg64, jnp.float64)
        err_wrap.append(abs(dE(vg32_wrap, jnp.float32) - d_true))
        err_cent.append(abs(dE(vg32_cent, jnp.float32) - d_true))
    # Absolute sanity on every platform: the centered path's f32 energy-
    # difference error must stay far below O(1) (an O(1) energy error is
    # what collapses NUTS step sizes — docs/BENCHMARKS.md f32 section).
    assert np.median(err_cent) < 0.1, np.median(err_cent)
    if jax.default_backend() == "tpu":
        assert np.median(err_cent) < 0.5 * np.median(err_wrap), (
            np.median(err_cent), np.median(err_wrap)
        )
