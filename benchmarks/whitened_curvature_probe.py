"""Why do whitened raw-NUTS step sizes collapse on MAGI posteriors?

Probes the exact Hessian of the WHITENED negative log-posterior (HVPs via
jax.grad-of-grad) at the GN mode and at perturbed/posterior-typical points:
top eigenvalue/eigenvector by power iteration, plus the block decomposition
of the stiff direction (x / theta / log-sigma slots). Run on CPU (f64):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u \
        benchmarks/whitened_curvature_probe.py [--fill 1]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fill", type=int, default=1)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from fn_example import generate_data

    from manifold_constrained_gaussian_process_inference_tpu.inference.nlml import (
        optimize_gp_hyperparameters,
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
        gauss_newton_map,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM
    from manifold_constrained_gaussian_process_inference_tpu.ops.gp_cov import (
        build_gp_cov,
    )

    data = generate_data(100, 0.0, 20.0, [0.2, 0.2], args.seed, args.fill)
    y, t = data["y_grid"], data["t_grid"]
    n, d = y.shape
    print(f"n={n}, D={d}")

    hp = optimize_gp_hyperparameters(y, t, "matern52")
    phi = np.asarray(hp[:, :2].T)
    sigma0 = np.asarray(hp[:, 2])
    cov = build_gp_cov("matern52", phi, t, bandsize=20, complexity=2,
                       jitter=1e-6)
    temps = np.array([1.0, 1.0, 1.0])
    tr = make_theta_transform(
        FN_SYSTEM.theta_lower_bound, FN_SYSTEM.theta_upper_bound
    )
    target = MagiTarget.build(
        y, cov, FN_SYSTEM, sigma_init=sigma0, prior_temperature=temps,
        sigma_is_fixed=False, theta_transform=tr,
    )
    vg = jax.jit(target.value_and_grad_fn())

    # interp X init + midpoint theta (solve.py recipe, simplified)
    x0 = np.stack(
        [
            np.interp(
                t, t[np.isfinite(y[:, j])], y[np.isfinite(y[:, j]), j]
            )
            for j in range(d)
        ],
        axis=-1,
    )
    theta0 = unconstrain(tr, np.array([1.0, 1.0, 5.0]))
    psi0 = np.concatenate([x0.T.reshape(-1), theta0, np.log(sigma0)])

    psi_map = gauss_newton_map(vg, cov, y, target, psi0, temps)
    wh = build_psi_whitener(cov, y, target, psi_map, temps, dtype=jnp.float64)
    k = FN_SYSTEM.theta_size
    nd = n * d

    from manifold_constrained_gaussian_process_inference_tpu.inference.whiten import (
        wrap_value_and_grad,
    )

    vg_w = jax.jit(wrap_value_and_grad(vg, wh))

    def neg_lp_w(z):
        return -vg_w(z)[0]

    hvp = jax.jit(
        lambda z, v: jax.grad(lambda zz: jnp.dot(jax.grad(neg_lp_w)(zz), v))(z)
    )

    dim = psi_map.shape[0]
    rng = np.random.default_rng(0)

    def top_eig(z, iters=60):
        v = rng.normal(size=dim)
        v /= np.linalg.norm(v)
        lam = 0.0
        for _ in range(iters):
            w = np.asarray(hvp(jnp.asarray(z), jnp.asarray(v)))
            lam = float(v @ w)
            nv = np.linalg.norm(w)
            if nv == 0:
                break
            v = w / nv
        return lam, v

    def describe(tag, z):
        lam, v = top_eig(z)
        bx = float(np.linalg.norm(v[:nd]))
        bt = float(np.linalg.norm(v[nd : nd + k]))
        bs = float(np.linalg.norm(v[nd + k :]))
        # which time indices dominate within x
        vx = np.abs(v[:nd].reshape(d, n))
        i_peak = np.unravel_index(np.argmax(vx), vx.shape)
        print(
            f"{tag}: top eig {lam:.4g} (implied eps ~ {1.0/np.sqrt(abs(lam)):.3g}); "
            f"|v_x|={bx:.3f} |v_theta|={bt:.3f} |v_sigma|={bs:.3f}; "
            f"x peak at dim {i_peak[0]} t-index {i_peak[1]}/{n}"
        )
        return lam, v

    z0 = np.zeros(dim)
    describe("at GN mode        ", z0)
    for scale in (0.05, 0.3, 1.0):
        zp = scale * rng.normal(size=dim) / np.sqrt(dim) * np.sqrt(dim)
        zp = scale * rng.normal(size=dim)
        describe(f"z ~ {scale:4g}*N(0,I)   ", zp)


if __name__ == "__main__":
    main()
