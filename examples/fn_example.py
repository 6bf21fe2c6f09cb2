"""FitzHugh-Nagumo end-to-end example.

Counterpart of /root/reference/run_scripts/fn_example.jl: generate synthetic
FN data (RK truth + seeded noise), build a filllevel-2 discretization grid
with NaN at non-observation points, run solve_magi (theta AND sigma
estimated), and write CSVs + trajectory/trace plots.

Usage:
    python examples/fn_example.py [--niter 50000] [--nobs 100] [--chains 1]
                                  [--outdir ./magi_output] [--quick]
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import manifold_constrained_gaussian_process_inference_tpu as magi
from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig
from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM
from manifold_constrained_gaussian_process_inference_tpu.postprocess import (
    magi_summary,
    plot_magi,
)
from manifold_constrained_gaussian_process_inference_tpu.utils.integrators import (
    integrate_system,
    sample_on_grid,
)


def generate_data(nobs, t_start, t_end, noise_sd, seed, filllevel):
    """Parity with fn_example.jl:58-117."""
    rng = np.random.default_rng(seed)
    theta_true = np.array([0.2, 0.2, 3.0])
    x0_true = np.array([-1.0, 1.0])
    ts, xs = integrate_system(FN_SYSTEM, x0_true, t_start, t_end, theta_true, 8000)
    t_obs = np.linspace(t_start, t_end, nobs)
    x_at_obs = sample_on_grid(ts, xs, t_obs)
    y_obs = x_at_obs + rng.normal(size=x_at_obs.shape) * np.asarray(noise_sd)

    ins = 2**filllevel - 1
    segs = [np.linspace(t_obs[i], t_obs[i + 1], ins + 2)[:-1] for i in range(nobs - 1)]
    t_grid = np.concatenate(segs + [t_obs[-1:]])
    y_grid = np.full((len(t_grid), 2), np.nan)
    y_grid[:: ins + 1] = y_obs
    return dict(
        t_grid=t_grid, y_grid=y_grid, t_obs=t_obs, y_obs=y_obs,
        ts_true=np.asarray(ts), xs_true=np.asarray(xs),
        theta_true=theta_true, sigma_true=np.asarray(noise_sd),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--niter", type=int, default=50000)
    ap.add_argument("--nobs", type=int, default=100)
    ap.add_argument("--t-end", type=float, default=20.0)
    ap.add_argument("--chains", type=int, default=1)
    ap.add_argument("--seed", type=int, default=12345)
    ap.add_argument("--filllevel", type=int, default=2)
    ap.add_argument("--outdir", default="./magi_output")
    ap.add_argument("--sampler", default="nuts", choices=["nuts", "chees", "pt-nuts"])
    ap.add_argument("--whiten", action="store_true",
                    help="Laplace-whiten Psi (see inference/whiten.py)")
    ap.add_argument("--quick", action="store_true", help="tiny run for smoke testing")
    args = ap.parse_args()
    if args.quick:
        args.niter, args.nobs, args.t_end = 400, 33, 10.0

    os.makedirs(args.outdir, exist_ok=True)
    data = generate_data(
        args.nobs, 0.0, args.t_end, [0.2, 0.2], args.seed, args.filllevel
    )
    print(
        f"Data: {len(data['t_grid'])} grid points "
        f"({np.isfinite(data['y_grid'][:, 0]).sum()} observed), "
        f"true theta={data['theta_true']}, true sigma={data['sigma_true']}"
    )

    config = MagiConfig(
        niter_hmc=args.niter,
        burnin_ratio=0.5,
        step_size_factor=0.06,
        target_accept_ratio=0.8,
        jitter=1e-6,
        prior_temperature=(1.0, 1.0, 5.0),
        n_chains=args.chains,
        seed=args.seed,
        sampler=args.sampler,
        x_whitened=args.whiten,
    )
    t0 = time.time()
    results = magi.solve_magi(data["y_grid"], data["t_grid"], FN_SYSTEM, config)
    elapsed = time.time() - t0
    print(f"solve_magi finished in {elapsed:.2f}s "
          f"({results.diagnostics['gradient_evals']:.0f} gradient evals, "
          f"{results.diagnostics['gradient_evals'] / results.diagnostics['sampling_time_s']:.0f} evals/s)")

    theta_mean = results.theta.mean(axis=0)
    sigma_mean = results.sigma.mean(axis=0)
    print(f"theta mean: {np.round(theta_mean, 4)} (true {data['theta_true']})")
    print(f"sigma mean: {np.round(sigma_mean, 4)} (true {data['sigma_true']})")

    magi_summary(results, par_names=["a", "b", "c"], include_sigma=True)

    # CSVs (parity with fn_example.jl:189-206)
    x_mean = results.x_sampled.mean(axis=0)
    with open(os.path.join(args.outdir, "inferred_trajectory.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["time", "V", "R"])
        for i, t in enumerate(data["t_grid"]):
            w.writerow([t, x_mean[i, 0], x_mean[i, 1]])
    with open(os.path.join(args.outdir, "inferred_parameters.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["parameter", "true_value", "mean_estimate"])
        for name, tv, mv in zip(
            ["theta_a", "theta_b", "theta_c", "sigma_V", "sigma_R"],
            list(data["theta_true"]) + list(data["sigma_true"]),
            list(theta_mean) + list(sigma_mean),
        ):
            w.writerow([name, tv, mv])

    try:
        plot_magi(
            results, type="traj", comp_names=["V (Voltage)", "R (Recovery)"],
            t_obs=data["t_grid"], y_obs=data["y_grid"],
            save_path=os.path.join(args.outdir, "trajectory_plot.png"),
        )
        plot_magi(
            results, type="trace", par_names=["a", "b", "c"],
            include_sigma=True,
            save_path=os.path.join(args.outdir, "trace_plot.png"),
        )
        print(f"Plots written to {args.outdir}")
    except ImportError:
        print("matplotlib unavailable; skipped plots")


if __name__ == "__main__":
    main()
