"""Posterior-level band-truncation parity experiment (VERDICT r1 item 4).

Question: how far does bandSize=20 move the POSTERIOR (not just pointwise
values) from the full-band posterior on the FN reference protocol, and
does the auto-escalated band close the gap?

Three production-stack runs on identical data/seed differing only in the
band treatment:
  A  bandSize 20, auto-escalation ON (the default; escalates to 40 here —
     the NLML lengthscale ~3.3 dimension loses definiteness at 20)
  B  bandSize 20, auto-escalation OFF (PSD-repaired at 16% of scale — the
     closest samplable analogue of the reference's silent indefinite form)
  C  full band (n-1 = 396): exact dense semantics

Reported: per-parameter posterior quantiles (2.5/50/97.5%) of theta and
sigma for each run, and the max absolute quantile shift A-C and B-C in
posterior-SD units. Usage (TPU): python -u benchmarks/band_parity_experiment.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from fn_example import generate_data

import manifold_constrained_gaussian_process_inference_tpu as magi
from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig


def run(band_size, escalate, seed=42, niter=3000):
    data = generate_data(100, 0.0, 20.0, [0.2, 0.2], seed, 2)
    cfg = MagiConfig(
        niter_hmc=niter, step_size_factor=0.06, seed=seed,
        prior_temperature=(1.0, 1.0, 5.0),
        sampler="pt-nuts", x_whitened=True,
        band_size=band_size, band_auto_escalate=escalate,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import (
        FN_SYSTEM,
    )

    t0 = time.perf_counter()
    res = magi.solve_magi(data["y_grid"], data["t_grid"], FN_SYSTEM, cfg)
    dt = time.perf_counter() - t0
    pars = np.concatenate([res.theta, res.sigma], axis=1)  # (S, 5)
    qs = np.percentile(pars, [2.5, 50.0, 97.5], axis=0)    # (3, 5)
    return dict(
        quantiles=qs, sd=pars.std(axis=0), time_s=dt,
        theta_mean=pars.mean(axis=0)[:3],
    )


def main():
    n = 397
    runs = {
        "A_band20_escalated": run(20, True),
        "B_band20_repaired": run(20, False),
        "C_full_band": run(n - 1, True),
    }
    names = ["a", "b", "c", "sigma_V", "sigma_R"]
    for tag, r in runs.items():
        print(f"--- {tag} (time {r['time_s']:.0f}s) ---", flush=True)
        for i, nm in enumerate(names):
            q = r["quantiles"][:, i]
            print(f"  {nm:8s} q2.5={q[0]:.4f} q50={q[1]:.4f} q97.5={q[2]:.4f}")
    c = runs["C_full_band"]
    out = {}
    for tag in ("A_band20_escalated", "B_band20_repaired"):
        shift = np.abs(runs[tag]["quantiles"] - c["quantiles"])
        shift_sd = shift / np.maximum(c["sd"][None, :], 1e-12)
        out[tag] = dict(
            max_quantile_shift=float(shift.max()),
            max_quantile_shift_in_posterior_sd=float(shift_sd.max()),
            median_quantile_shift_in_posterior_sd=float(
                np.median(shift_sd)
            ),
        )
        print(tag, "vs C:", json.dumps(out[tag]), flush=True)
    print(json.dumps({k: v for k, v in out.items()}))


if __name__ == "__main__":
    main()
