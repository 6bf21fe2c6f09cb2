"""Render a sweep jsonl (results_r4.jsonl, basin_reference.jsonl,
chain_sweep.jsonl, ...) into the markdown tables used by
docs/BENCHMARKS.md — tables are generated from the raw artifacts,
never hand-transcribed.

    python benchmarks/render_results.py [benchmarks/results_r4.jsonl]
"""
from __future__ import annotations

import json
import sys

CONFIG_NAMES = {
    1: "FN known sigma, beta=[1,1,1]",
    2: "FN inferred sigma, beta=[1,1,1] (reference E2E protocol)",
    3: "log-Hes1 partial obs (H never observed), 8k iters, PT",
    4: "FN dense grid n=793 (band 80)",
    5: "FN multichain NUTS (BASELINE #5)",
    6: "FN full-posterior PT, beta=[1,1,5] (run_scripts protocol)",
    7: "FN ChEES/SNAPER (config-1 geometry)",
    8: "FN scale stress n=1585 (filllevel 4, auto band policy)",
}


def fmt(x, nd=3):
    if x is None:
        return "-"
    return f"{x:.{nd}g}" if isinstance(x, float) else str(x)


def render_basin(path):
    """Render basin_reference.jsonl: production vs trusted gold occupancy."""
    rows = [json.loads(l) for l in open(path) if l.strip()]
    # Keep only the two comparison arms (the file also carries "laplace"
    # whitener-diagnostic rows that have no occupancy fields).
    rows = [r for r in rows if r.get("mode") in ("production", "trusted")
            or "error" in r]
    rows.sort(key=lambda r: (r.get("mode", ""), r.get("seed", 0)))
    print("| arm | seed | iters x replicas | occupancy (data basin) "
          "| basin ESS | theta RMSE (occupied basin) | swap acc | div |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r.get('mode')} | {r.get('seed')} | ERROR: "
                  f"{r['error']} | | | | | |")
            continue
        occ = f"{r['frac_data_basin']:.3f} ± {r['frac_data_basin_se']:.3f}"
        # Recorded with the row since round 4; older rows predate the field
        # and used the then-hardcoded mode defaults.
        reps = r.get("pt_replicas", 2 if r["mode"] == "trusted" else 4)
        rmse = r.get("theta_rmse_inflated_basin"
                     if r.get("n_data_basin", 0) == 0
                     else "theta_rmse_data_basin", r.get("theta_rmse"))
        print(
            f"| {r['mode']} | {r['seed']} | {r['niter']} x {reps} "
            f"| {occ} | {fmt(r.get('basin_indicator_ess'), 4)} "
            f"| {fmt(rmse)} | {fmt(r.get('swap_acceptance'))} "
            f"| {r.get('n_divergent', '-')} |"
        )


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/results_r4.jsonl"
    if "basin" in path:
        render_basin(path)
        return
    rows = [json.loads(l) for l in open(path) if l.strip()]
    rows.sort(key=lambda r: (r.get("config", 99), r.get("seed", 0)))

    print("| # | config | seed | theta RMSE | min ESS | max R-hat "
          "| div | wall s | ESS/s |")
    print("|---|---|---|---|---|---|---|---|---|")
    last = None
    for r in rows:
        if "error" in r:
            print(f"| {r.get('config')} | ERROR | {r.get('seed')} "
                  f"| {r['error']} | | | | | |")
            continue
        c = r["config"]
        name = CONFIG_NAMES.get(c, "?") if c != last else ""
        last = c
        print(
            f"| {c} | {name} | {r['seed']} | {fmt(r.get('theta_rmse'))} "
            f"| {fmt(r.get('ess_min'), 4)} | {fmt(r.get('rhat_max'), 4)} "
            f"| {r.get('n_divergent', '-')} | {fmt(r.get('time_s'), 4)} "
            f"| {fmt(r.get('ess_per_sec'))} |"
        )

    extras = {}
    for r in rows:
        c = r.get("config")
        if c == 3 and "h_rmse" in r:
            extras.setdefault("config 3 H RMSE", []).append(r["h_rmse"])
        if c == 6 and "frac_data_basin" in r:
            extras.setdefault("config 6 data-basin occupancy", []).append(
                f"{r['frac_data_basin']}±{r.get('frac_data_basin_se', 0)}"
            )
        if c == 6 and "theta_rmse_data_basin" in r:
            extras.setdefault("config 6 theta RMSE | data basin", []).append(
                r["theta_rmse_data_basin"]
            )
        if c == 7 and "trajectory_length" in r:
            extras.setdefault("config 7 adapted traj length", []).append(
                r["trajectory_length"]
            )
    if extras:
        print()
        for k, v in extras.items():
            print(f"- {k}: {v}")


if __name__ == "__main__":
    main()
