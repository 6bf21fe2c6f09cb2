"""results_to_chain / magi_summary — result-shaping and summary printing.

Counterparts of /root/reference/src/MagiJl.jl:794-984 without the MCMCChains
dependency: a "chain" here is a plain dict of named (C, S, P) arrays plus
the summary table from postprocess.diagnostics.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from .diagnostics import format_summary, summarize_chains


def results_to_chain(
    results,
    par_names: Optional[Sequence[str]] = None,
    include_sigma: bool = False,
    include_lp: bool = False,
) -> Dict:
    """Assemble a named sample matrix from a MagiResult.

    Parity with results_to_chain (MagiJl.jl:794-902): theta columns named
    theta[i] (or caller-provided), optional sigma[i] columns, optional lp.
    Returns {"names": [...], "samples": (C, S, P)}.
    """
    theta = np.asarray(results.theta)
    n_samples, k = theta.shape
    n_chains = int(results.diagnostics.get("n_chains", 1)) if hasattr(results, "diagnostics") else 1
    if par_names is None:
        names = [f"theta[{i + 1}]" for i in range(k)]
    else:
        if len(par_names) != k:
            raise ValueError(
                f"par_names has length {len(par_names)}, expected {k}"
            )
        names = list(par_names)
    cols = [theta]
    if include_sigma:
        sigma = np.asarray(results.sigma)
        if sigma.shape[0] == n_samples:
            names += [f"sigma[{i + 1}]" for i in range(sigma.shape[1])]
            cols.append(sigma)
    if include_lp:
        lp = np.asarray(results.lp)
        if lp.size == n_samples:
            names.append("lp")
            cols.append(lp[:, None])
    data = np.concatenate(cols, axis=1)
    p = data.shape[1]
    samples = data.reshape(n_chains, n_samples // n_chains, p)
    return {"names": names, "samples": samples}


def magi_summary(
    results,
    par_names: Optional[Sequence[str]] = None,
    include_sigma: bool = True,
    digits: int = 3,
    lower: float = 0.025,
    upper: float = 0.975,
    print_summary: bool = True,
) -> Dict:
    """Posterior summary (mean/sd/quantiles/ESS/R-hat).

    Parity role: magi_summary (MagiJl.jl:921-984)."""
    chain = results_to_chain(
        results, par_names=par_names, include_sigma=include_sigma, include_lp=True
    )
    summary = summarize_chains(
        chain["samples"], names=chain["names"], probs=(lower, 0.5, upper)
    )
    if print_summary:
        print("--- MAGI Posterior Summary ---")
        print(format_summary(summary, digits=digits))
    return summary
