"""Postprocessing tests — dummy-results fixture like the reference's
test/test_postprocessing.jl, plus analytic checks of ESS/R-hat that the
reference (delegating to MCMCChains) never had."""
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.inference.solve import (
    MagiResult,
)
from manifold_constrained_gaussian_process_inference_tpu.postprocess import (
    ess,
    magi_summary,
    results_to_chain,
    split_rhat,
    summarize_chains,
)


@pytest.fixture
def dummy_results(rng):
    s, n, d, k = 200, 11, 2, 3
    theta = rng.normal(size=(s, k)) * 0.1 + np.array([0.2, 0.2, 3.0])
    return MagiResult(
        theta=theta,
        x_sampled=rng.normal(size=(s, n, d)),
        sigma=np.abs(rng.normal(size=(s, d)) * 0.05 + 0.2),
        phi=np.array([[1.0, 1.0], [0.5, 0.5]]),
        lp=rng.normal(size=s) - 100,
        diagnostics={"n_chains": 1},
    )


def test_results_to_chain_names_and_shapes(dummy_results):
    chain = results_to_chain(dummy_results, include_sigma=True, include_lp=True)
    assert chain["names"] == [
        "theta[1]", "theta[2]", "theta[3]", "sigma[1]", "sigma[2]", "lp",
    ]
    assert chain["samples"].shape == (1, 200, 6)
    named = results_to_chain(dummy_results, par_names=["a", "b", "c"])
    assert named["names"] == ["a", "b", "c"]
    with pytest.raises(ValueError):
        results_to_chain(dummy_results, par_names=["a"])


def test_summary_values(dummy_results):
    summary = magi_summary(dummy_results, include_sigma=True, print_summary=False)
    i = summary["names"].index("theta[3]")
    assert abs(summary["mean"][i] - 3.0) < 0.05
    assert summary["q0.025"][i] < summary["q0.5"][i] < summary["q0.975"][i]
    assert np.all(np.asarray(summary["ess"]) > 10)


def test_ess_iid_close_to_n():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 500))
    e = ess(x)
    assert 1200 < e < 2800  # ~2000 for iid


def test_ess_detects_autocorrelation():
    rng = np.random.default_rng(1)
    c, s, rho = 4, 800, 0.95
    x = np.zeros((c, s))
    for i in range(1, s):
        x[:, i] = rho * x[:, i - 1] + rng.normal(size=c) * np.sqrt(1 - rho**2)
    e = ess(x)
    # theoretical ESS factor (1-rho)/(1+rho) ~ 0.026 -> ~82 of 3200
    assert e < 400


def test_split_rhat_detects_nonconvergence():
    rng = np.random.default_rng(2)
    good = rng.normal(size=(4, 400))
    assert abs(split_rhat(good) - 1.0) < 0.05
    bad = good.copy()
    bad[0] += 5.0  # one chain stuck elsewhere
    assert split_rhat(bad) > 1.5


def test_results_to_chain_multichain(rng):
    """Multi-chain results reshape into (C, S/C, P) preserving chain order."""
    c, s_per, k = 4, 50, 2
    theta = np.concatenate(
        [np.full((s_per, k), float(i)) + rng.normal(size=(s_per, k)) * 0.01
         for i in range(c)]
    )
    res = MagiResult(
        theta=theta,
        x_sampled=rng.normal(size=(c * s_per, 5, 1)),
        sigma=np.full((c * s_per, 1), 0.2),
        phi=np.ones((2, 1)),
        lp=rng.normal(size=c * s_per),
        diagnostics={"n_chains": c},
    )
    chain = results_to_chain(res)
    assert chain["samples"].shape == (c, s_per, k)
    # chain i holds values near i
    for i in range(c):
        assert abs(chain["samples"][i].mean() - i) < 0.1
    # split-rhat across these synthetic 'stuck' chains must flag divergence
    summ = summarize_chains(chain["samples"], names=chain["names"])
    assert np.all(np.asarray(summ["rhat"]) > 2.0)


def test_plot_magi_smoke(dummy_results, tmp_path):
    pytest.importorskip("matplotlib")
    from manifold_constrained_gaussian_process_inference_tpu.postprocess import (
        plot_magi,
    )

    fig = plot_magi(dummy_results, type="traj", save_path=str(tmp_path / "traj.png"))
    assert (tmp_path / "traj.png").exists()
    fig2 = plot_magi(dummy_results, type="trace", include_sigma=True)
    with pytest.raises(ValueError):
        plot_magi(dummy_results, type="nope")


def test_plot_magi_styling_passthrough(dummy_results):
    """Per-plot styling kwargs reach the artists and every Axes (the
    reference forwards Plots.jl attribute kwargs, MagiJl.jl:1015-1154)."""
    pytest.importorskip("matplotlib")
    from manifold_constrained_gaussian_process_inference_tpu.postprocess import (
        plot_magi,
    )

    fig = plot_magi(
        dummy_results, type="traj",
        line_kwargs={"color": "green", "linestyle": "--"},
        ci_kwargs={"alpha": 0.15},
        ylim=(-5.0, 5.0), xlabel="t (s)",
    )
    ax = fig.axes[0]
    assert ax.get_ylim() == (-5.0, 5.0)
    assert ax.get_xlabel() == "t (s)"
    (mean_line,) = [l for l in ax.lines if l.get_label() == "Mean"]
    assert mean_line.get_color() == "green"
    assert mean_line.get_linestyle() == "--"

    fig2 = plot_magi(
        dummy_results, type="trace", line_kwargs={"alpha": 0.35},
        xlabel="iteration",
    )
    ax2 = fig2.axes[0]
    assert ax2.get_xlabel() == "iteration"
    assert ax2.lines[0].get_alpha() == 0.35
