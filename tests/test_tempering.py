"""Parallel tempering tests: mode-hopping on a bimodal target that plain
NUTS cannot cross, swap bookkeeping, and exactness on a Gaussian."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.inference.nuts import (
    run_nuts,
)
from manifold_constrained_gaussian_process_inference_tpu.inference.tempering import (
    geometric_ladder,
    run_parallel_tempering,
)

pytestmark = pytest.mark.slow  # heavy sampler E2E; fast suite = -m "not slow"


def test_geometric_ladder():
    t = geometric_ladder(5, 16.0)
    assert t[0] == 1.0 and np.isclose(t[-1], 16.0)
    assert np.all(np.diff(np.log(t)) > 0)
    assert np.allclose(np.diff(np.log(t)), np.diff(np.log(t))[0])


def _bimodal_vg(sep=6.0):
    # mixture of two unit Gaussians at +-sep/2 in the first coordinate
    mu = sep / 2.0

    def logp(q):
        a = -0.5 * jnp.sum((q - jnp.array([mu, 0.0])) ** 2)
        b = -0.5 * jnp.sum((q + jnp.array([mu, 0.0])) ** 2)
        return jnp.logaddexp(a, b) - jnp.log(2.0)

    return jax.value_and_grad(logp)


def test_pt_crosses_modes_where_nuts_cannot():
    vg = _bimodal_vg(sep=10.0)
    q0 = jnp.array([5.0, 0.0])  # start in the right mode

    # plain NUTS stays in one mode
    s_nuts, _ = jax.jit(
        lambda: run_nuts(vg, q0, jax.random.PRNGKey(0), 1500, 500)
    )()
    frac_left_nuts = float(np.mean(np.asarray(s_nuts)[:, 0] < 0))
    assert frac_left_nuts < 0.05

    # PT visits both modes with roughly equal mass
    s_pt, info = run_parallel_tempering(
        vg, q0, jax.random.PRNGKey(0), n_samples=2500, n_adapts=1000,
        n_temps=6, max_temp=64.0, chunk_size=1500,
    )
    frac_left = float(np.mean(s_pt[:, 0] < 0))
    assert 0.15 < frac_left < 0.85
    assert info["swap_acceptance"] > 0.1
    # both modes centered correctly
    left = s_pt[s_pt[:, 0] < 0]
    right = s_pt[s_pt[:, 0] > 0]
    assert abs(left[:, 0].mean() + 5.0) < 0.5
    assert abs(right[:, 0].mean() - 5.0) < 0.5


def test_pt_exact_on_gaussian():
    """With any ladder, the T=1 chain must sample the exact target."""
    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    s, info = run_parallel_tempering(
        vg, jnp.zeros(3), jax.random.PRNGKey(1), n_samples=3000,
        n_adapts=1000, n_temps=4, max_temp=8.0,
    )
    assert abs(s.mean()) < 0.1
    assert np.all(np.abs(s.var(0) - 1.0) < 0.25)
    assert s.shape == (2000, 3)


def test_pt_reports_real_health_stats():
    """PT must report REAL per-rung NUTS accept_prob/tree_depth for the
    sampling phase (solve_magi used to fabricate accept=1 / depth=0 when
    the sampler omitted them, poisoning benchmark health forensics)."""
    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    s, info = run_parallel_tempering(
        vg, jnp.zeros(2), jax.random.PRNGKey(3), n_samples=400,
        n_adapts=200, n_temps=3, max_temp=4.0, chunk_size=200,
    )
    n_keep, k_temps = s.shape[0], 3
    for key in ("accept_prob", "tree_depth"):
        assert info[key].shape == (n_keep, k_temps)
    acc = info["accept_prob"]
    # Dual averaging targets 0.8: real acceptance statistics are noisy,
    # fabricated ones are exactly 1.0 everywhere.
    assert 0.5 < acc.mean() < 1.0 - 1e-6
    # On a 2-D Gaussian NUTS doubles at least once nearly every step.
    assert info["tree_depth"].mean() > 0.5
    assert info["num_leapfrog"].shape == (n_keep, k_temps)


def test_pt_single_temperature_degenerates_to_nuts_like():
    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    s, info = run_parallel_tempering(
        vg, jnp.zeros(2), jax.random.PRNGKey(2), n_samples=600,
        n_adapts=300, temperatures=[1.0],
    )
    assert np.all(np.isfinite(s))
    assert info["swap_acceptance"] == 0.0 or info["swap_acceptance"] >= 0.0
    assert abs(s.var(0).mean() - 1.0) < 0.4


def test_adapt_ladder_equidistributes_rejection():
    from manifold_constrained_gaussian_process_inference_tpu.inference.tempering import (
        adapt_ladder,
    )

    inv_temps = 1.0 / geometric_ladder(5, 16.0)
    # Pair 0 rejects almost always, pairs 1-3 almost never: the adapted
    # ladder must pack rungs near the cold end (pair-0 gap shrinks).
    n_try = np.array([100, 100, 100, 100, 0])
    n_acc = np.array([5, 95, 95, 95, 0])
    new = adapt_ladder(inv_temps, n_acc, n_try)
    assert new[0] == 1.0 and np.isclose(new[-1], inv_temps[-1])
    assert np.all(np.diff(new) < 0)  # still decreasing
    gap_old = np.log(inv_temps[0]) - np.log(inv_temps[1])
    gap_new = np.log(new[0]) - np.log(new[1])
    assert gap_new < 0.5 * gap_old

    # Uniform observed rejection: ladder unchanged (already optimal).
    n_acc_u = np.array([50, 50, 50, 50, 0])
    new_u = adapt_ladder(inv_temps, n_acc_u, n_try)
    assert np.allclose(new_u, inv_temps, rtol=1e-10)

    # Insufficient statistics: unchanged.
    new_s = adapt_ladder(inv_temps, n_acc, np.array([5, 100, 100, 100, 0]))
    assert np.allclose(new_s, inv_temps)


def test_pt_ladder_adaptation_improves_min_pair_acceptance():
    """On a target with strongly nonuniform barriers (variance scaling),
    warmup ladder adaptation must lift the worst adjacent-pair swap
    acceptance during sampling vs the frozen geometric ladder."""
    # A 20-dim Gaussian: tempering scales the variance, so adjacent-rung
    # overlap is analytic and the geometric ladder is already near-optimal;
    # instead temper a funnel-like target where lp variance is huge.
    def logp(q):
        # student-t-ish heavy tail in 10 dims -> lp variance large across T
        return -2.0 * jnp.sum(jnp.log1p(0.5 * q * q))

    vg = jax.value_and_grad(logp)
    q0 = jnp.zeros(10)
    common = dict(
        n_samples=2400, n_adapts=1600, n_temps=6, max_temp=64.0,
        chunk_size=400,
    )
    _, info_ad = run_parallel_tempering(
        vg, q0, jax.random.PRNGKey(3), ladder_adapt=True, **common
    )
    _, info_fr = run_parallel_tempering(
        vg, q0, jax.random.PRNGKey(3), ladder_adapt=False, **common
    )
    min_ad = info_ad["swap_acceptance_per_pair"].min()
    min_fr = info_fr["swap_acceptance_per_pair"].min()
    assert min_ad >= min_fr - 0.02  # never worse (tol for MC noise)
    # temperatures moved away from the geometric start
    assert not np.allclose(
        info_ad["temperatures"], info_fr["temperatures"], rtol=1e-6
    )
    assert np.all(np.isfinite(info_ad["temperatures"]))


def test_pt_checkpoint_resume(tmp_path):
    from manifold_constrained_gaussian_process_inference_tpu.inference.tempering import (
        load_pt_checkpoint,
        run_parallel_tempering_resumed,
    )

    vg = _bimodal_vg(sep=6.0)
    path = str(tmp_path / "pt_ckpt.npz")
    s1, info1 = run_parallel_tempering(
        vg, jnp.array([3.0, 0.0]), jax.random.PRNGKey(5),
        n_samples=900, n_adapts=500, n_temps=4, max_temp=16.0,
        chunk_size=200, checkpoint_path=path,
    )
    ckpt = load_pt_checkpoint(path)
    assert int(ckpt["n_samples_drawn"]) == 400
    assert ckpt["qs"].shape == (4, 2)

    s2, info2, new_ckpt = run_parallel_tempering_resumed(
        vg, ckpt, n_samples=300, chunk_size=150,
        checkpoint_path=path,
    )
    assert s2.shape == (300, 2)
    assert np.all(np.isfinite(s2))
    assert int(new_ckpt["n_samples_drawn"]) == 700
    # resumed run keeps the adapted ladder and continues both modes' flow
    assert np.allclose(info2["temperatures"], info1["temperatures"])
    # checkpoint on disk was updated by the resumed run
    assert int(load_pt_checkpoint(path)["n_samples_drawn"]) == 700


def test_pt_replicas_shapes_and_exactness():
    """n_replicas=R returns (R, S, dim) — R independent cold chains, each
    sampling the exact target; swap statistics pool across replicas."""
    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    s, info = run_parallel_tempering(
        vg, jnp.zeros(3), jax.random.PRNGKey(7), n_samples=2500,
        n_adapts=1000, n_temps=4, max_temp=8.0, n_replicas=3,
    )
    assert s.shape == (3, 1500, 3)
    # replicas are driven by distinct keys -> distinct draws
    assert not np.allclose(s[0], s[1])
    for r in range(3):
        assert abs(s[r].mean()) < 0.15
        assert np.all(np.abs(s[r].var(0) - 1.0) < 0.3)
    assert info["lp"].shape == (1500, 3)
    assert info["diverging"].shape == (1500, 3, 4)
    assert 0.0 <= info["swap_acceptance"] <= 1.0
    assert info["final_psi"].shape == (3, 4, 3)


def test_pt_replica_mesh_matches_vmap():
    """A replica mesh shard_maps the SAME vmapped program over devices:
    samples must match the single-device vmapped run to numerical
    round-off (per-replica equivalence — SURVEY.md §5.8, VERDICT r2
    item 5), for both the diag and the pooled dense metric."""
    from manifold_constrained_gaussian_process_inference_tpu.inference.tempering import (
        make_replica_mesh,
    )

    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest forces an 8-device CPU mesh"
    vg = _bimodal_vg(sep=4.0)
    q0 = jnp.array([2.0, 0.0])
    kwargs = dict(
        n_samples=700, n_adapts=400, n_temps=4, max_temp=8.0,
        chunk_size=200, n_replicas=8,
    )
    for mm in ("diag", "dense-pooled"):
        s_vmap, info_v = run_parallel_tempering(
            vg, q0, jax.random.PRNGKey(5), mass_matrix=mm, **kwargs
        )
        mesh = make_replica_mesh(8)
        s_mesh, info_m = run_parallel_tempering(
            vg, q0, jax.random.PRNGKey(5), mass_matrix=mm, mesh=mesh,
            **kwargs
        )
        assert s_mesh.shape == s_vmap.shape == (8, 300, 2)
        np.testing.assert_allclose(s_mesh, s_vmap, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(
            info_m["swap_acceptance"], info_v["swap_acceptance"], atol=1e-12
        )
        np.testing.assert_allclose(
            info_m["temperatures"], info_v["temperatures"], rtol=1e-12
        )


def test_pt_replica_mesh_mismatch_raises():
    from manifold_constrained_gaussian_process_inference_tpu.inference.tempering import (
        make_replica_mesh,
    )

    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    with pytest.raises(ValueError, match="multiple of mesh size"):
        run_parallel_tempering(
            vg, jnp.zeros(2), jax.random.PRNGKey(0), n_samples=20,
            n_adapts=10, n_temps=2, n_replicas=3, mesh=make_replica_mesh(8),
        )


def test_pt_replicas_checkpoint_resume(tmp_path):
    from manifold_constrained_gaussian_process_inference_tpu.inference.tempering import (
        load_pt_checkpoint,
        run_parallel_tempering_resumed,
    )

    vg = _bimodal_vg(sep=6.0)
    path = str(tmp_path / "pt_rep_ckpt.npz")
    s1, info1 = run_parallel_tempering(
        vg, jnp.array([3.0, 0.0]), jax.random.PRNGKey(8),
        n_samples=900, n_adapts=500, n_temps=4, max_temp=16.0,
        chunk_size=200, checkpoint_path=path, n_replicas=2,
    )
    assert s1.shape == (2, 400, 2)
    ckpt = load_pt_checkpoint(path)
    assert ckpt["qs"].shape == (2, 4, 2)
    s2, info2, new_ckpt = run_parallel_tempering_resumed(
        vg, ckpt, n_samples=300, chunk_size=150,
    )
    assert s2.shape == (2, 300, 2)
    assert np.all(np.isfinite(s2))
    assert np.allclose(info2["temperatures"], info1["temperatures"])


def test_solve_magi_pt_replicas_smoke():
    """pt_replicas through the public API: theta_per_chain carries R cold
    chains and split-R-hat is computable across them."""
    from manifold_constrained_gaussian_process_inference_tpu import solve_magi
    from manifold_constrained_gaussian_process_inference_tpu.config import (
        MagiConfig,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import (
        FN_SYSTEM,
    )
    from manifold_constrained_gaussian_process_inference_tpu.postprocess.diagnostics import (
        split_rhat,
    )

    t = np.linspace(0.0, 10.0, 21)
    rng = np.random.default_rng(0)
    y = np.stack(
        [2.0 * np.sin(0.8 * t), 1.0 + 0.5 * np.cos(0.8 * t)], axis=-1
    ) + 0.2 * rng.normal(size=(21, 2))
    cfg = MagiConfig(
        niter_hmc=200, seed=0, sampler="pt-nuts", pt_temps=3,
        pt_replicas=2, phi=np.array([[2.0, 2.0], [1.5, 1.5]]),
        sigma=np.array([0.2, 0.2]),
    )
    res = solve_magi(y, t, FN_SYSTEM, cfg)
    tpc = res.diagnostics["theta_per_chain"]
    assert tpc.shape[0] == 2 and tpc.shape[2] == 3
    assert res.theta.shape[0] == 2 * tpc.shape[1]
    assert np.isfinite(split_rhat(tpc[:, :, 0]))
    assert res.diagnostics["n_chains"] == 2


def test_pt_pooled_dense_metric_on_correlated_gaussian():
    """mass_matrix='dense-pooled': per-rung dense metrics pooled across
    replicas; the cold chain must sample the strongly-correlated target
    exactly and the learned cold-rung metric must capture the correlation."""
    dim = 8
    rho = 0.95
    cov = np.full((dim, dim), rho) + (1 - rho) * np.eye(dim)
    prec = jnp.asarray(np.linalg.inv(cov))
    vg = jax.value_and_grad(lambda q: -0.5 * q @ prec @ q)
    s, info = run_parallel_tempering(
        vg, jnp.zeros(dim), jax.random.PRNGKey(3), n_samples=1600,
        n_adapts=800, n_temps=4, max_temp=8.0, n_replicas=2,
        mass_matrix="dense-pooled",
    )
    assert info["metric"] == "dense-pooled"
    assert info["inv_mass"].shape == (4, dim, dim)
    flat = np.asarray(s).reshape(-1, dim)
    assert np.all(np.abs(flat.mean(0)) < 0.25)
    emp = np.cov(flat.T)
    assert abs(emp[0, 1] - rho) < 0.2
    # cold-rung learned metric sees the equicorrelation
    assert info["inv_mass"][0][0, 1] > 0.3


def test_pt_pooled_checkpoint_resume(tmp_path):
    from manifold_constrained_gaussian_process_inference_tpu.inference.tempering import (
        load_pt_checkpoint,
        run_parallel_tempering_resumed,
    )

    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    path = str(tmp_path / "pt_pooled.npz")
    s, info = run_parallel_tempering(
        vg, jnp.zeros(3), jax.random.PRNGKey(5), n_samples=900,
        n_adapts=600, n_temps=3, max_temp=4.0,
        mass_matrix="dense-pooled", checkpoint_path=path,
    )
    ck = load_pt_checkpoint(path)
    assert "metric_minv" in ck and ck["metric_minv"].shape == (3, 3, 3)
    s2, info2, ck2 = run_parallel_tempering_resumed(vg, ck, n_samples=800)
    assert s2.shape == (800, 3)
    flat = np.asarray(s2)
    assert np.all(np.isfinite(flat))
    assert abs(flat.mean()) < 0.15
    assert "metric_minv" in ck2
