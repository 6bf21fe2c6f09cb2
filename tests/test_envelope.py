"""Divergence-informed curvature-envelope tests (parallel/chains.py
CurvatureEnvelope — the principled fix for localized sharp-curvature
pockets, docs/ROADMAP.md Weak #1).

The reference has no analogue: AdvancedHMC's metric is diagonal-only
(samplers.jl:144) and its sampler ASSERTS on the pocket's divergent
trajectories (samplers.jl:58-60). The envelope is a TPU-native extension:
the exact local curvature is probed at positions where warmup chains
diverge and PSD-max folded into the pooled dense metric, so only the
directions the pocket needs get extra metric mass.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.parallel.chains import (
    CurvatureEnvelope,
    run_chains,
)


def _spd(dim, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((dim, dim))
    return scale * (a @ a.T / dim + np.eye(dim))


class TestFold:
    def test_psd_max_dominates_both(self):
        """P_env must dominate the pooled precision AND every probe."""
        dim = 8
        cov = _spd(dim, 1)
        p_pool = np.linalg.inv(cov)
        rng = np.random.default_rng(2)
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        probe = p_pool + 80.0 * np.outer(v, v)
        env = CurvatureEnvelope(hess_fn=None)
        env.points.append(np.zeros(dim))
        env.precs.append(probe)
        cov_env = env.fold(cov)
        p_env = np.linalg.inv(cov_env)
        assert np.linalg.eigvalsh(p_env - p_pool).min() > -1e-9
        assert np.linalg.eigvalsh(p_env - probe).min() > -1e-9
        assert env.boost_dirs >= 1

    def test_dominated_probe_is_noop(self):
        """A probe the pooled precision already dominates changes nothing."""
        dim = 5
        cov = _spd(dim, 3)
        env = CurvatureEnvelope(hess_fn=None)
        env.points.append(np.zeros(dim))
        env.precs.append(0.5 * np.linalg.inv(cov))
        assert np.allclose(env.fold(cov), cov)
        assert env.boost_dirs == 0

    def test_indefinite_probe_only_boosts(self):
        """Negative-curvature directions of an off-mode Hessian are
        ignored (clip floor 1): the enveloped precision never DROPS."""
        dim = 4
        cov = _spd(dim, 4)
        p_pool = np.linalg.inv(cov)
        probe = np.diag([500.0, -300.0, 0.0, 0.1])
        env = CurvatureEnvelope(hess_fn=None)
        env.points.append(np.zeros(dim))
        env.precs.append(probe)
        cov_env = env.fold(cov)
        p_env = np.linalg.inv(cov_env)
        assert np.linalg.eigvalsh(p_env - p_pool).min() > -1e-9

    def test_lam_cap_bounds_boost(self):
        """A garbage probe cannot boost any direction past lam_cap."""
        dim = 3
        cov = np.eye(dim)
        env = CurvatureEnvelope(hess_fn=None, lam_cap=100.0)
        env.points.append(np.zeros(dim))
        env.precs.append(np.diag([1e12, 1.0, 1.0]))
        cov_env = env.fold(cov)
        p_env = np.linalg.inv(cov_env)
        assert np.linalg.eigvalsh(p_env).max() < 100.0 * 1.01

    def test_empty_envelope_is_identity(self):
        cov = _spd(6, 5)
        env = CurvatureEnvelope(hess_fn=None)
        assert env.fold(cov) is cov


class TestCollect:
    def test_gates(self):
        """No collection before the first window boundary, from clean
        chunks, or from mass-divergent chunks."""
        calls = []

        def hess(z):
            calls.append(np.asarray(z))
            return np.eye(2)

        env = CurvatureEnvelope(hess_fn=hess, max_div_frac=0.05)
        q = np.zeros((4, 2, 2))  # (C, edge/leaf, dim)
        has = np.array([True, False, False, False])
        div_one = np.zeros((4, 100), bool)
        div_one[0, 7] = True
        # before first boundary: ignored
        env.collect(q, has, div_one, past_first_window=False)
        assert not env.points
        # clean chunk: ignored
        env.collect(q, np.zeros(4, bool), np.zeros((4, 100), bool), True)
        assert not env.points
        # mass divergence (wrong eps, not a pocket): ignored
        env.collect(q, np.ones(4, bool), np.ones((4, 100), bool), True)
        assert not env.points
        # localized divergence: one probe, at the most-divergent chain
        env.collect(q, has, div_one, past_first_window=True)
        assert len(env.points) == 1 and len(calls) == 1

    def test_max_points(self):
        env = CurvatureEnvelope(hess_fn=lambda z: np.eye(2), max_points=2)
        q = np.zeros((2, 2, 2))
        has = np.array([True, True])
        div = np.zeros((2, 50), bool)
        div[0, 3] = True
        for _ in range(5):
            env.collect(q, has, div, past_first_window=True)
        assert len(env.points) == 2

    def test_probe_point_bisection(self):
        """The probe walks from the edge toward the exploded leaf and
        stops at the farthest point still within support_drop log-units
        of the edge density."""

        def logp(z):
            return -0.5 * z[0] ** 2 - 1000.0 * max(float(z[0]) - 3.0, 0.0)

        env = CurvatureEnvelope(
            hess_fn=None, logp_fn=logp, support_drop=50.0
        )
        edge = np.array([1.0])
        zt = env._probe_point(edge, np.array([33.0]))
        assert 1.0 < zt[0] <= 3.1, zt  # support boundary at z = 3
        # non-finite leaf coordinates are sanitized, not propagated
        zt2 = env._probe_point(edge, np.array([np.nan]))
        assert np.all(np.isfinite(zt2))
        # without a logp_fn the edge is the probe point
        env2 = CurvatureEnvelope(hess_fn=None)
        assert env2._probe_point(edge, np.array([33.0]))[0] == edge[0]

    def test_checkpoint_state_roundtrip(self, tmp_path):
        """Envelope probes survive a warmup-phase checkpoint write/load
        (inference/checkpoint.py wu_env_* keys), so a resumed warmup folds
        the SAME precisions."""
        from manifold_constrained_gaussian_process_inference_tpu.inference.checkpoint import (
            SamplerCheckpoint,
            load_checkpoint,
            save_checkpoint,
        )

        env = CurvatureEnvelope(hess_fn=None)
        rng = np.random.default_rng(0)
        for i in range(2):
            env.points.append(rng.standard_normal(3))
            env.precs.append(_spd(3, i))
        path = str(tmp_path / "wu.npz")
        save_checkpoint(path, SamplerCheckpoint(
            psi=np.zeros((2, 3)), step_size=np.zeros(0),
            inv_mass=np.eye(3), key=np.zeros((2, 2), np.uint32),
            phase="warmup",
            warmup={
                "pos": 100, "carry_leaves": [np.zeros(3)],
                "metric_minv": np.eye(3), "metric_chol": np.eye(3),
                "metric_pchol": np.eye(3), "moments": [],
                "div": np.zeros((2, 0)), "envelope": env.state(),
            },
        ))
        ck = load_checkpoint(path)
        env2 = CurvatureEnvelope(hess_fn=None)
        env2.restore(ck.warmup["envelope"])
        for a, b in zip(env.points + env.precs, env2.points + env2.precs):
            np.testing.assert_array_equal(a, b)


def _pocket_target(curv=1000.0, edge=1.2, width=0.4):
    """2-D analogue of the FN theta_b~0.48 pocket: z1 ~ N(0,1) exactly
    and z2 | z1 ~ N(0, 1/g(z1)) with the conditional curvature g rising
    smoothly from 1 to ~curv past z1 = edge (the + 0.5 log g term keeps
    the conditional normalized: a locally-quadratic curvature pocket
    holding ~11% of the posterior mass, with NO potential wall). The
    pooled covariance sees mostly the bulk (var z2 ~ 0.9), dual averaging
    holds eps for the bulk accept target, and the pocket diverges at that
    eps — exactly the measured production failure mode
    (docs/BENCHMARKS.md pocket forensics: P(divergence) = 0.64 in-pocket
    at the bulk-adapted eps)."""

    def logp(z):
        g = 1.0 + (curv - 1.0) * jax.nn.sigmoid((z[0] - edge) / width)
        return -0.5 * z[0] ** 2 - 0.5 * g * z[1] ** 2 + 0.5 * jnp.log(g)

    return logp


@pytest.mark.slow
class TestPocketE2E:
    def _run(self, envelope):
        logp = _pocket_target()
        vg = jax.value_and_grad(logp)
        n_chains = 8
        rng = np.random.default_rng(0)
        psi0 = jnp.asarray(0.1 * rng.standard_normal((n_chains, 2)))
        keys = jax.random.split(jax.random.PRNGKey(7), n_chains)
        return run_chains(
            vg, psi0, keys, n_samples=900, n_adapts=500,
            initial_step_size=0.2, mass_matrix="dense-pooled",
            target_accept=0.8, envelope=envelope,
        )

    def test_envelope_tames_pocket_divergences(self):
        logp = _pocket_target()

        def hess_fn(z):
            return -np.asarray(jax.hessian(logp)(jnp.asarray(z)))

        _, info_plain = self._run(None)
        env = CurvatureEnvelope(
            hess_fn,
            logp_fn=lambda z: float(logp(jnp.asarray(z))),
            max_div_frac=0.5,
        )
        s_env, info_env = self._run(env)
        div_plain = int(np.sum(info_plain["diverging"]))
        div_env = int(np.sum(info_env["diverging"]))
        # the reproducer must actually reproduce (measured 49 at this
        # seed under x64), and the envelope must collapse it (measured
        # 0), not merely dent it
        assert div_plain >= 15, div_plain
        assert div_env <= div_plain // 5, (div_plain, div_env)
        assert info_env["envelope_points"] >= 1
        assert info_env["envelope_boost_dirs"] >= 1
        # the whole point vs step_jitter: the pocket stops taxing the
        # bulk, so the adapted step size RISES (measured 0.25 -> 4.5)
        assert (
            float(np.mean(info_env["step_size"]))
            > 1.5 * float(np.mean(info_plain["step_size"]))
        )
        # recovery: the exact z1 ~ N(0,1) marginal and the pocket's mass
        flat = np.asarray(s_env).reshape(-1, 2)
        assert np.all(np.isfinite(flat))
        assert abs(float(flat[:, 0].mean())) < 0.2
        assert abs(float(flat[:, 0].std()) - 1.0) < 0.15
        occ = float((flat[:, 0] > 1.2).mean())
        assert 0.05 < occ < 0.2, occ  # true P(z1 > 1.2) = 0.115

    def test_envelope_inactive_is_bitwise_noop(self):
        """On a clean target the envelope collects nothing and the run is
        bit-identical to envelope=None (the production regression guard)."""

        def fail(z):  # pragma: no cover - must never be called
            raise AssertionError("hess_fn called on a divergence-free run")

        vg = jax.value_and_grad(lambda z: -0.5 * jnp.sum(z ** 2))
        psi0 = jnp.zeros((4, 3))
        keys = jax.random.split(jax.random.PRNGKey(3), 4)
        kw = dict(
            n_samples=300, n_adapts=150, initial_step_size=0.3,
            mass_matrix="dense-pooled",
        )
        s_plain, _ = run_chains(vg, psi0, keys, **kw)
        s_env, info = run_chains(
            vg, psi0, keys, envelope=CurvatureEnvelope(fail), **kw
        )
        np.testing.assert_array_equal(np.asarray(s_plain), np.asarray(s_env))
        assert info["envelope_points"] == 0
