"""Checkpoint/resume tests (new capability; the reference has none —
SURVEY.md section 5.4)."""
import jax
import jax.numpy as jnp
import numpy as np

from manifold_constrained_gaussian_process_inference_tpu.inference.checkpoint import (
    SamplerCheckpoint,
    load_checkpoint,
    run_chains_resumed,
    save_checkpoint,
)
from manifold_constrained_gaussian_process_inference_tpu.parallel.chains import (
    run_chains,
)
import pytest

pytestmark = pytest.mark.slow  # heavy sampler E2E; fast suite = -m "not slow"


def _vg():
    return jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))


def test_checkpoint_roundtrip(tmp_path):
    ck = SamplerCheckpoint(
        psi=np.ones((2, 3)),
        step_size=np.array([0.5, 0.6]),
        inv_mass=np.ones((2, 3)) * 2.0,
        key=np.asarray(jax.random.split(jax.random.PRNGKey(0), 2)),
        n_samples_drawn=40,
    )
    p = tmp_path / "ck.npz"
    save_checkpoint(str(p), ck)
    back = load_checkpoint(str(p))
    assert np.array_equal(back.psi, ck.psi)
    assert np.array_equal(back.step_size, ck.step_size)
    assert np.array_equal(back.inv_mass, ck.inv_mass)
    assert np.array_equal(back.key, ck.key)
    assert back.n_samples_drawn == 40


def test_resume_continues_sampling(tmp_path):
    """Warmup once, then two resumed legs; the resumed sampler keeps the
    adapted step size/metric and produces valid draws."""
    vg = _vg()
    dim, n_chains = 3, 2
    psi0 = jnp.zeros((n_chains, dim))
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)
    samples, info = run_chains(vg, psi0, keys, n_samples=300, n_adapts=200)

    ck = SamplerCheckpoint(
        psi=np.asarray(info["final_psi"]),
        step_size=np.atleast_1d(np.asarray(info["step_size"])),
        inv_mass=np.asarray(info["inv_mass"]),
        key=np.asarray(info["final_key"]),
        n_samples_drawn=int(np.prod(samples.shape[:2])),
    )
    save_checkpoint(str(tmp_path / "ck.npz"), ck)
    ck1 = load_checkpoint(str(tmp_path / "ck.npz"))

    s1, info1, ck2 = run_chains_resumed(vg, ck1, n_samples=400)
    assert s1.shape == (n_chains, 400, dim)
    assert ck2.n_samples_drawn == ck1.n_samples_drawn + n_chains * 400
    # second leg continues from new state, different draws
    s2, _, _ = run_chains_resumed(vg, ck2, n_samples=100)
    assert not np.allclose(np.asarray(s2[:, 0]), np.asarray(s1[:, 0]))
    # pooled moments still match the target
    pooled = np.concatenate(
        [np.asarray(samples).reshape(-1, dim), np.asarray(s1).reshape(-1, dim)]
    )
    assert np.abs(pooled.mean(0)).max() < 0.25
    assert np.abs(pooled.var(0) - 1.0).max() < 0.35


def test_resume_deterministic(tmp_path):
    vg = _vg()
    ck = SamplerCheckpoint(
        psi=np.zeros((1, 2)),
        step_size=np.array([0.8]),
        inv_mass=np.ones((1, 2)),
        key=np.asarray(jax.random.split(jax.random.PRNGKey(5), 1)),
    )
    s1, _, _ = run_chains_resumed(vg, ck, n_samples=50)
    s2, _, _ = run_chains_resumed(vg, ck, n_samples=50)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))


def test_auto_checkpoint_every_chunk(tmp_path):
    """run_chains writes a resumable checkpoint after every sampling chunk."""
    vg = _vg()
    path = str(tmp_path / "auto.npz")
    samples, info = run_chains(
        vg, jnp.zeros((2, 3)), jax.random.split(jax.random.PRNGKey(2), 2),
        n_samples=120, n_adapts=40, chunk_size=40, checkpoint_path=path,
    )
    ck = load_checkpoint(path)
    assert ck.n_samples_drawn == 2 * 80
    assert np.array_equal(ck.psi, np.asarray(info["final_psi"]))
    # resume continues cleanly
    s2, _, _ = run_chains_resumed(vg, ck, n_samples=30)
    assert s2.shape == (2, 30, 3)


def test_solve_magi_checkpoint_path(tmp_path):
    import manifold_constrained_gaussian_process_inference_tpu as m
    from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig
    from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM

    rng = np.random.default_rng(0)
    t = np.linspace(0, 4, 9)
    y = np.stack([np.sin(t), np.cos(t)], -1) + 0.2 * rng.normal(size=(9, 2))
    path = str(tmp_path / "solve.npz")
    cfg = MagiConfig(
        niter_hmc=40, seed=1, checkpoint_path=path, chunk_size=10,
        sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
    )
    m.solve_magi(y, t, FN_SYSTEM, cfg)
    ck = load_checkpoint(path)
    assert ck.psi.shape == (1, 9 * 2 + 3)


def test_chees_checkpoint_resume(tmp_path):
    """run_chees writes a resumable checkpoint after every sampling chunk
    (VERDICT r2 item 9); run_chees_resumed keeps the frozen step size /
    metric / trajectory length, continues the Halton sequence at the saved
    iteration index, is deterministic, and keeps sampling the target."""
    from manifold_constrained_gaussian_process_inference_tpu.inference.chees import (
        run_chees,
        run_chees_resumed,
    )

    vg = _vg()
    n_chains, dim = 8, 3
    path = str(tmp_path / "chees.npz")
    psi0 = jnp.zeros((n_chains, dim))
    samples, info = run_chees(
        vg, psi0, jax.random.PRNGKey(3), n_samples=600, n_adapts=300,
        chunk_size=100, checkpoint_path=path,
    )
    ck = load_checkpoint(path)
    assert ck.meta["sampler"] == "chees"
    assert ck.meta["trajectory_length"] == info["trajectory_length"]
    assert ck.meta["iteration"] == 600
    assert "traj_adam_m" in ck.meta
    assert ck.n_samples_drawn == n_chains * 300
    assert np.array_equal(ck.psi, np.asarray(info["final_psi"]))

    s1, info1, ck2 = run_chees_resumed(vg, ck, n_samples=400, chunk_size=100)
    assert s1.shape == (n_chains, 400, dim)
    assert info1["trajectory_length"] == info["trajectory_length"]
    assert float(info1["step_size"]) == float(info["step_size"])
    assert ck2.n_samples_drawn == ck.n_samples_drawn + n_chains * 400
    assert ck2.meta["iteration"] == 1000
    # determinism: resuming twice from the same checkpoint matches exactly
    s1b, _, _ = run_chees_resumed(vg, ck, n_samples=400, chunk_size=100)
    assert np.array_equal(s1, s1b)
    # pooled moments of warm + resumed draws still match the unit Gaussian
    pooled = np.concatenate(
        [np.asarray(samples).reshape(-1, dim), s1.reshape(-1, dim)]
    )
    assert np.abs(pooled.mean(0)).max() < 0.25
    assert np.abs(pooled.var(0) - 1.0).max() < 0.35


def _fn_problem():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 4, 9)
    y = np.stack([np.sin(t), np.cos(t)], -1) + 0.2 * rng.normal(size=(9, 2))
    return y, t


def test_solve_magi_resume_equals_uninterrupted(tmp_path):
    """solve_magi(resume=ckpt) continues sampling so that a checkpointed
    short run plus a resumed leg reproduces the uninterrupted run's draws:
    identical warmup, then the resumed leg replays the same frozen-eps/
    metric transitions from the saved carry (positions, PRNG keys). The
    resumed leg is a DIFFERENT compiled program (it re-evaluates vg at the
    carry; XLA fuses it differently), so draws agree to f64 fusion noise
    (~1e-13 measured), not bitwise. VERDICT r3 item 4."""
    import dataclasses

    import manifold_constrained_gaussian_process_inference_tpu as m
    from manifold_constrained_gaussian_process_inference_tpu.config import (
        MagiConfig,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import (
        FN_SYSTEM,
    )

    y, t = _fn_problem()
    base = dict(
        seed=3, n_chains=2, chain_init_jitter=0.1,
        sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
    )
    # 20 warmup + 40 kept, uninterrupted
    long_cfg = MagiConfig(niter_hmc=60, burnin_ratio=1 / 3, **base)
    res_long = m.solve_magi(y, t, FN_SYSTEM, long_cfg)
    # same 20 warmup + first 20 kept, checkpointed
    path = str(tmp_path / "resume.npz")
    short_cfg = MagiConfig(
        niter_hmc=40, burnin_ratio=0.5, checkpoint_path=path, **base
    )
    res_short = m.solve_magi(y, t, FN_SYSTEM, short_cfg)
    # resumed leg: 20 more draws from the checkpoint path
    res_more = m.solve_magi(
        y, t, FN_SYSTEM,
        dataclasses.replace(short_cfg, niter_hmc=20, checkpoint_path=None),
        resume=path,
    )
    th_long = res_long.diagnostics["theta_per_chain"]   # (2, 40, 3)
    th_short = res_short.diagnostics["theta_per_chain"]  # (2, 20, 3)
    th_more = res_more.diagnostics["theta_per_chain"]    # (2, 20, 3)
    # same program, same draws: warmup + first kept leg are bitwise equal
    assert np.array_equal(th_long[:, :20], th_short)
    # resumed leg: same transitions, different program -> ulp-level only
    np.testing.assert_allclose(th_long[:, 20:], th_more, rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        res_long.diagnostics["lp_per_chain"][:, 20:],
        res_more.diagnostics["lp_per_chain"],
        rtol=1e-10, atol=0,
    )
    # the loaded-object form resumes identically to the path form
    ck = load_checkpoint(path)
    res_obj = m.solve_magi(
        y, t, FN_SYSTEM,
        dataclasses.replace(short_cfg, niter_hmc=20, checkpoint_path=None),
        resume=ck,
    )
    assert np.array_equal(
        th_more, res_obj.diagnostics["theta_per_chain"]
    )


def test_solve_magi_resume_pt(tmp_path):
    """solve_magi(resume=...) with sampler='pt-nuts' continues from the PT
    checkpoint (frozen ladder/eps/metrics) and returns the normalized
    multi-replica result contract."""
    import dataclasses

    import manifold_constrained_gaussian_process_inference_tpu as m
    from manifold_constrained_gaussian_process_inference_tpu.config import (
        MagiConfig,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import (
        FN_SYSTEM,
    )

    y, t = _fn_problem()
    path = str(tmp_path / "pt.npz")
    cfg = MagiConfig(
        niter_hmc=40, seed=5, sampler="pt-nuts", pt_temps=3, pt_replicas=2,
        checkpoint_path=path, chunk_size=10,
        sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
    )
    m.solve_magi(y, t, FN_SYSTEM, cfg)
    res = m.solve_magi(
        y, t, FN_SYSTEM,
        dataclasses.replace(cfg, niter_hmc=15, checkpoint_path=None),
        resume=path,
    )
    d = res.diagnostics
    assert d["n_chains"] == 2
    assert d["theta_per_chain"].shape == (2, 15, 3)
    assert np.all(np.isfinite(res.lp))
    assert "swap_acceptance" in d


def test_solve_magi_resume_dimension_mismatch(tmp_path):
    """A checkpoint from different data/config is rejected up front."""
    import manifold_constrained_gaussian_process_inference_tpu as m
    from manifold_constrained_gaussian_process_inference_tpu.config import (
        MagiConfig,
    )
    from manifold_constrained_gaussian_process_inference_tpu.inference.solve import (
        MagiError,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import (
        FN_SYSTEM,
    )

    y, t = _fn_problem()
    bad = SamplerCheckpoint(
        psi=np.zeros((1, 7)), step_size=np.array([0.5]),
        inv_mass=np.ones((1, 7)),
        key=np.asarray(jax.random.split(jax.random.PRNGKey(0), 1)),
    )
    cfg = MagiConfig(
        niter_hmc=10, sigma=[0.2, 0.2],
        phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
    )
    with pytest.raises(MagiError, match="dimension"):
        m.solve_magi(y, t, FN_SYSTEM, cfg, resume=bad)


def test_warmup_resume_equality(tmp_path, monkeypatch):
    """A run killed MID-WARMUP resumes from its warmup-phase checkpoint and
    produces BITWISE-identical post-warmup draws to the uninterrupted run
    (VERDICT r4 item 8). The mid-warmup snapshot is captured by
    intercepting the per-chunk checkpoint writes; the 'killed' run is then
    simulated by resuming run_chains from that snapshot."""
    import manifold_constrained_gaussian_process_inference_tpu.parallel.chains as chains_mod
    from manifold_constrained_gaussian_process_inference_tpu.inference import (
        checkpoint as ck_mod,
    )

    rng = np.random.default_rng(1)
    a = np.array([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.asarray(np.linalg.inv(a))
    vg = jax.value_and_grad(lambda q: -0.5 * q @ prec @ q)
    n_chains = 4
    psi0 = jnp.asarray(rng.normal(size=(n_chains, 2)) * 0.1)
    keys = jax.random.split(jax.random.PRNGKey(7), n_chains)
    kwargs = dict(
        n_samples=260, n_adapts=200, mass_matrix="dense-pooled",
        chunk_size=50, step_jitter=0.25,
    )

    # Uninterrupted run; snapshot the FIRST mid-warmup checkpoint write.
    snap_path = str(tmp_path / "midwarm.npz")
    real_save = ck_mod.save_checkpoint
    captured = {}

    def capture(path, ck):
        if ck.phase == "warmup" and "pos" not in captured:
            mid = 0 < int(ck.warmup["pos"]) < kwargs["n_adapts"]
            if mid:
                captured["pos"] = int(ck.warmup["pos"])
                real_save(snap_path, ck)
        real_save(path, ck)

    monkeypatch.setattr(chains_mod, "save_checkpoint", capture, raising=False)
    # save_checkpoint is imported inside the loop from inference.checkpoint
    monkeypatch.setattr(ck_mod, "save_checkpoint", capture)
    full_path = str(tmp_path / "full.npz")
    s_full, info_full = run_chains(
        vg, psi0, keys, checkpoint_path=full_path, **kwargs
    )
    assert "pos" in captured and 0 < captured["pos"] < 200

    # Resume from the mid-warmup snapshot with the same arguments.
    monkeypatch.setattr(ck_mod, "save_checkpoint", real_save)
    ck = load_checkpoint(snap_path)
    assert ck.phase == "warmup"
    assert ck.meta["step_jitter"] == 0.25
    s_res, info_res = run_chains(
        vg, psi0, keys, resume_ckpt=ck, **kwargs
    )
    # Bitwise equality: same chunk schedule, same compiled programs, same
    # restored adaptation state, same host-side jitter stream.
    assert np.array_equal(np.asarray(s_full), np.asarray(s_res))
    assert np.array_equal(
        np.asarray(info_full["step_size"]), np.asarray(info_res["step_size"])
    )
    assert np.array_equal(
        np.asarray(info_full["inv_mass"]), np.asarray(info_res["inv_mass"])
    )
    assert np.array_equal(
        np.asarray(info_full["warmup_diverging"]),
        np.asarray(info_res["warmup_diverging"]),
    )
    assert np.array_equal(
        np.asarray(info_full["lp"]), np.asarray(info_res["lp"])
    )

    # A warmup-phase checkpoint is rejected by the post-warmup resume path.
    with pytest.raises(ValueError, match="mid-warmup"):
        run_chains_resumed(vg, ck, n_samples=10)


def test_warmup_resume_through_solve_magi(tmp_path, monkeypatch):
    """solve_magi(resume=<warmup-phase ckpt>) re-derives the deterministic
    setup and continues warmup: final draws match the uninterrupted
    solve_magi run bitwise (same compiled programs, same seed-derived
    keys/jitter stream)."""
    import manifold_constrained_gaussian_process_inference_tpu as m
    from manifold_constrained_gaussian_process_inference_tpu.config import (
        MagiConfig,
    )
    from manifold_constrained_gaussian_process_inference_tpu.inference import (
        checkpoint as ck_mod,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import (
        FN_SYSTEM,
    )

    y, t = _fn_problem()
    path = str(tmp_path / "solve_wu.npz")
    cfg = MagiConfig(
        niter_hmc=60, burnin_ratio=0.5, seed=11, n_chains=2,
        chain_init_jitter=0.1, mass_matrix="dense-pooled",
        chunk_size=10, checkpoint_path=path, step_jitter=0.25,
        sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
    )
    snap_path = str(tmp_path / "solve_wu_mid.npz")
    real_save = ck_mod.save_checkpoint
    captured = {}

    def capture(p, ck):
        if ck.phase == "warmup" and "pos" not in captured:
            if 0 < int(ck.warmup["pos"]) < 30:
                captured["pos"] = int(ck.warmup["pos"])
                real_save(snap_path, ck)
        real_save(p, ck)

    monkeypatch.setattr(ck_mod, "save_checkpoint", capture)
    res_full = m.solve_magi(y, t, FN_SYSTEM, cfg)
    monkeypatch.setattr(ck_mod, "save_checkpoint", real_save)
    assert "pos" in captured

    res_resumed = m.solve_magi(y, t, FN_SYSTEM, cfg, resume=snap_path)
    assert np.array_equal(
        res_full.diagnostics["theta_per_chain"],
        res_resumed.diagnostics["theta_per_chain"],
    )
    assert np.array_equal(
        res_full.diagnostics["lp_per_chain"],
        res_resumed.diagnostics["lp_per_chain"],
    )


def test_nan_guard_passthrough():
    from manifold_constrained_gaussian_process_inference_tpu.utils.debugging import (
        nan_guard,
    )

    vg = nan_guard(_vg())
    v, g = jax.jit(vg)(jnp.ones(3))
    assert np.isclose(float(v), -1.5)
    assert np.allclose(np.asarray(g), -np.ones(3))


def test_resume_dense_pooled_metric(tmp_path):
    """A dense-pooled run's checkpoint resumes with the SHARED dense metric
    (meta-tagged (dim, dim) M^-1) and keeps sampling the right target."""
    rng = np.random.default_rng(0)
    a = np.array([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.asarray(np.linalg.inv(a))
    vg = jax.value_and_grad(lambda q: -0.5 * q @ prec @ q)
    n_chains = 4
    psi0 = jnp.asarray(rng.normal(size=(n_chains, 2)) * 0.1)
    keys = jax.random.split(jax.random.PRNGKey(2), n_chains)
    ckpt_path = str(tmp_path / "ck_dense.npz")
    samples, info = run_chains(
        vg, psi0, keys, n_samples=500, n_adapts=300,
        mass_matrix="dense-pooled", checkpoint_path=ckpt_path,
    )
    ck = load_checkpoint(ckpt_path)
    assert ck.meta["metric"] == "dense-pooled"
    # jitter settings ride the checkpoint so a resumed run keeps the
    # pocket-rescue behavior (run_chains default: off)
    assert ck.meta["step_jitter"] == 0.0
    assert ck.inv_mass.shape == (2, 2)

    s1, info1, ck2 = run_chains_resumed(vg, ck, n_samples=600)
    assert s1.shape == (n_chains, 600, 2)
    flat = np.asarray(s1).reshape(-1, 2)
    assert np.all(np.isfinite(flat))
    # resumed draws still target the correlated Gaussian
    assert abs(np.corrcoef(flat.T)[0, 1] - 0.9) < 0.12
    assert ck2.inv_mass.shape == (2, 2)
    assert ck2.n_samples_drawn == ck.n_samples_drawn + n_chains * 600
