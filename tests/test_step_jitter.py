"""Post-warmup step-size jitter (parallel/chains.py ``step_jitter``).

The pocket-rescue mechanism for localized sharp-curvature regions the
global whitener/metric cannot flatten (FN theta_b~0.48 —
docs/BENCHMARKS.md forensics): with probability p per post-warmup
iteration, the shared frozen step size is scaled by a log-uniform
multiplier in [low, 1]. Drawn host-side before sampling, so the
transition kernel remains exactly target-invariant (Stan-style
stepsize_jitter, downward-only). The reference has no equivalent
(AdvancedHMC asserts on the pocket's -Inf: samplers.jl:58-60)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.parallel.chains import (
    jitter_multipliers,
    run_chains,
)

pytestmark = pytest.mark.slow  # sampler E2E; fast suite = -m "not slow"


def _corr_gaussian(dim=8, rho=0.95):
    cov = np.full((dim, dim), rho) + (1 - rho) * np.eye(dim)
    prec_j = jnp.asarray(np.linalg.inv(cov))

    def vg(q):
        return jax.value_and_grad(lambda x: -0.5 * x @ prec_j @ x)(q)

    return vg, cov


def test_jitter_multipliers_distribution_and_determinism():
    rng = np.random.default_rng(0)
    m = np.asarray(jitter_multipliers(rng, 20000, 0.25, 0.4, jnp.float64))
    hit = m < 1.0
    # hit fraction ~ p
    assert abs(hit.mean() - 0.25) < 0.02
    # jittered multipliers live in [low, 1), log-uniform
    assert m[hit].min() >= 0.4 and m[hit].max() < 1.0
    logm = np.log(m[hit])
    assert abs(logm.mean() - 0.5 * np.log(0.4)) < 0.02
    # off => exact ones
    m0 = np.asarray(jitter_multipliers(rng, 100, 0.0, 0.4, jnp.float64))
    assert np.all(m0 == 1.0)
    # deterministic given the generator seed
    a = np.asarray(
        jitter_multipliers(np.random.default_rng(7), 512, 0.3, 0.5,
                           jnp.float64)
    )
    b = np.asarray(
        jitter_multipliers(np.random.default_rng(7), 512, 0.3, 0.5,
                           jnp.float64)
    )
    assert np.array_equal(a, b)


def test_jitter_rejected_on_diag_path():
    vg, _ = _corr_gaussian(dim=4)
    psi0 = jnp.zeros((2, 4))
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    with pytest.raises(ValueError, match="dense-pooled"):
        run_chains(vg, psi0, keys, n_samples=20, n_adapts=10,
                   mass_matrix="diag", step_jitter=0.2)


def test_jittered_sampling_preserves_target_and_is_deterministic():
    """Moments of a correlated Gaussian are recovered with aggressive
    jitter on (validity of the inhomogeneous kernel), runs are
    deterministic given keys, and the jittered run genuinely differs
    from the unjittered one."""
    dim = 8
    vg, cov = _corr_gaussian(dim=dim, rho=0.9)
    n_chains = 8
    psi0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_chains, dim)) * 0.1
    )
    keys = jax.random.split(jax.random.PRNGKey(2), n_chains)
    kwargs = dict(
        n_samples=900, n_adapts=500, initial_step_size=0.2,
        mass_matrix="dense-pooled",
    )

    s_jit, info_jit = run_chains(
        vg, psi0, keys, step_jitter=0.3, step_jitter_low=0.4, **kwargs
    )
    s_jit2, _ = run_chains(
        vg, psi0, keys, step_jitter=0.3, step_jitter_low=0.4, **kwargs
    )
    s_off, info_off = run_chains(vg, psi0, keys, **kwargs)

    assert info_jit["step_jitter"] == (0.3, 0.4)
    assert info_off["step_jitter"] == (0.0, 0.4)
    np.testing.assert_array_equal(np.asarray(s_jit), np.asarray(s_jit2))
    assert not np.array_equal(np.asarray(s_jit), np.asarray(s_off))

    flat = np.asarray(s_jit).reshape(-1, dim)
    assert np.all(np.isfinite(flat))
    assert np.all(np.abs(flat.mean(0)) < 0.2)
    emp = np.cov(flat.T)
    assert abs(emp[0, 1] - 0.9) < 0.15
    assert np.all(np.abs(np.diag(emp) - 1.0) < 0.3)
    assert not np.any(info_jit["diverging"])


def test_jitter_batched_vs_vmap_transition_agree():
    """The batched and vmapped pooled drivers consume the identical
    (keys-seeded) multiplier stream, so their trajectories must agree to
    float tolerance with jitter ON (extends the
    tests/test_nuts_batched.py exactness invariant)."""
    dim = 6
    vg, _ = _corr_gaussian(dim=dim, rho=0.8)
    n_chains = 4
    psi0 = jnp.asarray(
        np.random.default_rng(1).normal(size=(n_chains, dim)) * 0.1
    )
    keys = jax.random.split(jax.random.PRNGKey(3), n_chains)
    kwargs = dict(
        n_samples=500, n_adapts=300, initial_step_size=0.2,
        mass_matrix="dense-pooled", step_jitter=0.5, step_jitter_low=0.5,
    )
    s_b, info_b = run_chains(vg, psi0, keys, batched_transition=True,
                             **kwargs)
    s_v, info_v = run_chains(vg, psi0, keys, batched_transition=False,
                             **kwargs)
    np.testing.assert_allclose(
        np.asarray(s_b), np.asarray(s_v), rtol=0, atol=1e-9
    )
    np.testing.assert_array_equal(
        np.asarray(info_b["tree_depth"]), np.asarray(info_v["tree_depth"])
    )


def test_resume_honors_checkpoint_jitter_meta():
    """A dense-pooled checkpoint records the jitter settings; the resumed
    segment keeps jittering (its multiplier stream is keys-seeded for the
    segment) and stays statistically sound."""
    import os
    import tempfile

    from manifold_constrained_gaussian_process_inference_tpu.inference.checkpoint import (
        load_checkpoint,
        run_chains_resumed,
    )

    dim = 4
    vg, _ = _corr_gaussian(dim=dim, rho=0.8)
    n_chains = 4
    psi0 = jnp.zeros((n_chains, dim))
    keys = jax.random.split(jax.random.PRNGKey(4), n_chains)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ck.npz")
        run_chains(
            vg, psi0, keys, n_samples=400, n_adapts=300,
            initial_step_size=0.2, mass_matrix="dense-pooled",
            step_jitter=0.25, step_jitter_low=0.5, checkpoint_path=path,
        )
        ckpt = load_checkpoint(path)
        assert ckpt.meta["step_jitter"] == 0.25
        assert ckpt.meta["step_jitter_low"] == 0.5
        qs, info, new_ckpt = run_chains_resumed(vg, ckpt, n_samples=300)
        assert qs.shape == (n_chains, 300, dim)
        flat = np.asarray(qs).reshape(-1, dim)
        assert np.all(np.isfinite(flat))
        assert np.all(np.abs(flat.mean(0)) < 0.35)
