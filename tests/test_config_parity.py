"""Config-key parity: every reference config key
(/root/reference/src/MagiJl.jl:208-220, 266-271) maps to a MagiConfig field
with the same default."""
import numpy as np

from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig


def test_reference_defaults():
    c = MagiConfig()
    # :kernel -> "matern52"
    assert c.kernel == "matern52"
    # :niterHmc -> 20000
    assert c.niter_hmc == 20000
    # :burninRatio -> 0.5
    assert c.burnin_ratio == 0.5
    # :stepSizeFactor -> 0.01
    assert c.step_size_factor == 0.01
    # :bandSize -> 20
    assert c.band_size == 20
    # :priorTemperature -> [1, 1, 1]
    assert tuple(c.prior_temperature) == (1.0, 1.0, 1.0)
    # :sigma -> empty (sampled)
    assert not c.sigma_provided
    # :phi -> empty (estimated)
    assert not c.phi_provided
    # :targetAcceptRatio -> 0.8
    assert c.target_accept_ratio == 0.8
    # :jitter -> 1e-6
    assert c.jitter == 1e-6
    # :gpOptimIterations -> 100
    assert c.gp_optim_iterations == 100
    # :verbose -> false
    assert c.verbose is False
    # xInit / thetaInit -> empty
    assert c.x_init is None and c.theta_init is None


def test_sigma_fixed_rule():
    """sigma fixed iff BOTH sigma and phi provided (MagiJl.jl:222-243)."""
    assert not MagiConfig(sigma=[0.1, 0.1]).sigma_is_fixed
    assert not MagiConfig(phi=np.ones((2, 2))).sigma_is_fixed
    assert MagiConfig(sigma=[0.1, 0.1], phi=np.ones((2, 2))).sigma_is_fixed


def test_tpu_extension_defaults_are_reference_neutral():
    """Defaults must reproduce reference behavior: single chain, NUTS, no
    warm start, no whitening, no theta constraint, zero-mean GP."""
    c = MagiConfig()
    assert c.n_chains == 1
    assert c.sampler == "nuts"
    assert c.map_init_iterations == 0
    assert c.x_whitened is False
    assert c.theta_constrained is False
    assert c.gp_mean is None
    assert c.chain_init_jitter == 0.0
    assert c.mass_matrix == "diag"  # Stan/AdvancedHMC DiagEuclideanMetric
