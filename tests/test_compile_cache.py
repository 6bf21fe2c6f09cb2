"""Persistent compilation cache helper (utils/compile_cache.py)."""
import os

import jax

from manifold_constrained_gaussian_process_inference_tpu.utils import (
    compile_cache,
)


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("MAGI_DISABLE_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(compile_cache, "_ENABLED_PATH", None)
    d = str(tmp_path / "cache")
    got = compile_cache.enable_persistent_cache(d)
    assert got == d
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: second call keeps reporting a path, no error
    assert compile_cache.enable_persistent_cache(d) == d


def test_disable_env_var(monkeypatch, tmp_path):
    monkeypatch.setenv("MAGI_DISABLE_COMPILE_CACHE", "1")
    monkeypatch.setattr(compile_cache, "_ENABLED_PATH", None)
    assert compile_cache.enable_persistent_cache(str(tmp_path)) is None


def test_default_dir_is_platform_keyed(monkeypatch):
    """Default cache dirs are keyed by JAX_PLATFORMS: relay-compiled CPU
    executables embed the compile machine's CPU features and must never
    be loaded by a local-CPU process (XLA cpu_aot_loader SIGILL check)."""
    monkeypatch.delenv("MAGI_DISABLE_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("MAGI_COMPILE_CACHE_DIR", raising=False)
    # the live config value wins: this suite runs with jax_platforms=cpu
    assert compile_cache._platform() == "cpu"
    dirs = {}
    for plat in ("cpu", "axon"):
        monkeypatch.setattr(compile_cache, "_platform", lambda p=plat: p)
        dirs[plat] = compile_cache.enable_persistent_cache()
    assert dirs["cpu"] != dirs["axon"]
    fp = compile_cache._host_fingerprint()
    assert dirs["cpu"].endswith(os.path.join(".jax_cache", f"cpu-v2-{fp}"))
    # accelerator platform dirs are ALSO host-keyed: relay-compiled cache
    # entries embed host-executing AOT components (the round-4 driver
    # bench artifact carried the cpu_aot_loader mismatch warning from the
    # host-stable axon dir), so a host migration must abandon them too.
    assert dirs["axon"].endswith(os.path.join(".jax_cache", f"axon-v2-{fp}"))


def test_cpu_dir_keyed_by_host_microarch(monkeypatch):
    """CPU cache dirs embed a host-CPU fingerprint: XLA:CPU AOT results
    compiled on a pre-migration host trip cpu_aot_loader's machine-type
    check (SIGILL hazard) when loaded on a different microarch."""
    monkeypatch.delenv("MAGI_DISABLE_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("MAGI_COMPILE_CACHE_DIR", raising=False)
    monkeypatch.setattr(compile_cache, "_platform", lambda: "cpu")
    p1 = compile_cache.enable_persistent_cache()
    monkeypatch.setattr(
        compile_cache, "_host_fingerprint", lambda: "deadbeef00"
    )
    p2 = compile_cache.enable_persistent_cache()
    assert p1 != p2
    assert p2.endswith("cpu-v2-deadbeef00")
    assert jax.config.jax_compilation_cache_dir == p2


def test_platform_switch_redirects_live_config(monkeypatch):
    """After an in-process platform switch, a later enable call must MOVE
    jax_compilation_cache_dir to the new platform's directory — not return
    the new path while the config stays pinned to the old one (the
    round-3 advisor finding: stale dir re-opens the cross-platform
    executable contamination hazard)."""
    monkeypatch.delenv("MAGI_DISABLE_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("MAGI_COMPILE_CACHE_DIR", raising=False)
    monkeypatch.setattr(compile_cache, "_platform", lambda: "cpu")
    p1 = compile_cache.enable_persistent_cache()
    assert jax.config.jax_compilation_cache_dir == p1
    # simulate jax.config.update("jax_platforms", "axon") happening later
    monkeypatch.setattr(compile_cache, "_platform", lambda: "axon")
    p2 = compile_cache.enable_persistent_cache()
    assert p2 != p1
    assert jax.config.jax_compilation_cache_dir == p2


def test_cache_round_trip(tmp_path, monkeypatch):
    """Compiled executables land in the cache dir and reload cleanly."""
    monkeypatch.delenv("MAGI_DISABLE_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(compile_cache, "_ENABLED_PATH", None)
    d = str(tmp_path / "cache")
    compile_cache.enable_persistent_cache(d)
    import jax.numpy as jnp

    f = jax.jit(lambda a: (a * 2.0 + 1.0).sum())
    x = jnp.arange(8.0)
    assert float(f(x)) == float((x * 2 + 1).sum())
    assert os.path.isdir(d) and len(os.listdir(d)) >= 1
