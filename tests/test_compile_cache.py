"""Persistent compilation cache helper (utils/compile_cache.py)."""
import os

import jax

from manifold_constrained_gaussian_process_inference_tpu.utils import (
    compile_cache,
)


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("MAGI_DISABLE_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(compile_cache, "_ENABLED", False)
    d = str(tmp_path / "cache")
    got = compile_cache.enable_persistent_cache(d)
    assert got == d
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: second call keeps reporting a path, no error
    assert compile_cache.enable_persistent_cache(d) == d


def test_disable_env_var(monkeypatch, tmp_path):
    monkeypatch.setenv("MAGI_DISABLE_COMPILE_CACHE", "1")
    monkeypatch.setattr(compile_cache, "_ENABLED", False)
    assert compile_cache.enable_persistent_cache(str(tmp_path)) is None


def test_cache_round_trip(tmp_path, monkeypatch):
    """Compiled executables land in the cache dir and reload cleanly."""
    monkeypatch.delenv("MAGI_DISABLE_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(compile_cache, "_ENABLED", False)
    d = str(tmp_path / "cache")
    compile_cache.enable_persistent_cache(d)
    import jax.numpy as jnp

    f = jax.jit(lambda a: (a * 2.0 + 1.0).sum())
    x = jnp.arange(8.0)
    assert float(f(x)) == float((x * 2 + 1).sum())
    assert os.path.isdir(d) and len(os.listdir(d)) >= 1
