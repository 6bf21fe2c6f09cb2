"""Persistent XLA compilation cache (TPU-native quality-of-life).

First compiles of large sampling programs on a TPU runtime can take
minutes (and on a remote-compile relay, much longer); every fresh process
pays them again. JAX's persistent compilation cache serializes compiled
executables to disk keyed by (HLO, compile options, backend), so repeat
processes — reruns of a benchmark, resumed production jobs, the
examples — skip straight to execution. Measured on this relay: a
cross-process rerun of a scan-heavy program drops from full compile time
to ~0.1 s load time.

The reference has no equivalent (Julia caches natively per-process only;
SURVEY.md §5.7). Enabled by default from solve_magi and bench.py; opt
out with MAGI_DISABLE_COMPILE_CACHE=1 or point MAGI_COMPILE_CACHE_DIR
somewhere else (default: <repo>/.jax_cache, git-ignored).
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger("magi.compile_cache")

# Directory the live jax_compilation_cache_dir points at (None = never
# enabled). Tracked by PATH, not a boolean: an in-process platform switch
# (jax.config.update("jax_platforms", ...)) changes the computed default
# dir, and returning the new path while the config still pins the old
# platform's directory would re-open the cross-platform executable
# contamination (cpu_aot_loader SIGILL) the platform keying prevents.
_ENABLED_PATH: str | None = None


def _platform() -> str:
    """Platform key for the default cache dir. Prefers the live config
    value — scripts that flip platform in-process via
    jax.config.update("jax_platforms", ...) after startup are not
    reflected in the env var."""
    plat = os.environ.get("JAX_PLATFORMS", "") or "default"
    try:
        import jax

        plat = getattr(jax.config, "jax_platforms", None) or plat
    except Exception:  # pragma: no cover - jax always importable here
        pass
    return plat


def _host_fingerprint() -> str:
    """Short hash of this host's CPU model name + feature flags.

    XLA:CPU AOT executables embed the COMPILE machine's CPU features; a
    cache written before a VM migration/reboot onto a different
    microarchitecture gets loaded with cpu_aot_loader machine-type
    mismatch warnings and a genuine SIGILL risk (observed after a host
    migration on this box). Cache dirs therefore carry a host fingerprint
    so each microarch compiles into its own directory.

    The MODEL NAME must be part of the hash, not just the flags line:
    LLVM sets per-model tuning features (+prefer-no-gather/scatter on
    some Xeons) from cpuid model detection, so two hosts with identical
    /proc/cpuinfo flags can still fail XLA's machine-feature check
    (observed in round 4: flags-only fingerprint stayed stable across a
    migration that changed the prefer-no-gather tuning set).
    """
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "Hardware")) and len(ident) < 1:
                    ident.append(line.split(":", 1)[1].strip())
                elif line.startswith(("flags", "Features")):
                    ident.append(
                        " ".join(sorted(line.split(":", 1)[1].split()))
                    )
                    break
    except OSError:  # pragma: no cover - non-Linux fallback
        import platform as _platform_mod

        ident = [_platform_mod.processor() or _platform_mod.machine()]
    import hashlib

    return hashlib.sha1("|".join(ident).encode()).hexdigest()[:10]


def _default_dir_key(plat: str) -> str:
    """Directory name under .jax_cache for a platform string.

    EVERY platform dir — including pure-accelerator ones (axon/tpu) — is
    keyed by the host-CPU fingerprint. Round 4 keyed only CPU-executing
    platform dirs, reasoning that relay-compiled executables target the
    device; in practice the round-4 driver bench artifact still carried
    the cpu_aot_loader machine-feature-mismatch warning ("could lead to
    ... SIGILL") mid-run, i.e. relay-compiled cache entries DO embed
    host-executing AOT components. Abandoning relay compiles after a host
    migration (re-pay ~50 s/program once) is the safe direction; loading
    stale host-targeted code is not.
    """
    # "v2" abandons every dir written under the round-4 flags-only
    # fingerprint scheme (some held feature-mismatched entries).
    return f"{plat.replace(',', '_')}-v2-{_host_fingerprint()}"


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache directory in use, or None when disabled via
    MAGI_DISABLE_COMPILE_CACHE=1 (or when jax.config rejects the setting
    — older jax versions — in which case this is a silent no-op).
    """
    global _ENABLED_PATH
    if os.environ.get("MAGI_DISABLE_COMPILE_CACHE", "") == "1":
        return None
    if path is None:
        path = os.environ.get("MAGI_COMPILE_CACHE_DIR")
    if path is None:
        pkg_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        # Key the default dir by the requested platform AND the host
        # microarch (v2: every dir, accelerator ones included — see
        # _default_dir_key): relay-compiled executables embed the COMPILE
        # machine's CPU features in their host-side components, and
        # loading them on a different host trips XLA's machine-type
        # check (cpu_aot_loader: "could lead to ... SIGILL").
        path = os.path.join(
            pkg_root, ".jax_cache", _default_dir_key(_platform())
        )
    if _ENABLED_PATH == path:
        return path
    try:
        import jax

        redirect = (
            getattr(jax.config, "jax_compilation_cache_dir", None)
            not in (None, path)
        )
        jax.config.update("jax_compilation_cache_dir", path)
        if redirect:
            # jax materializes its on-disk cache object lazily and then
            # pins it: a config update alone won't move an already-
            # initialized cache to the new directory.
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        # Cache every program: sampling chunks dominate, but setup
        # programs (GP covariance pushes, GN-MAP steps) also re-trace
        # identically across runs and are worth the disk.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - version-dependent
        logger.debug("persistent compilation cache unavailable: %s", e)
        return None
    _ENABLED_PATH = path
    logger.info("persistent XLA compilation cache at %s", path)
    return path
