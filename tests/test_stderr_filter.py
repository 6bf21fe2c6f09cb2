"""utils/stderr_filter.py — verified squelch of benign relay-AOT noise.

The filter must drop ONLY cpu_aot_loader mismatch lines whose missing
features are proven tuning-only (prefer-no-gather/scatter), pass real
ISA mismatches (genuine SIGILL risk) through, and leave all other
stderr intact (the driver's benchmark artifact is this stream)."""
import subprocess
import sys
import textwrap

from manifold_constrained_gaussian_process_inference_tpu.utils.stderr_filter import (
    _is_benign_aot_mismatch,
)


def _aot_line(compile_feats, host_feats):
    return (
        "E0819 06:32:06.387051 1663 cpu_aot_loader.cc:210] Loading XLA:CPU "
        "AOT result. Target machine feature +prefer-no-gather is not "
        "supported on the host machine. Machine type used for XLA:CPU "
        "compilation doesn't match the machine type for execution. "
        f"Compile machine features: [{compile_feats}] vs host machine "
        f"features: [{host_feats}]. This could lead to execution errors "
        "such as SIGILL."
    ).encode()


def test_benign_tuning_only_mismatch_is_squelched():
    line = _aot_line(
        "+64bit,+avx,+avx2,+prefer-no-gather,+prefer-no-scatter,-fma4",
        "64bit,avx,avx2",
    )
    assert _is_benign_aot_mismatch(line)


def test_real_isa_mismatch_passes_through():
    # avx512f missing on the host: a genuine SIGILL hazard — NOT benign.
    line = _aot_line(
        "+64bit,+avx,+avx512f,+prefer-no-gather",
        "64bit,avx",
    )
    assert not _is_benign_aot_mismatch(line)


def test_no_mismatch_and_unrelated_lines_pass_through():
    # identical feature sets (no missing) -> not squelched (nothing to hide)
    line = _aot_line("+64bit,+avx", "64bit,avx")
    assert not _is_benign_aot_mismatch(line)
    assert not _is_benign_aot_mismatch(b"10 divergent transitions\n")
    assert not _is_benign_aot_mismatch(
        b"cpu_aot_loader.cc:210] some other unparseable message\n"
    )


def test_fd_level_filter_end_to_end():
    """Install the filter in a subprocess, emit a benign AOT line, a real
    ISA mismatch, and ordinary stderr via raw fd 2 (C++-style); only the
    benign line disappears, and the summary line appears."""
    prog = textwrap.dedent(
        """
        import os, sys
        sys.path.insert(0, %r)
        from manifold_constrained_gaussian_process_inference_tpu.utils.stderr_filter import (
            install_benign_aot_filter,
        )
        install_benign_aot_filter()
        benign = (
            "E0819 00:00:00.0 1 cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
            "result. Machine type used for XLA:CPU compilation doesn't match. "
            "Compile machine features: [+64bit,+prefer-no-gather] vs host "
            "machine features: [64bit]. This could lead to execution errors "
            "such as SIGILL.\\n"
        )
        real = (
            "E0819 00:00:00.0 1 cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
            "result. Machine type used for XLA:CPU compilation doesn't match. "
            "Compile machine features: [+64bit,+avx512f] vs host machine "
            "features: [64bit]. This could lead to execution errors "
            "such as SIGILL.\\n"
        )
        os.write(2, benign.encode())
        os.write(2, real.encode())
        os.write(2, b"ordinary progress line\\n")
        print("stdout-json-line")
        """
        % (str(__import__("pathlib").Path(__file__).resolve().parents[1]),)
    )
    r = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True, timeout=120,
        env={
            "PATH": "/usr/bin:/bin",
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
        },
    )
    err = r.stderr.decode()
    assert r.returncode == 0, (err, r.stdout)
    assert "prefer-no-gather" not in err.split("suppressed")[0]
    assert "avx512f" in err           # real hazard preserved
    assert "ordinary progress line" in err
    assert "suppressed 1 relay-AOT" in err
    assert "stdout-json-line" in r.stdout.decode()
