"""Verified squelch of the benign relay-AOT tuning-flag mismatch warning.

Every executable compiled through the axon remote-compile relay arrives
as a serialized AOT blob; its host-side (XLA:CPU) components embed the
RELAY compiler's LLVM target features. On load, xla's cpu_aot_loader
compares them against this host and prints an ERROR-level
"could lead to execution errors such as SIGILL" line whenever any
compile-machine feature is absent on the host — once per program load,
flooding benchmark artifacts (VERDICT r4 item 4; BENCH_r04.json tail).

Host-fingerprint cache keying (utils/compile_cache.py) cannot remove
these lines: they are re-created by every FRESH relay compile, because
the mismatch is baked in at the relay, not by cache staleness. Measured
on this relay, the missing features are exactly ``+prefer-no-gather``
and ``+prefer-no-scatter`` — LLVM *tuning preferences* (Intel
gather/scatter erratum mitigations), not ISA extensions: a binary
compiled WITH them uses strictly fewer exotic instructions, so executing
it on a host without the preference flag cannot SIGILL.

This module filters file-descriptor-2 line-by-line and drops ONLY
cpu_aot_loader mismatch lines it can PROVE benign: it parses both
feature lists out of the message and requires
``missing_features ⊆ BENIGN_TUNING_FLAGS``. A mismatch involving any
real ISA feature (a genuine SIGILL risk, e.g. after a host migration)
passes through untouched. A one-line summary of the suppressed count is
emitted at exit, so the artifact still records that (verified-benign)
suppression happened.
"""
from __future__ import annotations

import atexit
import os
import re
import sys
import threading

# LLVM tuning-only preferences (no instruction-set semantics). Compiled
# code never requires them at execution time.
BENIGN_TUNING_FLAGS = frozenset({"prefer-no-gather", "prefer-no-scatter"})

_FEATURES_RE = re.compile(
    rb"Compile machine features: \[([^\]]*)\] vs host machine features: "
    rb"\[([^\]]*)\]"
)

_installed = False


def _is_benign_aot_mismatch(line: bytes) -> bool:
    """True iff ``line`` is a cpu_aot_loader machine-feature mismatch whose
    missing features are all proven tuning-only."""
    if b"cpu_aot_loader" not in line or b"XLA:CPU AOT" not in line:
        return False
    m = _FEATURES_RE.search(line)
    if not m:
        return False
    compile_feats = {
        f[1:].strip()
        for f in m.group(1).decode("utf-8", "replace").split(",")
        if f.strip().startswith("+")
    }
    host_feats = {
        f.strip() for f in m.group(2).decode("utf-8", "replace").split(",")
    }
    missing = compile_feats - host_feats
    return bool(missing) and missing <= BENIGN_TUNING_FLAGS


def install_benign_aot_filter() -> None:
    """Route fd 2 through a line filter dropping verified-benign relay-AOT
    mismatch lines. Idempotent; safe before or after jax import (the
    filter is at the file-descriptor level, so C++ absl logging is
    covered). Call from benchmark entry points whose stderr becomes an
    artifact of record (bench.py, sweep harnesses)."""
    global _installed
    if _installed:
        return
    _installed = True

    saved_fd = os.dup(2)
    r_fd, w_fd = os.pipe()
    os.dup2(w_fd, 2)
    os.close(w_fd)
    state = {"suppressed": 0}

    def pump():
        buf = b""
        while True:
            try:
                chunk = os.read(r_fd, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            while True:
                nl = buf.find(b"\n")
                if nl < 0:
                    break
                line, buf = buf[: nl + 1], buf[nl + 1 :]
                if _is_benign_aot_mismatch(line):
                    state["suppressed"] += 1
                else:
                    os.write(saved_fd, line)
        if buf:
            os.write(saved_fd, buf)

    t = threading.Thread(target=pump, daemon=True, name="stderr-aot-filter")
    t.start()

    def summarize():
        # Restore fd 2 so late interpreter-shutdown writes still land, let
        # the pump drain, then record what was suppressed (and why it was
        # safe) in one line.
        try:
            sys.stderr.flush()
        except Exception:
            pass
        os.dup2(saved_fd, 2)
        t.join(timeout=2.0)
        n = state["suppressed"]
        if n:
            os.write(
                saved_fd,
                (
                    f"[stderr_filter] suppressed {n} relay-AOT "
                    "machine-feature mismatch line(s) verified benign "
                    "(missing features were tuning-only: subset of "
                    f"{sorted(BENIGN_TUNING_FLAGS)})\n"
                ).encode(),
            )

    atexit.register(summarize)
