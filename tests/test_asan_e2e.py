"""The full e2e CLI matrix once under an address-sanitized native
library — parity with the reference's discipline of wrapping every
integration run in valgrind (reference
build-common/python/valgrindwrapper.py:27-48).

Mechanics: sniper_native.cpp is rebuilt with -fsanitize=address into a
separate .so, the ASAN runtime is LD_PRELOADed into a fresh Python
(the interpreter itself is uninstrumented), and SNIPER_NATIVE_LIB
points the ctypes loader at the sanitized build.  One subprocess runs
every E2E_CASES entry in-process (paying the interpreter + ASAN start
cost once) and byte-compares each output to the golden file; any heap
overrun/UB in the native layer aborts the subprocess.  Leak checking
stays off here (CPython/JAX hold allocations for the process lifetime
by design); the dedicated asan_driver covers native-entry-point leaks.

A canary test proves the harness detects what it claims to: the same
source built with -DSNIPER_PLANT_OVERRUN (a 1-byte heap overrun at the
end of emit_lines) must FAIL the run.
"""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

from .test_e2e import E2E_CASES

_SRC = (Path(__file__).resolve().parent.parent /
        "somatic_sniper_tpu" / "io" / "native" / "sniper_native.cpp")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no g++ toolchain"
)

# runs inside the sanitized subprocess: every e2e case, in-process
_DRIVER = r"""
import json, re, sys
from pathlib import Path

import jax
jax.config.update("jax_platforms", "cpu")

from somatic_sniper_tpu.cli.main import main
from somatic_sniper_tpu.io import native

assert native.available(), "sanitized native library failed to load"

data_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
cases = json.loads(sys.argv[3])
FILTER = re.compile(r"##fileDate|##reference=")
strip = lambda p: [ln for ln in Path(p).read_text().splitlines()
                   if not FILTER.search(ln)]
for case, tag, args in cases:
    d = data_dir / "e2e" / case
    out = out_dir / f"{case}.{tag}"
    rc = main([*args, "-f", str(d / "ref.fa"), str(d / "tumor.bam"),
               str(d / "normal.bam"), str(out)])
    assert rc == 0, f"{case}/{tag}: exit {rc}"
    assert strip(out) == strip(d / f"expected.{tag}"), \
        f"{case}/{tag}: output differs from golden"
print(f"ASAN_E2E_OK {len(cases)}")
"""


def _asan_runtime() -> str | None:
    r = subprocess.run(
        ["g++", "-print-file-name=libasan.so"],
        capture_output=True, text=True,
    )
    path = r.stdout.strip()
    return path if "/" in path else None


def _build_asan_lib(out: Path, defines: tuple[str, ...] = ()) -> None:
    subprocess.run(
        ["g++", "-std=c++17", "-O1", "-g", "-shared", "-fPIC",
         "-pthread", "-fsanitize=address", "-fno-omit-frame-pointer",
         *defines, "-o", str(out), str(_SRC), "-lz"],
        check=True, capture_output=True, timeout=300,
    )


def _run_matrix(tmp_path: Path, lib: Path, cases) -> \
        subprocess.CompletedProcess:
    import json

    rt = _asan_runtime()
    if rt is None:
        pytest.skip("libasan runtime not found")
    data_dir = Path(__file__).resolve().parent / "data"
    env = dict(
        os.environ,
        LD_PRELOAD=rt,
        SNIPER_NATIVE_LIB=str(lib),
        ASAN_OPTIONS="detect_leaks=0",
        JAX_PLATFORMS="cpu",
    )
    return subprocess.run(
        [sys.executable, "-c", _DRIVER, str(data_dir), str(tmp_path),
         json.dumps(cases)],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )


def test_e2e_matrix_under_asan(tmp_path):
    lib = tmp_path / "libsniper_asan.so"
    try:
        _build_asan_lib(lib)
    except (subprocess.CalledProcessError,
            subprocess.TimeoutExpired) as exc:
        pytest.skip(f"asan build unavailable: {exc}")
    r = _run_matrix(tmp_path, lib, E2E_CASES)
    assert r.returncode == 0, (r.stdout + r.stderr)[-4000:]
    assert f"ASAN_E2E_OK {len(E2E_CASES)}" in r.stdout
    assert "ERROR: AddressSanitizer" not in r.stderr


def test_asan_harness_catches_planted_overrun(tmp_path):
    """The harness must FAIL on a planted 1-byte heap overrun in
    emit_lines (-DSNIPER_PLANT_OVERRUN) — otherwise the green matrix
    above proves nothing."""
    lib = tmp_path / "libsniper_asan_canary.so"
    try:
        _build_asan_lib(lib, ("-DSNIPER_PLANT_OVERRUN",))
    except (subprocess.CalledProcessError,
            subprocess.TimeoutExpired) as exc:
        pytest.skip(f"asan build unavailable: {exc}")
    r = _run_matrix(tmp_path, lib, E2E_CASES[:1])
    assert r.returncode != 0, "planted overrun was not detected"
    assert "heap-buffer-overflow" in r.stderr
