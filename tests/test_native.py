"""Native (C++) IO/pileup vs pure-Python reference parity."""

import numpy as np
import pytest

from somatic_sniper_tpu.io import native_api
from somatic_sniper_tpu.io.bam import read_bam
from somatic_sniper_tpu.pileup.columnize import columnize

pytestmark = pytest.mark.skipif(
    not native_api.available(), reason="native toolchain unavailable"
)

FILES = [
    "t-small.bam",
    "n-small.bam",
    "e2e/sim1/tumor.bam",
    "e2e/sim1/normal.bam",
    "e2e/sim2_deep/tumor.bam",
    "e2e/sim3_params/normal.bam",
]


@pytest.mark.parametrize("rel", FILES)
def test_native_pileup_matches_python(data_dir, rel):
    f = str(data_dir / rel)
    h1, pu1 = native_api.load_and_columnize(f)
    h2, reads = read_bam(f)
    pu2 = columnize(reads)
    assert h1.ref_names == h2.ref_names
    assert h1.ref_lengths == h2.ref_lengths
    np.testing.assert_array_equal(pu1.ukeys, pu2.ukeys)
    np.testing.assert_array_equal(pu1.offsets, pu2.offsets)
    # entry multisets per column must agree (within-column order is
    # model-irrelevant; see glfgen order-independence analysis)
    for i in range(len(pu1.ukeys)):
        s, e = int(pu1.offsets[i]), int(pu1.offsets[i + 1])
        assert sorted(pu1.slots[s:e].tolist()) == \
            sorted(pu2.slots[s:e].tolist())


@pytest.mark.parametrize(
    "mask,thresh", [(0x704, 0), (0x704, 20), (0x400, 5)]
)
def test_native_filters_match_python(data_dir, mask, thresh):
    f = str(data_dir / "e2e/sim1/tumor.bam")
    _, pu1 = native_api.load_and_columnize(f, mask, thresh)
    _, reads = read_bam(f)
    pu2 = columnize(reads, mask, thresh)
    np.testing.assert_array_equal(pu1.ukeys, pu2.ukeys)
    np.testing.assert_array_equal(pu1.offsets, pu2.offsets)


def test_native_layer_under_asan(data_dir, tmp_path):
    """Memory-safety check of the C++ layer (the reference's valgrind
    analog, SURVEY.md §4/§5): compile the native source plus a driver
    under -fsanitize=address,undefined and run it over the golden BAM
    pair; leaks, overflows, or UB fail via the exit code."""
    import subprocess
    from pathlib import Path

    driver = Path(__file__).parent / "tools" / "asan_driver.cpp"
    exe = tmp_path / "asan_driver"
    try:
        subprocess.run(
            ["g++", "-std=c++17", "-O1", "-g", "-pthread",
             "-fsanitize=address,undefined", "-fno-omit-frame-pointer",
             "-o", str(exe), str(driver), "-lz"],
            check=True, capture_output=True, timeout=300,
        )
    except (FileNotFoundError, subprocess.CalledProcessError) as exc:
        pytest.skip(f"asan toolchain unavailable: {exc}")
    r = subprocess.run(
        [str(exe), str(data_dir / "t-small.bam"),
         str(data_dir / "n-small.bam")],
        capture_output=True, text=True, timeout=120,
        env={"ASAN_OPTIONS": "detect_leaks=1", "PATH": "/usr/bin:/bin"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.startswith("ok ")


def test_unsorted_bam_rejected(tmp_path):
    """The counting pileup build requires coordinate-sorted input and
    must reject violations loudly (the reference abort()s,
    sniper_pileup.c:212)."""
    from somatic_sniper_tpu.io.bam_writer import encode_record, write_bam

    recs = [
        encode_record(0, 500, 60, 0, "ACGT" * 10, bytes([30] * 40),
                      [(40, "M")], read_name="r1"),
        encode_record(0, 100, 60, 0, "ACGT" * 10, bytes([30] * 40),
                      [(40, "M")], read_name="r2"),  # goes backwards
    ]
    bad = tmp_path / "unsorted.bam"
    write_bam(bad, ["c1"], [1000], recs)
    with pytest.raises(IOError, match="not coordinate-sorted"):
        native_api.load_and_columnize(str(bad))


def test_corrupt_inputs_fail_cleanly(data_dir, tmp_path):
    """Corrupted BAMs must raise a clean IOError from the native loads
    (never abort the process; reference behavior is fail-fast exits)."""
    import gzip

    import numpy as np

    from somatic_sniper_tpu.io.bam_writer import bgzf_compress

    raw = gzip.decompress((data_dir / "t-small.bam").read_bytes())
    rng = np.random.default_rng(3)
    bad = tmp_path / "bad.bam"
    for trial in range(20):
        data = bytearray(raw)
        for _ in range(int(rng.integers(1, 8))):
            data[int(rng.integers(4, len(data)))] = int(
                rng.integers(0, 256)
            )
        bad.write_bytes(bgzf_compress(bytes(data)))
        try:
            native_api.load_and_columnize(str(bad))
        except (IOError, ValueError):
            pass  # clean failure (or, rarely, a still-parseable file)
