"""razip/gzip-compressed reference FASTA support.

The reference consumes razip-compressed FASTA through vendored razf.c
(faidx.c:216) — a gzip-conformant stream with a trailing random-access
index.  The TPU stack decompresses the members and serves the identical
uncompressed text, so `.fai` offsets and all downstream behavior are
unchanged; trailing index bytes after the gzip stream are ignored.
"""

import gzip
import subprocess
import sys

from somatic_sniper_tpu.io.fasta import FastaFile


def _razipish(raw: bytes) -> bytes:
    """gzip members + fake trailing random-access index (RAZF shape)."""
    return gzip.compress(raw) + b"RAZFIDX" + b"\x00" * 64


def test_fetch_matches_plain(tmp_path, data_dir):
    src = data_dir / "small.fa"
    plain = FastaFile(src)
    gz = tmp_path / "small.fa.razip"
    gz.write_bytes(_razipish(src.read_bytes()))
    comp = FastaFile(gz)
    assert sorted(comp.index) == sorted(plain.index)
    for name in plain.index:
        assert comp.fetch(name) == plain.fetch(name)


def test_cli_golden_with_compressed_reference(tmp_path, data_dir):
    gz = tmp_path / "small.fa.gz"
    gz.write_bytes(_razipish((data_dir / "small.fa").read_bytes()))
    out = tmp_path / "out.vcf"
    r = subprocess.run(
        [sys.executable, "-m", "somatic_sniper_tpu.cli.main",
         "-F", "vcf", "-f", str(gz),
         str(data_dir / "t-small.bam"), str(data_dir / "n-small.bam"),
         str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    strip = lambda b: [
        ln for ln in b.splitlines()
        if not (ln.startswith("##fileDate") or ln.startswith("##reference="))
    ]
    got = strip(out.read_text())
    want = strip((data_dir / "expected.vcf").read_text())
    assert got == want
