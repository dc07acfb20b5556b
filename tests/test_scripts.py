"""Post-processing script ports vs. the reference Perl scripts.

Runs the reference Perl implementations (from /root/reference, if present
on this machine) and the Python ports on the same inputs and diffs all
outputs byte-for-byte.  Skipped when perl or the reference tree is absent.
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from somatic_sniper_tpu.scripts import (
    fpfilter,
    highconfidence,
    prepare_for_readcount,
    snpfilter,
)

REF_SCRIPTS = Path("/root/reference/src/scripts")

pytestmark = pytest.mark.skipif(
    shutil.which("perl") is None or not REF_SCRIPTS.exists(),
    reason="perl or reference scripts unavailable",
)


@pytest.fixture(scope="module")
def sniper_outputs(data_dir):
    """Classic + VCF caller outputs from the committed e2e fixtures."""
    d = data_dir / "e2e" / "sim1"
    return {
        "classic": d / "expected.classic",
        "vcf": d / "expected.vcf",
        "big_classic": data_dir / "e2e" / "sim3_params"
        / "expected.N4.classic",
    }


def _run_perl(script, args, cwd):
    subprocess.run(
        ["perl", str(REF_SCRIPTS / script), *args],
        check=True, capture_output=True, cwd=cwd,
    )


def _diff(a: Path, b: Path):
    assert a.read_bytes() == b.read_bytes(), f"{a} != {b}"


@pytest.mark.parametrize("kind", ["classic", "vcf", "big_classic"])
def test_prepare_for_readcount(sniper_outputs, tmp_path, kind):
    src = sniper_outputs[kind]
    _run_perl("prepare_for_readcount.pl",
              ["--snp-file", str(src), "--out-file", str(tmp_path / "p.pos")],
              tmp_path)
    prepare_for_readcount.main(
        ["--snp-file", str(src), "--out-file", str(tmp_path / "q.pos")]
    )
    _diff(tmp_path / "p.pos", tmp_path / "q.pos")


@pytest.mark.parametrize("kind", ["classic", "vcf", "big_classic"])
@pytest.mark.parametrize("extra", [[], ["--min-mapping-quality", "0",
                                        "--min-read-depth", "1"]])
def test_snpfilter(sniper_outputs, tmp_path, kind, extra):
    src = sniper_outputs[kind]
    _run_perl("snpfilter.pl",
              ["--snp-file", str(src), "--out-file", str(tmp_path / "p.out"),
               "--lq-output", str(tmp_path / "p.lq"), *extra], tmp_path)
    snpfilter.main(
        ["--snp-file", str(src), "--out-file", str(tmp_path / "q.out"),
         "--lq-output", str(tmp_path / "q.lq"), *extra]
    )
    _diff(tmp_path / "p.out", tmp_path / "q.out")
    _diff(tmp_path / "p.lq", tmp_path / "q.lq")


def _fake_indel_file(src: Path, kind: str, out: Path, seed=11):
    """Samtools-pileup-style indel lines around the call sites: a mix of
    filtering triggers (near hits at various offsets) and lines the
    loader must skip (id != '*', '*/*' consensus, sub-threshold or junk
    scores) — exercising snpfilter.pl:85-95."""
    rng = np.random.default_rng(seed)
    lines = []
    i = 0
    for raw in src.read_text().splitlines():
        if raw.startswith("#"):
            continue
        f = raw.split("\t")
        chrom, pos = f[0], int(f[1])
        i += 1
        off = int(rng.integers(-15, 16))
        score = int(rng.integers(0, 200))
        if i % 5 == 0:
            # consensus line (id is a base, not '*') — must be ignored
            lines.append(f"{chrom}\t{pos + off}\tA\t+AC/+AC\t30\t{score}"
                         f"\t60\t12\tjunk")
        elif i % 5 == 1:
            lines.append(f"{chrom}\t{pos + off}\t*\t*/*\t30\t{score}"
                         f"\t60\t12\tx")  # '*/*' — ignored
        elif i % 5 == 2:
            lines.append(f"{chrom}\t{pos + off}\t*\t+AG/*\t30\tnoscore"
                         f"\t60\t12\tx")  # junk score: perl numifies to 0
        else:
            lines.append(f"{chrom}\t{pos + off}\t*\t-C/-C\t30\t{score}"
                         f"\t60\t12\tx")
    out.write_text("\n".join(lines) + "\n")


@pytest.mark.parametrize("kind", ["classic", "vcf", "big_classic"])
@pytest.mark.parametrize("extra", [[], ["--min-indel-score", "20",
                                        "--indel-win-size", "3"]])
def test_snpfilter_indel_branch(sniper_outputs, tmp_path, kind, extra):
    src = sniper_outputs[kind]
    indels = tmp_path / "indels.pileup"
    _fake_indel_file(src, kind, indels)
    common = ["--snp-file", str(src), "--indel-file", str(indels),
              "--min-mapping-quality", "0", "--min-read-depth", "1", *extra]
    _run_perl("snpfilter.pl",
              [*common, "--out-file", str(tmp_path / "p.out"),
               "--lq-output", str(tmp_path / "p.lq")], tmp_path)
    snpfilter.main(
        [*common, "--out-file", str(tmp_path / "q.out"),
         "--lq-output", str(tmp_path / "q.lq")]
    )
    _diff(tmp_path / "p.out", tmp_path / "q.out")
    _diff(tmp_path / "p.lq", tmp_path / "q.lq")


@pytest.mark.parametrize("kind", ["classic", "vcf", "big_classic"])
def test_highconfidence(sniper_outputs, tmp_path, kind):
    src = sniper_outputs[kind]
    args = ["--min-mapping-quality", "40", "--min-somatic-score", "20"]
    _run_perl("highconfidence.pl",
              ["--snp-file", str(src), "--out-file", str(tmp_path / "p.hc"),
               "--lq-output", str(tmp_path / "p.lq"), *args], tmp_path)
    highconfidence.main(
        ["--snp-file", str(src), "--out-file", str(tmp_path / "q.hc"),
         "--lq-output", str(tmp_path / "q.lq"), *args]
    )
    _diff(tmp_path / "p.hc", tmp_path / "q.hc")
    _diff(tmp_path / "p.lq", tmp_path / "q.lq")


def _fake_readcount(src: Path, kind: str, out: Path, seed=5):
    """Synthesize a plausible bam-readcount file covering the call sites."""
    rng = np.random.default_rng(seed)
    lines = []
    for raw in src.read_text().splitlines():
        if raw.startswith("#"):
            continue
        f = raw.split("\t")
        chrom, pos, ref = f[0], f[1], (f[3] if kind == "vcf" else f[2])
        cols = [chrom, pos, ref, str(int(rng.integers(10, 60))), "x"]
        for base in "ACGT":
            n = int(rng.integers(0, 30))
            vals = [
                n,
                round(float(rng.uniform(0, 60)), 2),   # avg_mapqual
                round(float(rng.uniform(0, 40)), 2),   # avg_basequal
                round(float(rng.uniform(0, 40)), 2),   # avg_semq
                int(rng.integers(0, n + 1)),           # reads_plus
                0,                                     # reads_minus (below)
                round(float(rng.uniform(0, 1)), 2),    # avg_clip_read_pos
                round(float(rng.uniform(0, 2)), 2),    # avg_subs
                round(float(rng.uniform(0, 150)), 2),  # avg_mmqs
                int(rng.integers(0, 3)),               # reads_q2
                round(float(rng.uniform(0, 20)), 2),   # avg_dist_to_q2
                round(float(rng.uniform(50, 101)), 2),  # avg_RL_clipped
                round(float(rng.uniform(0, 1)), 2),    # avg_eff_3p_dist
            ]
            vals[5] = n - vals[4]
            cols.append(base + ":" + ":".join(str(v) for v in vals))
        lines.append("\t".join(cols))
    out.write_text("\n".join(lines) + "\n")


@pytest.mark.parametrize("kind", ["classic", "vcf", "big_classic"])
def test_fpfilter(sniper_outputs, tmp_path, kind):
    src = sniper_outputs[kind]
    rc = tmp_path / "rc.txt"
    _fake_readcount(src, "vcf" if "vcf" in kind else "classic", rc)
    perl_out = subprocess.run(
        ["perl", str(REF_SCRIPTS / "fpfilter.pl"), "--snp-file", str(src),
         "--readcount-file", str(rc),
         "--output-basename", str(tmp_path / "p")],
        check=True, capture_output=True, cwd=tmp_path, text=True,
    ).stdout
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fpfilter.main(
            ["--snp-file", str(src), "--readcount-file", str(rc),
             "--output-basename", str(tmp_path / "q")]
        )
    _diff(tmp_path / "p.fp_pass", tmp_path / "q.fp_pass")
    _diff(tmp_path / "p.fp_fail", tmp_path / "q.fp_fail")
    assert buf.getvalue() == perl_out


def test_readcount_pipeline_self_contained(data_dir, tmp_path):
    """The documented filter pipeline runs end-to-end with the built-in
    readcount module in place of the external bam-readcount binary, and
    our readcount output drives the reference fpfilter.pl identically to
    our fpfilter port (including the zero-count field-join quirk)."""
    from somatic_sniper_tpu.scripts import readcount

    d = data_dir / "e2e" / "sim1"
    calls = d / "expected.vcf"

    filtered = tmp_path / "calls.SNPfilter"
    snpfilter.main(["--snp-file", str(calls), "--out-file", str(filtered),
                    "--lq-output", str(tmp_path / "lq")])
    pos = tmp_path / "sites.pos"
    prepare_for_readcount.main(
        ["--snp-file", str(filtered), "--out-file", str(pos)]
    )
    rc_file = tmp_path / "readcounts"
    readcount.main(["-f", str(d / "ref.fa"), "-l", str(pos), "-b", "15",
                    str(d / "tumor.bam"), str(rc_file)])

    # structural sanity: every non-header filtered site got a line with
    # consistent depth/strand accounting
    n_sites = sum(
        1 for ln in filtered.read_text().splitlines()
        if not ln.startswith("#")
    )
    lines = rc_file.read_text().splitlines()
    assert len(lines) == n_sites
    for ln in lines:
        f = ln.split("\t")
        depth = int(f[3])
        total = 0
        for col in f[4:]:
            parts = col.split(":")
            assert len(parts) == 14
            n, plus, minus = int(parts[1]), int(parts[5]), int(parts[6])
            assert plus + minus == n
            total += n
        assert total == depth

    # perl fpfilter and our port agree on our readcount output
    subprocess.run(
        ["perl", str(REF_SCRIPTS / "fpfilter.pl"), "--snp-file",
         str(filtered), "--readcount-file", str(rc_file),
         "--output-basename", str(tmp_path / "p")],
        check=True, capture_output=True, cwd=tmp_path,
    )
    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        fpfilter.main(
            ["--snp-file", str(filtered), "--readcount-file", str(rc_file),
             "--output-basename", str(tmp_path / "q")]
        )
    _diff(tmp_path / "p.fp_pass", tmp_path / "q.fp_pass")
    _diff(tmp_path / "p.fp_fail", tmp_path / "q.fp_fail")
    # at least one variant must survive to .fp_pass on this fixture
    assert (tmp_path / "q.fp_pass").read_text().strip()
    highconfidence.main(
        ["--snp-file", str(tmp_path / "q.fp_pass"),
         "--out-file", str(tmp_path / "hc"),
         "--lq-output", str(tmp_path / "hc.lq")]
    )
    assert (tmp_path / "hc").exists()
