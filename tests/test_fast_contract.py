"""Fast-mode output contract, enforced record-by-record.

CLAUDE.md invariant: fast (f32 device) mode makes the same genotype
calls as exact mode; phred-scaled quality values may differ by at most
±1 where an f32 class sum lands on a quantization boundary.  The
reference's own contract test is the golden VCF diff
(reference integration-test/test_sniper.py:19); this generalizes it to
a field-policy diff between fast output and the exact golden across
every e2e fixture x flag combo.

Field policy
  vcf:     CHROM POS ID REF ALT QUAL FILTER INFO FORMAT exact;
           per-sample GT/IGT/DP/DP4/BCOUNT/BQ/MQ/AMQ/SS exact,
           GQ/JGQ/VAQ/SSC within ±1 ('.' must match '.').
  classic: positions/genotypes/depth/dqstats columns exact;
           somatic score + consensus/variant qualities within ±1.
  bed:     somatic score within ±1; everything else exact.

The one known tolerated instance on the reference's integration pair
(GQ 44 vs 45 at 17:260, an f32 boundary in the Pallas path) is pinned:
any OTHER tolerated diff on that pair fails the test.
"""

import re
import subprocess
import sys
from pathlib import Path

import pytest

from somatic_sniper_tpu.cli.main import main

from .test_e2e import E2E_CASES

FILTER = re.compile(r"##fileDate|##reference=")

# colon-field policy for the 13 VCF FORMAT fields
_VCF_PM1 = {"GQ", "JGQ", "VAQ", "SSC"}
_VCF_FIELDS = "GT:IGT:DP:DP4:BCOUNT:GQ:JGQ:VAQ:BQ:MQ:AMQ:SS:SSC".split(":")

# classic 26 columns (0-based): ±1 on score/cnsq/vaq columns
_CLASSIC_PM1 = {5, 6, 7, 9, 10}
# bed: col 4 = somatic score
_BED_PM1 = {4}


def _lines(path: Path) -> list[str]:
    return [
        ln for ln in path.read_text().splitlines()
        if not FILTER.search(ln)
    ]


def _pm1(a: str, b: str) -> bool:
    if a == b:
        return True
    if a == "." or b == ".":
        return False
    return abs(int(a) - int(b)) <= 1


def _diff_records(fast: list[str], gold: list[str], fmt: str):
    """Return the tolerated ±1 diffs; assert everything else equal.

    Each tolerated diff is (record_key, field_name, fast_val, gold_val).
    """
    assert len(fast) == len(gold), (
        f"record count differs: fast {len(fast)} vs exact {len(gold)}"
    )
    tolerated = []
    for lf, lg in zip(fast, gold):
        if lf == lg:
            continue
        assert not lf.startswith("#") and not lg.startswith("#"), (
            f"header line differs:\n{lf}\n{lg}"
        )
        cf, cg = lf.split("\t"), lg.split("\t")
        assert len(cf) == len(cg), f"column count differs:\n{lf}\n{lg}"
        key = ":".join(cf[:2])
        if fmt == "vcf":
            assert cf[:9] == cg[:9], f"fixed VCF fields differ at {key}"
            for si in (9, 10):  # NORMAL, TUMOR sample columns
                ff, fg = cf[si].split(":"), cg[si].split(":")
                for name, a, b in zip(_VCF_FIELDS, ff, fg):
                    if a == b:
                        continue
                    assert name in _VCF_PM1 and _pm1(a, b), (
                        f"{key} sample {si}: {name} {a} vs {b}"
                    )
                    tolerated.append((key, name, a, b))
        else:
            pm1 = _CLASSIC_PM1 if fmt == "classic" else _BED_PM1
            for i, (a, b) in enumerate(zip(cf, cg)):
                if a == b:
                    continue
                assert i in pm1 and _pm1(a, b), (
                    f"{key} column {i}: {a!r} vs {b!r}"
                )
                tolerated.append((key, i, a, b))
    return tolerated


def _fmt_of(args: list[str]) -> str:
    return args[args.index("-F") + 1]


@pytest.mark.parametrize("case,tag,args", E2E_CASES)
def test_fast_matches_exact_within_contract(data_dir, tmp_path, case, tag,
                                            args):
    d = data_dir / "e2e" / case
    out = tmp_path / f"fast.{tag}"
    rc = main([*args, "--precision", "fast", "-f", str(d / "ref.fa"),
               str(d / "tumor.bam"), str(d / "normal.bam"), str(out)])
    assert rc == 0
    tolerated = _diff_records(
        _lines(out), _lines(d / f"expected.{tag}"), _fmt_of(args)
    )
    # the ±1 boundary cases must stay rare: a drift in the f32 path shows
    # up as a spread of tolerated diffs long before calls change
    assert len(tolerated) <= 2, f"too many ±1 boundary diffs: {tolerated}"


def test_fast_golden_pair_pins_known_gq_diff(data_dir, tmp_path):
    """Integration pair, fast mode, in a pristine subprocess (no x64):
    the only tolerated diff ever observed is GQ 44 vs 45 at 17:260."""
    out = tmp_path / "fast.vcf"
    subprocess.run(
        [sys.executable, "-m", "somatic_sniper_tpu.cli.main",
         "-F", "vcf", "--precision", "fast",
         "-f", str(data_dir / "small.fa"),
         str(data_dir / "t-small.bam"), str(data_dir / "n-small.bam"),
         str(out)],
        check=True, capture_output=True,
    )
    tolerated = _diff_records(
        _lines(out), _lines(data_dir / "expected.vcf"), "vcf"
    )
    for key, name, _a, _b in tolerated:
        assert (key, name) == ("17:260", "GQ"), (
            f"new fast-mode boundary diff: {tolerated}"
        )
