#!/usr/bin/env python
"""Regenerate tests/data/e2e/sim1/expected.readcount.

Only run this when scripts/readcount.py semantics are deliberately
changed; the hand-verified oracle in tests/test_readcount_oracle.py
must still pass afterwards.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from somatic_sniper_tpu.scripts import prepare_for_readcount, readcount  # noqa: E402


def main() -> None:
    d = Path(__file__).resolve().parents[1] / "data" / "e2e" / "sim1"
    pos = "/tmp/gen_readcount_sites.pos"
    prepare_for_readcount.main(
        ["--snp-file", str(d / "expected.vcf"), "--out-file", pos]
    )
    readcount.main(
        ["-f", str(d / "ref.fa"), "-l", pos, str(d / "tumor.bam"),
         str(d / "expected.readcount")]
    )
    print(f"wrote {d / 'expected.readcount'}")


if __name__ == "__main__":
    main()
