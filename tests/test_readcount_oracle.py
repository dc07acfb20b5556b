"""Hand-verified oracle for the built-in bam-readcount equivalent.

bam-readcount itself cannot be built here (no network, not vendored), so
this pins scripts/readcount.py two ways:

1. a hand-crafted BAM whose per-metric arithmetic is written out below
   (every read's clip/strand/mismatch/q2 contribution is derived by hand
   from bam-readcount 0.4 semantics, reference fpfilter.pl:173-175 field
   order) and asserted against the exact formatted output;
2. a committed golden for the sim1 fixture (expected.readcount),
   regenerated only deliberately — drift in any metric fails the diff.
"""

from pathlib import Path

from somatic_sniper_tpu.io.bam_writer import encode_record, write_bam
from somatic_sniper_tpu.scripts import prepare_for_readcount, readcount

REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"  # period 4, len 40


def _write_ref(path: Path) -> None:
    path.write_text(f">c1\n{REF}\n")
    (path.parent / (path.name + ".fai")).write_text(
        f"c1\t{len(REF)}\t4\t{len(REF)}\t{len(REF) + 1}\n"
    )


def _q(vals):
    return bytes(vals)


def test_hand_verified_site(tmp_path):
    """Site = ref pos 10 (0-based), ref base G.  Reads and their
    hand-derived contributions (clipped length cl, clipped coord qc,
    5'-distance p5 = cl-1-qc when reverse else qc):

    r1 fwd 10M @6, mapq 50, all q30, no mismatch: base G, qc=4, cl=10,
       p5=4 -> pos 0.4, 3p (10-1-4)/10=0.5
    r2 rev 2S8M2S @8, mapq 40: clipped quals [2,2,25,25,20,25,25,25];
       reversed -> trailing q2 run of 2 -> q2_start=6; one mismatch at
       ref 12 (C vs ref A, q20) -> mm_frac 1/8, mmqs 20.  Site base G,
       q25, qc=2, cl=8, p5=5 -> pos 5/8, 3p 2/8, q2_dist |5-6|=1
    r3 fwd 3M2I4M1D3M @5, mapq 20, all q35, no mismatch: site in the
       second M, qpos 7 -> base G, cl=12, p5=7 -> pos 7/12, 3p 4/12
    r4 fwd 5M @10, mapq 5: excluded by -q 10
    r5 fwd 2M1D7M @8, mapq 50: deletion spans the site -> not counted
    r6 duplicate flag 0x400: excluded by BAM_DEF_MASK
    r7 fwd 4M @9, mapq 60: mismatch AT the site (A vs ref G, q28) ->
       base A, cl=4, p5=1 -> pos 0.25, 3p 2/4, mm_frac 1/4, mmqs 28

    G column: count 3, mapq (50+40+20)/3=36.67, bq (30+25+35)/3=30.00,
    plus 2 / minus 1, pos (0.4+0.625+7/12)/3=0.54, mm 0.125/3=0.04,
    mmqs 20/3=6.67, q2 1 with dist 1.00, clip (10+8+12)/3=10.00,
    3p (0.5+0.25+1/3)/3=0.36.
    A column: the single r7 read.  Depth 4 (r1,r2,r3,r7).
    """
    ref_fa = tmp_path / "ref.fa"
    _write_ref(ref_fa)

    recs = [
        encode_record(0, 6, 50, 0, "GTACGTACGT", _q([30] * 10),
                      [(10, "M")], "r1"),
        encode_record(0, 8, 40, 16, "TTACGTCCGTGG",
                      _q([9, 9, 2, 2, 25, 25, 20, 25, 25, 25, 9, 9]),
                      [(2, "S"), (8, "M"), (2, "S")], "r2"),
        encode_record(0, 5, 20, 0, "CGTAAACGTCGT", _q([35] * 12),
                      [(3, "M"), (2, "I"), (4, "M"), (1, "D"), (3, "M")],
                      "r3"),
        encode_record(0, 10, 5, 0, "GTACG", _q([30] * 5), [(5, "M")], "r4"),
        encode_record(0, 8, 50, 0, "ACTACGTAC", _q([30] * 9),
                      [(2, "M"), (1, "D"), (7, "M")], "r5"),
        encode_record(0, 6, 50, 0x400, "GTACGTACGT", _q([30] * 10),
                      [(10, "M")], "r6"),
        encode_record(0, 9, 60, 0, "CATA", _q([30, 28, 30, 30]),
                      [(4, "M")], "r7"),
    ]
    bam = tmp_path / "reads.bam"
    write_bam(bam, ["c1"], [len(REF)], recs)

    sites = tmp_path / "sites.txt"
    sites.write_text("c1\t11\t11\n")
    out = tmp_path / "rc.txt"
    readcount.main(["-f", str(ref_fa), "-l", str(sites), "-q", "10",
                    str(bam), str(out)])

    zero = "0:0.00:0.00:0.00:0:0:0.00:0.00:0.00:0:0.00:0.00:0.00"
    expected = (
        "c1\t11\tG\t4\t"
        f"=:{zero}\t"
        "A:1:60.00:28.00:60.00:1:0:0.25:0.25:28.00:0:0.00:4.00:0.50\t"
        f"C:{zero}\t"
        "G:3:36.67:30.00:36.67:2:1:0.54:0.04:6.67:1:1.00:10.00:0.36\t"
        f"T:{zero}\t"
        f"N:{zero}\n"
    )
    assert out.read_text() == expected


def test_baseq_threshold(tmp_path):
    """-b 26 drops r2's q25 site base from the G column (count 3 -> 2)
    but r2 still sits in neither depth nor any other column."""
    ref_fa = tmp_path / "ref.fa"
    _write_ref(ref_fa)
    recs = [
        encode_record(0, 6, 50, 0, "GTACGTACGT", _q([30] * 10),
                      [(10, "M")], "r1"),
        encode_record(0, 8, 40, 16, "TTACGTCCGTGG",
                      _q([9, 9, 2, 2, 25, 25, 20, 25, 25, 25, 9, 9]),
                      [(2, "S"), (8, "M"), (2, "S")], "r2"),
        encode_record(0, 5, 20, 0, "CGTAAACGTCGT", _q([35] * 12),
                      [(3, "M"), (2, "I"), (4, "M"), (1, "D"), (3, "M")],
                      "r3"),
    ]
    bam = tmp_path / "reads.bam"
    write_bam(bam, ["c1"], [len(REF)], recs)
    sites = tmp_path / "sites.txt"
    sites.write_text("c1\t11\n")
    out = tmp_path / "rc.txt"
    readcount.main(["-f", str(ref_fa), "-l", str(sites), "-b", "26",
                    str(bam), str(out)])
    line = out.read_text()
    g_field = [c for c in line.split("\t") if c.startswith("G:")][0]
    assert g_field.split(":")[1] == "2"
    assert line.split("\t")[3] == "2"  # depth counts only kept bases


def test_sim1_golden_regression(data_dir, tmp_path):
    """Committed golden readcount output for the sim1 fixture (built
    from expected.vcf via prepare_for_readcount) — regenerate with
    tests/tools/gen_readcount_golden.py only when semantics are
    deliberately changed."""
    d = data_dir / "e2e" / "sim1"
    pos = tmp_path / "sites.pos"
    prepare_for_readcount.main(["--snp-file", str(d / "expected.vcf"),
                                "--out-file", str(pos)])
    out = tmp_path / "rc.txt"
    readcount.main(["-f", str(d / "ref.fa"), "-l", str(pos),
                    str(d / "tumor.bam"), str(out)])
    assert out.read_bytes() == (d / "expected.readcount").read_bytes()
