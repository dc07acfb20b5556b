"""Generate the hand-crafted adversarial e2e fixture (sim4_adversarial).

Covers parser/model edge cases the random simulator rarely or never
produces: '='/X CIGAR ops, pad and hard-clip ops, '=' base characters,
reads hanging off the contig end, ref-skips, whole-read soft clips,
mapq 0/254 and baseq 0/93 extremes, IUPAC/N/lowercase reference bases,
LOH and GOR genotype configurations, and the contig-transition drop
quirk.  Golden outputs come from the reference binary.

Usage: python tests/tools/gen_adversarial_fixture.py /tmp/ref/bam-somaticsniper
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from gen_bam_fixtures import _write_fai  # noqa: E402

from somatic_sniper_tpu.io.bam_writer import encode_record, write_bam  # noqa: E402

DATA = Path(__file__).resolve().parent.parent / "data" / "e2e"

REF1 = list("ACGT" * 150)  # contig "adv", 600 bp
REF1[550] = "R"  # IUPAC ambiguity
REF1[560] = "N"
for i in range(570, 580):
    REF1[i] = REF1[i].lower()
REF1 = "".join(REF1)
REF2 = "ACGT" * 50  # contig "adv2", 200 bp


def ref_seq(contig: str, pos: int, ln: int) -> str:
    src = REF1 if contig == "adv" else REF2
    return src[pos:pos + ln].upper().replace("R", "A").replace("N", "A")


def reads_at(contig, pos, n, alt=None, alt_off=10, ln=20, baseq=35,
             mapq=50, name="r"):
    """n plain ln-M reads starting at pos; alt substitutes one base."""
    out = []
    for k in range(n):
        seq = list(ref_seq(contig, pos, ln))
        if alt is not None:
            seq[alt_off] = alt
        out.append(dict(
            contig=contig, pos=pos, mapq=mapq,
            flag=16 if k % 2 else 0, seq="".join(seq),
            qual=bytes([baseq] * ln), cigar=[(ln, "M")],
            name=f"{name}{pos}_{k}",
        ))
    return out


def build_reads():
    reads = []
    # --- site A (adv:100, ref A): somatic A->C with parser exotica ----
    reads += reads_at("adv", 90, 8, alt="C")
    reads += reads_at("adv", 90, 1, alt="=", name="eq")  # '=' base char
    reads += reads_at("adv", 90, 10, name="n_only")      # ref support
    # deletion spanning the site
    seq = ref_seq("adv", 90, 18)
    reads.append(dict(contig="adv", pos=90, mapq=50, flag=0, seq=seq,
                      qual=bytes([35] * 18),
                      cigar=[(8, "M"), (4, "D"), (10, "M")], name="del"))
    # insertion before the site
    seq = ref_seq("adv", 90, 19)[:5] + "T" + ref_seq("adv", 95, 14)
    reads.append(dict(contig="adv", pos=90, mapq=50, flag=16, seq=seq,
                      qual=bytes([35] * 20),
                      cigar=[(5, "M"), (1, "I"), (14, "M")], name="ins"))
    # '='/X CIGAR ops (samtools-0.1.6 ignores both)
    seq = list(ref_seq("adv", 90, 20))
    seq[10] = "C"
    reads.append(dict(contig="adv", pos=90, mapq=50, flag=0,
                      seq="".join(seq), qual=bytes([35] * 20),
                      cigar=[(10, "="), (1, "X"), (9, "=")], name="eqx"))
    # hard clips + pad op
    reads.append(dict(contig="adv", pos=90, mapq=50, flag=16,
                      seq=ref_seq("adv", 90, 20), qual=bytes([35] * 20),
                      cigar=[(2, "H"), (10, "M"), (1, "P"), (10, "M"),
                             (2, "H")], name="hp"))
    # mapq/baseq extremes
    reads += reads_at("adv", 92, 1, alt="C", alt_off=8, mapq=0,
                      name="mq0")
    reads += reads_at("adv", 92, 1, alt="C", alt_off=8, mapq=254,
                      name="mqhi")
    reads += reads_at("adv", 92, 1, alt="C", alt_off=8, baseq=0,
                      name="bq0")
    reads += reads_at("adv", 92, 1, alt="C", alt_off=8, baseq=93,
                      name="bqhi")
    # whole-read soft clip (no columns)
    reads.append(dict(contig="adv", pos=110, mapq=50, flag=0,
                      seq=ref_seq("adv", 110, 20), qual=bytes([35] * 20),
                      cigar=[(20, "S")], name="softonly"))
    # ref-skip read
    reads.append(dict(contig="adv", pos=140, mapq=50, flag=0,
                      seq=ref_seq("adv", 140, 5) + ref_seq("adv", 175, 5),
                      qual=bytes([35] * 10),
                      cigar=[(5, "M"), (30, "N"), (5, "M")], name="skip"))
    # --- site B (adv:220): LOH — normal het A/C, tumor hom C ----------
    reads += reads_at("adv", 210, 12, alt="C", name="b_t")
    reads += reads_at("adv", 210, 6, alt="C", name="b_nalt")
    reads += reads_at("adv", 210, 6, name="b_nref")
    # --- site C (adv:340): GOR — normal hom C, tumor het A/C ----------
    reads += reads_at("adv", 330, 12, alt="C", name="c_n")
    reads += reads_at("adv", 330, 6, alt="C", name="c_talt")
    reads += reads_at("adv", 330, 6, name="c_tref")
    # --- ambiguous-reference region (R at 550, N at 560, lowercase) ---
    reads += reads_at("adv", 542, 10, alt="G", alt_off=8, name="amb")
    reads += reads_at("adv", 542, 10, name="amb_ref")
    # --- reads hanging off the contig end -----------------------------
    reads += reads_at("adv", 588, 6, alt="C", alt_off=6, name="end")
    # --- contig 2: transition-drop quirk victim + a live site ---------
    reads += reads_at("adv2", 0, 1, name="quirk")  # end 20 <= 588
    reads += reads_at("adv2", 24, 7, alt="C", name="d_t")
    reads += reads_at("adv2", 24, 7, name="d_n")
    return reads


def split_pair(reads):
    """Tumor gets the somatic/alt-heavy selection, normal the rest —
    deterministic by read-name prefix."""
    tumor_names = ("r90_", "eq", "del", "ins", "eqx", "hp", "mq0",
                   "mqhi", "bq0", "bqhi", "softonly", "skip", "b_t",
                   "c_talt", "c_tref", "amb5", "amb6", "amb7", "amb8",
                   "amb9", "amb_ref", "end", "quirk", "d_t")
    normal_names = ("n_only", "b_nalt", "b_nref", "c_n", "amb0", "amb1",
                    "amb2", "amb3", "amb4", "amb_ref", "end", "quirk",
                    "d_n")
    t, n = [], []
    for r in reads:
        nm = r["name"]
        if any(nm.startswith(p) for p in tumor_names):
            t.append(r)
        if any(nm.startswith(p) for p in normal_names):
            n.append(r)
    return t, n


def write_pair(d: Path):
    d.mkdir(parents=True, exist_ok=True)
    names = ["adv", "adv2"]
    lens = [len(REF1), len(REF2)]
    with open(d / "ref.fa", "w") as f:
        f.write(f">adv\n{REF1}\n>adv2\n{REF2}\n")
    _write_fai(d / "ref.fa")
    t, n = split_pair(build_reads())
    for fname, rs in (("tumor.bam", t), ("normal.bam", n)):
        rs = sorted(rs, key=lambda r: (names.index(r["contig"]),
                                       r["pos"]))
        recs = [
            encode_record(names.index(r["contig"]), r["pos"], r["mapq"],
                          r["flag"], r["seq"], r["qual"], r["cigar"],
                          read_name=r["name"])
            for r in rs
        ]
        write_bam(d / fname, names, lens, recs)


CASES = [
    ("vcf", ["-F", "vcf", "-Q", "0"]),
    ("classic", ["-F", "classic", "-Q", "0"]),
    ("joint.vcf", ["-F", "vcf", "-J", "-s", "0.001", "-Q", "0"]),
    ("loh.vcf", ["-F", "vcf", "-L", "-G", "-Q", "0"]),
    ("nopriors.classic", ["-F", "classic", "-p", "-Q", "0"]),
]


def main() -> None:
    oracle = sys.argv[1]
    d = DATA / "sim4_adversarial"
    write_pair(d)
    for tag, args in CASES:
        out = d / f"expected.{tag}"
        subprocess.run(
            [oracle, *args, "-f", str(d / "ref.fa"),
             str(d / "tumor.bam"), str(d / "normal.bam"), str(out)],
            check=True, capture_output=True,
        )
        print(tag, out.stat().st_size)


if __name__ == "__main__":
    main()
