"""CLI usage()/version_info() text parity (reference main.c:20-62).

The pinned golden below is a transcription of the reference's fprintf
strings with the defaults it would print (mapQ=0, min_somatic_qual=15,
somatic_mutation_rate=0.01, theta=0.85, n_hap=2, het_rate=0.001 —
main.c:70-78, sniper_maqcns.c:107-111) and the formatter registry order
(output_format.c:10-17).
"""

import io
import sys

from somatic_sniper_tpu.cli.main import main, usage_text

REFERENCE_USAGE = (
    "\n"
    "\n"
    "{prog} [options] -f <ref.fasta> <tumor.bam> <normal.bam>"
    " <snp_output_file>\n"
    "\n"
    "Required Option: \n"
    "        -f FILE   REQUIRED reference sequence in the FASTA format\n"
    "\n"
    "Options: \n"
    "        -v        Display version information\n"
    "\n"
    "        -q INT    filtering reads with mapping quality less than"
    " INT [0]\n"
    "        -Q INT    filtering somatic snv output with somatic quality"
    " less than  INT [15]\n"
    "        -L FLAG   do not report LOH variants as determined by"
    " genotypes\n"
    "        -G FLAG   do not report Gain of Reference variants as"
    " determined by genotypes\n"
    "        -p FLAG   disable priors in the somatic calculation."
    " Increases sensitivity for solid tumors\n"
    "        -J FLAG   Use prior probabilities accounting for the somatic"
    " mutation rate\n"
    "        -s FLOAT  prior probability of a somatic mutation"
    " (implies -J) [0.010000]\n"
    "        -T FLOAT  theta in maq consensus calling model (for -c/-g)"
    " [0.850000]\n"
    "        -N INT    number of haplotypes in the sample (for -c/-g)"
    " [2]\n"
    "        -r FLOAT  prior of a difference between two haplotypes"
    " (for -c/-g) [0.001000]\n"
    "        -n STRING normal sample id (for VCF header) [NORMAL]\n"
    "        -t STRING tumor sample id (for VCF header) [TUMOR]\n"
    "        -F STRING select output format [classic]\n"
    "           Available formats:\n"
    "             classic\n"
    "             vcf\n"
    "             bed\n"
    "\n"
)


def test_usage_text_matches_reference_bytes():
    assert usage_text("bam-somaticsniper") == REFERENCE_USAGE.format(
        prog="bam-somaticsniper"
    )


def test_no_args_prints_usage_and_exits_1(capsys):
    rc = main([])
    captured = capsys.readouterr()
    assert rc == 1
    assert captured.err == REFERENCE_USAGE.format(
        prog="bam-somaticsniper-tpu"
    )


def test_version_format(capsys):
    rc = main(["-v"])
    captured = capsys.readouterr()
    assert rc == 0
    # reference: "Somatic Sniper version (%s) (commit %s)[ (%s)]\n"
    assert captured.out.startswith("Somatic Sniper version (")
    assert ") (commit " in captured.out
    assert captured.out.endswith(")\n")


def test_usage_reflects_flag_overrides(capsys):
    # reference usage() prints the *parsed* defaults (d->mapQ etc. after
    # getopt), so explicit flags show through when positionals are absent
    rc = main(["-q", "5", "-Q", "40"])
    captured = capsys.readouterr()
    assert rc == 1
    assert "less than INT [5]" in captured.err
    assert "less than  INT [40]" in captured.err
