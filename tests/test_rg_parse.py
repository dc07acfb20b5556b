"""BamHeader.parse_rg vs samtools-0.1.6 sam_header_parse_rg semantics
(vendored bam_import.c:173-227, called by the reference main.c:132,135).

The C parser is strstr-based and quirky; each case below mirrors its
control flow, including the ones a "clean" @RG parser would get wrong:

* values are found by substring search from just past '@RG' to the END
  of the text, so a missing tag on one line silently borrows the next
  line's value;
* after a pair parses, the scan resumes at (last value end + 3) — an
  @RG line that ends with its LB value HIDES a directly following @RG
  line (bam_import.c:213-214's `s = r + 3`);
* a truly missing ID/LB (nowhere later in the text) warns on stderr and
  aborts the whole scan.
"""

from somatic_sniper_tpu.io.bam import BamHeader


def _h(text: str) -> BamHeader:
    return BamHeader(text=text, ref_names=["c1"], ref_lengths=[100])


def test_basic_pairs():
    # trailing SM fields leave enough slack that the resume-point
    # overshoot does not swallow the following @RG
    t = ("@HD\tVN:1.0\n"
         "@RG\tID:rg1\tLB:libA\tSM:s1\n"
         "@RG\tID:rg2\tLB:libB\tSM:s2\n")
    assert _h(t).parse_rg() == {"rg1": "libA", "rg2": "libB"}


def test_no_rg_lines_returns_none():
    assert _h("@HD\tVN:1.0\n@SQ\tSN:c1\tLN:100\n").parse_rg() is None
    assert _h("").parse_rg() is None
    assert _h("@S").parse_rg() is None  # l_text < 3 early-out


def test_resume_overshoot_hides_adjacent_rg():
    # line 1 ends with its LB value -> s = r + 3 lands past line 2's
    # '@RG', so rg2 is never seen (C bam_import.c:213-214)
    t = ("@RG\tID:rg1\tLB:libA\n"
         "@RG\tID:rg2\tLB:libB\n")
    assert _h(t).parse_rg() == {"rg1": "libA"}


def test_missing_lb_borrows_next_lines_value():
    # rg1 has no LB of its own; strstr finds line 2's "LB:" and pairs
    # rg1 with libB.  The scan then resumes past line 2's '@RG', so rg2
    # itself is never parsed.
    t = ("@RG\tID:rg1\tSM:s1\n"
         "@RG\tID:rg2\tLB:libB\n")
    assert _h(t).parse_rg() == {"rg1": "libB"}


def test_missing_lb_nowhere_aborts(capsys):
    t = "@RG\tID:rg1\tSM:s1\n"
    assert _h(t).parse_rg() is None
    assert "missing LB tag" in capsys.readouterr().err


def test_missing_id_borrows_and_aborts(capsys):
    # first @RG: "ID:" is only found on the NEXT line (rg2), which
    # pairs with the first "LB:" after s (libA)
    t = "@RG\tLB:libA\n@RG\tID:rg2\tLB:libB\n"
    assert _h(t).parse_rg() == {"rg2": "libA"}

    t2 = "@RG\tSM:s\n"
    assert _h(t2).parse_rg() is None
    assert "missing ID tag" in capsys.readouterr().err


def test_rg_substring_anywhere():
    # '@RG' inside a comment line still triggers the C parser
    t = "@CO\tnote @RG here\tID:x\tLB:y\n"
    assert _h(t).parse_rg() == {"x": "y"}
