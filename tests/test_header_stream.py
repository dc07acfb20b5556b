"""read_bam_header must stream, not slurp (WGS-scale regression).

The round-4 500 Mb soak exposed the old implementation reading the
ENTIRE BAM and scanning every BGZF block header to parse ~1 kB of
header: ~30 s and a 14.5 GB allocation per call at scale.  These tests
pin the streaming property: bytes past the blocks the header needs are
never touched, so corruption (or terabytes) after them is invisible.
"""

from somatic_sniper_tpu.io.bam import read_bam_header


def test_header_ignores_bytes_past_needed_blocks(tmp_path, data_dir):
    src_path = data_dir / "e2e" / "sim1" / "tumor.bam"
    h0 = read_bam_header(src_path)
    assert h0.ref_names and h0.ref_lengths

    # garbage appended after the valid stream: a slurping parser that
    # scans all block headers dies on the bad gzip magic; a streaming
    # parser never reads this far
    p = tmp_path / "junk_tail.bam"
    p.write_bytes(src_path.read_bytes() + b"\xff" * 4096)
    h1 = read_bam_header(p)
    assert h1 == h0


def test_header_truncated_fails_cleanly(tmp_path, data_dir):
    import pytest

    src = (data_dir / "e2e" / "sim1" / "tumor.bam").read_bytes()
    p = tmp_path / "trunc.bam"
    p.write_bytes(src[:10])  # inside the first BGZF block header
    with pytest.raises(ValueError):
        read_bam_header(p)
