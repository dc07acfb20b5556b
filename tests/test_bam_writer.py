"""BAM writer invariants: the vectorized fixed-shape record encoder and
the streaming writer must produce byte streams interchangeable with the
scalar encoder / whole-buffer writer.

The fixture simulator and the WGS soak generate multi-GB BAMs through
encode_records_fixed + write_bam_stream (utils/simulate.py
simulate_pair_fast); a silent encoding divergence there corrupts every
scale test upstream of the caller, and this layer already had one real
bug at scale (read-name width overflow past 100M reads).  The reference
has no writer — samtools is its writer — so the contract here is
self-consistency plus decodability by our own reader stack.
"""

import numpy as np
import pytest

from somatic_sniper_tpu.constants import NT16_REV_TABLE
from somatic_sniper_tpu.io.bam_writer import (
    bgzf_compress,
    encode_record,
    encode_records_fixed,
    write_bam,
    write_bam_stream,
)
from somatic_sniper_tpu.io.bgzf import decompress_file


def _random_records(rng, n, read_len):
    codes = rng.choice(np.array([1, 2, 4, 8, 15], np.uint8),
                       (n, read_len))
    qual = rng.integers(0, 41, (n, read_len)).astype(np.uint8)
    pos = np.sort(rng.integers(0, 5000, n))
    mapq = rng.integers(0, 61, n)
    flag = rng.choice(np.array([0, 16], np.uint16), n)
    return codes, qual, pos, mapq, flag


@pytest.mark.parametrize("read_len", [10, 11])  # even + odd seq packing
def test_fixed_encoder_matches_scalar(read_len):
    rng = np.random.default_rng(7)
    n = 9
    codes, qual, pos, mapq, flag = _random_records(rng, n, read_len)
    fixed = encode_records_fixed(
        0, pos, mapq, flag, codes, qual, read_len, name_width=9, rid0=3
    )
    scalar = b"".join(
        encode_record(
            0, int(pos[i]), int(mapq[i]), int(flag[i]),
            "".join(NT16_REV_TABLE[c] for c in codes[i]),
            bytes(qual[i]), [(read_len, "M")],
            read_name=f"r{3 + i:08d}",
        )
        for i in range(n)
    )
    assert fixed == scalar


def test_fixed_encoder_name_width_overflow():
    rng = np.random.default_rng(1)
    codes, qual, pos, mapq, flag = _random_records(rng, 2, 8)
    with pytest.raises(ValueError, match="name_width"):
        encode_records_fixed(0, pos, mapq, flag, codes, qual, 8,
                             name_width=4, rid0=999)
    # widening the name field fits the same ids
    encode_records_fixed(0, pos, mapq, flag, codes, qual, 8,
                         name_width=5, rid0=999)


def test_stream_writer_matches_whole_buffer(tmp_path):
    rng = np.random.default_rng(11)
    n, read_len = 64, 12
    codes, qual, pos, mapq, flag = _random_records(rng, n, read_len)
    blob = encode_records_fixed(0, pos, mapq, flag, codes, qual, read_len)
    whole = tmp_path / "whole.bam"
    streamed = tmp_path / "streamed.bam"
    write_bam(whole, ["c1"], [6000], blob)
    # awkward blob boundaries: tiny, empty, and sub-block-size chunks
    # exercise the carry at every write
    cuts = [0, 1, 7, 7, 100, 1000, len(blob)]
    chunks = [blob[a:b] for a, b in zip(cuts, cuts[1:])]
    write_bam_stream(streamed, ["c1"], [6000], iter(chunks))
    assert decompress_file(whole) == decompress_file(streamed)


def test_stream_writer_loads_through_native(tmp_path):
    from somatic_sniper_tpu.io import native_api

    rng = np.random.default_rng(5)
    n, read_len = 40, 10
    codes, qual, pos, mapq, flag = _random_records(rng, n, read_len)
    blob = encode_records_fixed(0, pos, mapq, flag, codes, qual, read_len)
    bam = tmp_path / "t.bam"
    write_bam_stream(bam, ["c1"], [6000],
                     iter([blob[:97], blob[97:]]))
    header, pu = native_api.load_and_columnize(str(bam))
    assert header.ref_names == ["c1"]
    # every non-deleted base of every read lands in the pileup
    depth_total = int((pu.offsets[-1] - pu.offsets[0]))
    assert depth_total == n * read_len


def test_threaded_bgzf_matches_serial():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 9 << 20).astype(np.uint8).tobytes()
    serial = bgzf_compress(data, threads=1)
    threaded = bgzf_compress(data, threads=3)
    assert serial == threaded
