"""Minimal BAM writer (BGZF container + BAM records).

Used by the test-fixture simulator and benchmarks to synthesize sorted
tumor/normal BAM pairs; complements the reader in io/bam.py.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

from ..constants import NT16_TABLE
from .bgzf import BGZF_EOF


def _bgzf_block(payload: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(payload) + co.flush()
    # BC subfield stores (total block length - 1):
    # header(18) + comp + crc(4) + isize(4) - 1
    bsize = len(comp) + 25
    header = (
        b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
        + struct.pack("<H", 6)
        + b"BC"
        + struct.pack("<HH", 2, bsize)
    )
    return (
        header
        + comp
        + struct.pack("<I", zlib.crc32(payload) & 0xFFFFFFFF)
        + struct.pack("<I", len(payload))
    )


def bgzf_compress(data: bytes, block_size: int = 0xFF00) -> bytes:
    out = []
    for i in range(0, len(data), block_size):
        out.append(_bgzf_block(data[i : i + block_size]))
    out.append(BGZF_EOF)
    return b"".join(out)


_CIGAR_OPS = "MIDNSHP=X"


def encode_cigar(cigar: list[tuple[int, str]]) -> bytes:
    out = b""
    for length, op in cigar:
        out += struct.pack("<I", (length << 4) | _CIGAR_OPS.index(op))
    return out


def encode_record(
    tid: int,
    pos: int,
    mapq: int,
    flag: int,
    seq: str,
    qual: bytes,
    cigar: list[tuple[int, str]],
    read_name: str = "r",
    next_tid: int = -1,
    next_pos: int = -1,
    tlen: int = 0,
) -> bytes:
    name = read_name.encode() + b"\x00"
    n_cigar = len(cigar)
    l_seq = len(seq)
    # bin: legacy reg2bin — writers may set 0; readers here ignore it
    body = struct.pack(
        "<iiBBHHHiiii",
        tid,
        pos,
        len(name),
        mapq,
        0,
        n_cigar,
        flag,
        l_seq,
        next_tid,
        next_pos,
        tlen,
    )
    body += name + encode_cigar(cigar)
    packed = bytearray((l_seq + 1) // 2)
    for i, ch in enumerate(seq):
        code = int(NT16_TABLE[ord(ch)])
        packed[i // 2] |= code << (4 * (1 - i % 2))
    body += bytes(packed) + bytes(qual)
    return struct.pack("<i", len(body)) + body


def write_bam(
    path: str | Path,
    ref_names: list[str],
    ref_lengths: list[int],
    records: list[bytes],
    text: str | None = None,
) -> None:
    if text is None:
        text = "".join(
            f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in zip(ref_names, ref_lengths)
        )
    tb = text.encode()
    out = b"BAM\x01" + struct.pack("<i", len(tb)) + tb
    out += struct.pack("<i", len(ref_names))
    for n, l in zip(ref_names, ref_lengths):
        nb = n.encode() + b"\x00"
        out += struct.pack("<i", len(nb)) + nb + struct.pack("<i", l)
    out += b"".join(records)
    Path(path).write_bytes(bgzf_compress(out))
