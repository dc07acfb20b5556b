"""BAI index build/parse + region-sharded pileup equality."""

import numpy as np
import pytest

from somatic_sniper_tpu.io import bai, native_api
from somatic_sniper_tpu.io.bam import read_bam
from somatic_sniper_tpu.pileup.columnize import columnize


@pytest.fixture(scope="module")
def sim1_bam(data_dir):
    return str(data_dir / "e2e" / "sim1" / "tumor.bam")


@pytest.fixture(scope="module")
def index(sim1_bam):
    return bai.build_index(sim1_bam)


def test_index_roundtrip(tmp_path, sim1_bam, index):
    p = tmp_path / "t.bai"
    index.write(p)
    idx2 = bai.load_index(p)
    assert len(idx2.refs) == len(index.refs)
    for r1, r2 in zip(index.refs, idx2.refs):
        assert sorted(r1.bins) == sorted(r2.bins)
        for b in r1.bins:
            np.testing.assert_array_equal(
                np.asarray(r1.bins[b]).reshape(-1, 2),
                np.asarray(r2.bins[b]).reshape(-1, 2),
            )
        np.testing.assert_array_equal(r1.linear, r2.linear)


def _window_cols(pu, tid, beg, end):
    """Column indices of a whole-file pileup inside [beg, end) of tid."""
    lo = (tid << 40) | beg
    hi = (tid << 40) | end
    a = np.searchsorted(pu.ukeys, lo)
    b = np.searchsorted(pu.ukeys, hi)
    return a, b


@pytest.mark.parametrize(
    "tid,beg,end",
    [(0, 0, 1000), (0, 404, 1721), (0, 2400, 3000), (1, 100, 2096)],
)
def test_region_pileup_matches_whole_file(sim1_bam, index, tid, beg, end):
    chunks = bai.region_chunks(index, tid, beg, end)
    assert chunks, "region should have candidate chunks"
    pu_r = native_api.load_region_and_columnize(
        sim1_bam, np.asarray(chunks), tid, beg, end
    )
    _, pu_full = native_api.load_and_columnize(sim1_bam)
    a, b = _window_cols(pu_full, tid, beg, end)
    np.testing.assert_array_equal(pu_r.ukeys, pu_full.ukeys[a:b])
    d_full = np.diff(pu_full.offsets)[a:b]
    np.testing.assert_array_equal(np.diff(pu_r.offsets), d_full)
    # per-column slot multisets
    s_full = pu_full.offsets[a]
    for i in range(len(pu_r.ukeys)):
        r0, r1 = int(pu_r.offsets[i]), int(pu_r.offsets[i + 1])
        f0 = int(pu_full.offsets[a + i])
        f1 = int(pu_full.offsets[a + i + 1])
        assert sorted(pu_r.slots[r0:r1].tolist()) == \
            sorted(pu_full.slots[f0:f1].tolist())


def test_shard_concatenation_covers_contig(sim1_bam, index):
    """N contiguous windows == the whole contig, no dupes, no gaps."""
    _, pu_full = native_api.load_and_columnize(sim1_bam)
    header, _ = native_api.load_and_columnize(sim1_bam)
    clen = 3000
    cuts = [0, 513, 1777, 2400, clen]
    ukeys = []
    total_entries = 0
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        chunks = bai.region_chunks(index, 0, lo, hi)
        pu = native_api.load_region_and_columnize(
            sim1_bam, np.asarray(chunks), 0, lo, hi
        )
        ukeys.append(np.asarray(pu.ukeys).copy())
        total_entries += int(pu.offsets[-1])
    cat = np.concatenate(ukeys)
    a, b = _window_cols(pu_full, 0, 0, clen)
    np.testing.assert_array_equal(cat, pu_full.ukeys[a:b])
    assert total_entries == int(
        pu_full.offsets[b] - pu_full.offsets[a]
    )


def test_ensure_index_caches(tmp_path, data_dir, sim1_bam):
    import shutil

    p = tmp_path / "x.bam"
    shutil.copy(sim1_bam, p)
    idx = bai.ensure_index(p)
    assert (tmp_path / "x.bam.bai").exists()
    idx2 = bai.ensure_index(p)
    assert len(idx.refs) == len(idx2.refs)
