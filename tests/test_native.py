"""Native (C++) IO/pileup vs pure-Python reference parity."""

import numpy as np
import pytest

from somatic_sniper_tpu.io import native_api
from somatic_sniper_tpu.io.bam import read_bam
from somatic_sniper_tpu.pileup.columnize import columnize

pytestmark = pytest.mark.skipif(
    not native_api.available(), reason="native toolchain unavailable"
)

FILES = [
    "t-small.bam",
    "n-small.bam",
    "e2e/sim1/tumor.bam",
    "e2e/sim1/normal.bam",
    "e2e/sim2_deep/tumor.bam",
    "e2e/sim3_params/normal.bam",
]


@pytest.mark.parametrize("rel", FILES)
def test_native_pileup_matches_python(data_dir, rel):
    f = str(data_dir / rel)
    h1, pu1 = native_api.load_and_columnize(f)
    h2, reads = read_bam(f)
    pu2 = columnize(reads)
    assert h1.ref_names == h2.ref_names
    assert h1.ref_lengths == h2.ref_lengths
    np.testing.assert_array_equal(pu1.ukeys, pu2.ukeys)
    np.testing.assert_array_equal(pu1.offsets, pu2.offsets)
    # entry multisets per column must agree (within-column order is
    # model-irrelevant; see glfgen order-independence analysis)
    for i in range(len(pu1.ukeys)):
        s, e = int(pu1.offsets[i]), int(pu1.offsets[i + 1])
        assert sorted(pu1.slots[s:e].tolist()) == \
            sorted(pu2.slots[s:e].tolist())


@pytest.mark.parametrize(
    "mask,thresh", [(0x704, 0), (0x704, 20), (0x400, 5)]
)
def test_native_filters_match_python(data_dir, mask, thresh):
    f = str(data_dir / "e2e/sim1/tumor.bam")
    _, pu1 = native_api.load_and_columnize(f, mask, thresh)
    _, reads = read_bam(f)
    pu2 = columnize(reads, mask, thresh)
    np.testing.assert_array_equal(pu1.ukeys, pu2.ukeys)
    np.testing.assert_array_equal(pu1.offsets, pu2.offsets)
