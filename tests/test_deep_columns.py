"""Beyond-the-buckets (oversize) column handling.

Columns deeper than DEPTH_BUCKETS[-1] must be dispatched in depth-sorted
chunks — never one device batch per column — and their records must be
identical to the normal bucketed path.  The fixtures' depths are forced
over a shrunken bucket list rather than committing a multi-GB deep BAM.
"""

import numpy as np
import pytest

from somatic_sniper_tpu import runner
from somatic_sniper_tpu.pileup import columnize


def _records(d, **kw):
    return list(runner.call_pair(
        str(d / "tumor.bam"), str(d / "normal.bam"), str(d / "ref.fa"),
        precision="fast", **kw,
    ))


@pytest.mark.parametrize("case", ["sim1", "sim2_deep"])
def test_oversize_chunks_match_bucketed_output(monkeypatch, data_dir, case):
    d = data_dir / "e2e" / case
    baseline = _records(d)

    calls = []
    orig = runner._dispatch_fast

    def spy(plan, s, e, D, *a, **kw):
        sel = kw.get("sel")
        calls.append((e - s if sel is None else len(sel), D))
        return orig(plan, s, e, D, *a, **kw)

    monkeypatch.setattr(runner, "_dispatch_fast", spy)
    monkeypatch.setattr(columnize, "DEPTH_BUCKETS", (8, 16))
    got = _records(d)

    assert got == baseline
    # every 30x column beyond depth 16 is oversize now; they must have
    # been chunked (hundreds of columns per dispatch), not sent 1-by-1
    oversize = [(b, D) for b, D in calls if D > 16]
    assert oversize, "expected oversize dispatches with tiny buckets"
    assert max(b for b, _ in oversize) > 1
    n_oversize_cols = sum(b for b, _ in oversize)
    assert len(oversize) <= max(1, n_oversize_cols // 100), (
        f"oversize dispatch count {len(oversize)} for "
        f"{n_oversize_cols} columns — still per-column?"
    )
    # padded depths are 1024-multiples (compile-variety bound)
    assert all(D % 1024 == 0 for _, D in oversize)


def test_depth_pad():
    assert runner._depth_pad(1) == 1024
    assert runner._depth_pad(1024) == 1024
    assert runner._depth_pad(1025) == 2048
    assert runner._depth_pad(9000) == 9216
