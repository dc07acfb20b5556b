"""Per-site depth/quality statistics (reference dqstats.c:6-53).

Computed host-side, only for emitted sites (a tiny fraction of columns),
in exact float64 — so the device kernel never has to carry these wide
per-allele accumulators.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class DqStats:
    mean_baseq: list = field(default_factory=lambda: [0, 0, 0, 0])
    mean_mapq: list = field(default_factory=lambda: [0, 0, 0, 0])
    base_occ: list = field(default_factory=lambda: [0, 0, 0, 0])
    dp4: list = field(default_factory=lambda: [0, 0, 0, 0])
    total_depth: int = 0
    total_mean_mapq: int = 0


def get_dqstats(base16, baseq, mapq, strand, is_del, ref_base4, wanted_bases):
    """Exact replication of get_dqstats (reference dqstats.c:6-53).

    Inputs are the per-entry arrays of one column.  Quirk preserved: a '='
    base (code 0) satisfies ``(base & value) == base`` for every value, so
    it increments all four base_occ counters.
    """
    d = DqStats()
    keep = ~np.asarray(is_del, bool)
    b = np.asarray(base16)[keep].astype(np.int64)
    bq = np.asarray(baseq)[keep].astype(np.int64)
    mq = np.asarray(mapq)[keep].astype(np.int64)
    st = np.asarray(strand)[keep].astype(np.int64)

    d.total_depth = int(len(b))
    tot_mapq = int(mq.sum())

    is_ref = b == ref_base4
    for s in (0, 1):
        d.dp4[s] = int((is_ref & (st == s)).sum())
        d.dp4[2 + s] = int((~is_ref & (st == s)).sum())

    sb = [0, 0, 0, 0]
    sm = [0, 0, 0, 0]
    for j in range(4):
        value = 1 << j
        m = (b & value) == b
        d.base_occ[j] = int(m.sum())
        if value & wanted_bases:
            sb[j] = int(bq[m].sum())
            sm[j] = int(mq[m].sum())

    for j in range(4):
        if d.base_occ[j] > 0:
            # C: uint32 = uint32_sum / (double)occ + .499 (truncates)
            d.mean_baseq[j] = int(sb[j] / float(d.base_occ[j]) + 0.499)
            d.mean_mapq[j] = int(sm[j] / float(d.base_occ[j]) + 0.499)

    if d.total_depth > 0:
        d.total_mean_mapq = int(tot_mapq / float(d.total_depth) + 0.499)
    return d
