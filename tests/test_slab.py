"""Uniform-slab dispatcher invariants (parallel.slab).

The output contract: record bytes are independent of slab packing —
slab size, cross-window slab spans, partial-slab padding and the
max-live force flush must never change what is emitted (the same
window/shard-count invariance the reference's single stream trivially
has, SURVEY.md §7 "deterministic distributed merge").
"""

import numpy as np
import pytest

from somatic_sniper_tpu import runner
from somatic_sniper_tpu.models.tables import ModelParams
from somatic_sniper_tpu.parallel.sharded import call_pair_windows
from somatic_sniper_tpu.utils.stats import STATS


def _lines_windowed(d, window_size, fmt="vcf", **kw):
    out = []
    for _wi, _w, lines in call_pair_windows(
        str(d / "tumor.bam"), str(d / "normal.bam"), str(d / "ref.fa"),
        precision="fast", fmt=fmt, window_size=window_size, **kw,
    ):
        out.extend(lines)
    return out


def test_tiny_slabs_cross_window_same_output(monkeypatch, data_dir):
    d = data_dir / "e2e" / "sim1"
    baseline = _lines_windowed(d, 200_000)

    # slab B=16: several slabs, spanning window boundaries with tiny
    # windows; the packing must be invisible in the output
    monkeypatch.setenv("SNIPER_SLAB_B", "16")
    s0 = STATS.snapshot()
    got = _lines_windowed(d, 10_000)
    s1 = STATS.snapshot()
    assert got == baseline
    assert (
        s1.get("slabs_dispatched", 0) - s0.get("slabs_dispatched", 0)
    ) >= 2


def test_partial_slab_padding_invisible(monkeypatch, data_dir):
    """A run that fits in one partial slab equals a run cut into many
    full slabs (zero-padded tail rows must never emit)."""
    d = data_dir / "e2e" / "sim1"
    big = _lines_windowed(d, 1_000_000)  # default B: one partial slab
    monkeypatch.setenv("SNIPER_SLAB_B", "128")
    small = _lines_windowed(d, 1_000_000)
    assert small == big


def test_final_partial_slab_host_tail(monkeypatch, data_dir):
    """Above the link break-even the FINAL partial slab is scored
    host-side (no unhidden round trip); mid-run full slabs still
    dispatch, and output must satisfy the fast contract against the
    always-dispatch run (exact tail values have zero drift, so the
    only legal diffs come from the device-scored majority)."""
    from somatic_sniper_tpu.utils.contract import diff_records

    d = data_dir / "e2e" / "sim1"
    baseline = _lines_windowed(d, 200_000)  # threshold 0: all device

    monkeypatch.setenv("SNIPER_SLAB_B", "64")
    monkeypatch.setenv("SNIPER_DEVICE_MIN_COLS", "100000")
    s0 = STATS.snapshot()
    got = _lines_windowed(d, 200_000)
    s1 = STATS.snapshot()
    diff_records(got, baseline, "vcf")
    delta = lambda k: s1.get(k, 0) - s0.get(k, 0)
    assert delta("host_tail_columns") > 0, "tail never host-scored"
    assert delta("slabs_dispatched") >= 1, "mid-run slabs must dispatch"


def test_endgame_host_cutover(monkeypatch, data_dir):
    """When the whole remaining run fits in the open slab and sits
    under the link break-even, the dispatcher cuts over to host
    scoring as windows arrive — with a big slab and a huge break-even
    nothing should be dispatched at all, and output must satisfy the
    contract against the all-device run."""
    from somatic_sniper_tpu.utils.contract import diff_records

    d = data_dir / "e2e" / "sim1"
    baseline = _lines_windowed(d, 200_000)  # threshold 0: all device

    monkeypatch.setenv("SNIPER_DEVICE_MIN_COLS", "1000000")
    monkeypatch.setenv("SNIPER_SLAB_B", "65536")
    s0 = STATS.snapshot()
    got = _lines_windowed(d, 20_000)
    s1 = STATS.snapshot()
    diff_records(got, baseline, "vcf")
    delta = lambda k: s1.get(k, 0) - s0.get(k, 0)
    assert delta("host_tail_columns") > 0
    assert delta("slabs_dispatched") == 0, (
        "endgame + finish tail should have host-scored everything"
    )


def test_max_live_force_flush(monkeypatch, data_dir):
    """Sparse windows under a huge slab must still flush (bounded
    held-window memory) and yield identical records."""
    d = data_dir / "e2e" / "sim1"
    baseline = _lines_windowed(d, 200_000)
    # B far above the per-window survivor count: slabs would never fill
    # on their own, so only the max-live bound can flush them
    monkeypatch.setenv("SNIPER_SLAB_B", "16384")

    from somatic_sniper_tpu.parallel import slab as slab_mod

    orig_init = slab_mod.SlabDispatcher.__init__

    def init2(self, *a, **kw):
        kw["max_live_windows"] = 2
        orig_init(self, *a, **kw)

    monkeypatch.setattr(slab_mod.SlabDispatcher, "__init__", init2)
    got = _lines_windowed(d, 20_000)
    assert got == baseline


def test_whole_file_and_windowed_agree(data_dir):
    d = data_dir / "e2e" / "sim1"
    whole = [
        ln for ln in runner.call_pair(
            str(d / "tumor.bam"), str(d / "normal.bam"),
            str(d / "ref.fa"), precision="fast", fmt="vcf",
        )
    ]
    assert whole == _lines_windowed(d, 50_000)


# non-default flag surface: joint priors (-J -s), LOH/GOR suppression
# (-L -G), and the classic/bed formatters must all be packing-invariant
# through the windowed slab dispatcher, not just default vcf
FLAG_CASES = {
    "joint": (ModelParams(use_joint_priors=True,
                          somatic_mutation_rate=0.001), "vcf"),
    "loh_gor": (ModelParams(include_loh=False, include_gor=False,
                            min_somatic_qual=0), "vcf"),
    "classic": (ModelParams(), "classic"),
    "bed": (ModelParams(), "bed"),
}


@pytest.mark.parametrize("case", sorted(FLAG_CASES))
def test_flag_surface_packing_invariant(monkeypatch, data_dir, case):
    params, fmt = FLAG_CASES[case]
    d = data_dir / "e2e" / "sim1"
    baseline = _lines_windowed(d, 200_000, fmt=fmt, params=params)
    assert baseline, case
    monkeypatch.setenv("SNIPER_SLAB_B", "16")
    got = _lines_windowed(d, 10_000, fmt=fmt, params=params)
    assert got == baseline


@pytest.mark.parametrize("case", sorted(FLAG_CASES))
def test_mode_mix_ordering(monkeypatch, data_dir, case):
    """A non-plannable window BETWEEN slab windows forces the windowed
    driver through its mode-mix ordering guards (parallel/sharded.py):
    the open slab dispatcher must be finished before the legacy-path
    window yields, and records must stay in window order."""
    params, fmt = FLAG_CASES[case]
    d = data_dir / "e2e" / "sim1"
    baseline = _lines_windowed(d, 2_000, fmt=fmt, params=params)

    calls = {"n": 0}
    orig = runner.can_plan

    def flaky_can_plan(pu_t, pu_n, packed16):
        calls["n"] += 1
        if calls["n"] % 3 == 2:  # every 3rd window takes the legacy path
            return False
        return orig(pu_t, pu_n, packed16)

    # patch the name the windowed driver imports
    monkeypatch.setattr(runner, "can_plan", flaky_can_plan)
    got = _lines_windowed(d, 2_000, fmt=fmt, params=params)
    assert calls["n"] > 3, "fixture must span several windows"
    assert got == baseline
