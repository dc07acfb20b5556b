"""Region-sharded streaming driver: output equality with the whole-file
run (including the contig-transition quirk carry), shard concatenation,
and manifest-based resume."""

import re

import numpy as np
import pytest

from somatic_sniper_tpu.cli.main import main
from somatic_sniper_tpu.models.tables import ModelParams
from somatic_sniper_tpu.parallel.sharded import (
    Manifest,
    call_pair_sharded,
    call_pair_windows,
    genome_windows,
    shard_windows,
)
from somatic_sniper_tpu.runner import call_pair

FILTER = re.compile(r"##fileDate|##reference=")


def _args(data_dir, case="sim1"):
    d = data_dir / "e2e" / case
    return (str(d / "tumor.bam"), str(d / "normal.bam"), str(d / "ref.fa"))


def test_genome_windows():
    assert genome_windows([5000, 3000], 2000) == [
        (0, 0, 2000), (0, 2000, 4000), (0, 4000, 5000),
        (1, 0, 2000), (1, 2000, 3000),
    ]
    ws = genome_windows([5000, 3000], 2000)
    parts = [shard_windows(list(enumerate(ws)), 3, s) for s in range(3)]
    flat = [w for p in parts for w in p]
    assert flat == list(enumerate(ws))


def test_sharded_equals_whole_file(data_dir):
    args = _args(data_dir)
    params = ModelParams(min_somatic_qual=0)
    whole = list(call_pair(*args, params=params))
    # small windows force many boundaries incl. the contig transition
    sharded = list(call_pair_sharded(*args, params=params, window_size=700))
    assert len(whole) == len(sharded) and len(whole) > 0
    assert whole == sharded


def test_load_pool_size_invariant(monkeypatch, data_dir):
    """The region-load pool width / lookahead depth (host-core scaled)
    must never change output — loads land out of order by design."""
    args = _args(data_dir)
    params = ModelParams(min_somatic_qual=0)
    monkeypatch.setenv("SNIPER_LOAD_POOL", "1")
    one = list(call_pair_sharded(*args, params=params, window_size=700))
    monkeypatch.setenv("SNIPER_LOAD_POOL", "5")
    five = list(call_pair_sharded(*args, params=params, window_size=700))
    assert one == five and one


def test_shard_slices_concatenate(data_dir):
    args = _args(data_dir)
    params = ModelParams()
    whole = list(call_pair(*args, params=params))
    recs = []
    for s in range(3):
        recs.extend(
            call_pair_sharded(*args, params=params, window_size=1000,
                              shards=3, shard_index=s)
        )
    assert recs == whole


def _filtered(path):
    return [ln for ln in path.read_text().splitlines()
            if not FILTER.search(ln)]


def test_cli_sharded_matches_plain(data_dir, tmp_path):
    args = _args(data_dir)
    plain = tmp_path / "plain.vcf"
    shd = tmp_path / "sharded.vcf"
    base = ["-F", "vcf", "-f", args[2], args[0], args[1]]
    assert main([*base, str(plain)]) == 0
    assert main([*base, "--shards", "2", "--window-size", "1250",
                 str(shd)]) == 0
    assert _filtered(plain) == _filtered(shd)


def test_cli_manifest_resume(data_dir, tmp_path):
    args = _args(data_dir)
    out = tmp_path / "out.vcf"
    man = tmp_path / "run.manifest"
    base = ["-F", "vcf", "-f", args[2], args[0], args[1],
            "--manifest", str(man), "--window-size", "1000", str(out)]
    assert main(base) == 0
    first = _filtered(out)
    m = Manifest(man)
    assert len(m.done) == 6  # 2 contigs x 3 windows
    # truncate the output mid-way and drop the last two manifest entries
    # to simulate a crash after window 3
    kept = {w: o for w, o in m.done.items() if w < 4}
    man.write_text("".join(
        f'{{"window": {w}, "offset": {o}}}\n' for w, o in sorted(kept.items())
    ))
    with open(out, "r+") as fh:
        fh.seek(max(kept.values()))
        fh.truncate()
        fh.write("GARBAGE THAT SHOULD BE DISCARDED")
    assert main(base) == 0
    assert _filtered(out) == first
    assert len(Manifest(man).done) == 6


def test_merge_shards_matches_single_run(data_dir, tmp_path):
    """Separate per-process shard outputs merge byte-identically to one
    single-process run (headers kept from the first shard only)."""
    from somatic_sniper_tpu.cli.main import main
    from somatic_sniper_tpu.scripts.merge_shards import merge

    d = data_dir / "e2e" / "sim1"
    base = ["-F", "vcf", "-f", str(d / "ref.fa"),
            str(d / "tumor.bam"), str(d / "normal.bam")]
    single = tmp_path / "single.vcf"
    assert main([*base, str(single)]) == 0
    shard_files = []
    for s in range(2):
        out = tmp_path / f"shard{s}.vcf"
        assert main([*base, "--shards", "2", "--shard-index", str(s),
                     "--window-size", "1250", str(out)]) == 0
        shard_files.append(str(out))
    merged = tmp_path / "merged.vcf"
    merge(str(merged), shard_files)
    assert merged.read_bytes() == single.read_bytes()
