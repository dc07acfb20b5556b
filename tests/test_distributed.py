"""Two-process jax.distributed run (multi-host execution path).

Spawns two real worker processes wired through the jax.distributed
coordination service (SNIPER_COORDINATOR env, cli._maybe_init_distributed),
each with 4 virtual CPU devices.  Each process defaults to its genome
shard (shard I of N = process id), scores it on its local 4-device mesh,
and writes its own output; the merged bytes must equal the
single-process golden — the reference's golden-diff contract
(reference integration-test/test_sniper.py:19) generalized to N hosts
(SURVEY.md §2.3 / §7.6).
"""

import os
import re
import socket
import subprocess
import sys

from somatic_sniper_tpu.scripts.merge_shards import merge

FILTER = re.compile(r"##fileDate|##reference=")


def _filtered(path) -> list[str]:
    with open(path) as fh:
        return [ln.rstrip("\n") for ln in fh if not FILTER.search(ln)]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_workers(d, outs, extra_args=()):
    port = _free_port()
    procs = []
    for i in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            SNIPER_COORDINATOR=f"127.0.0.1:{port}",
            SNIPER_NUM_PROCESSES="2",
            SNIPER_PROCESS_ID=str(i),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "somatic_sniper_tpu.cli.main",
             "-F", "vcf", "--precision", "fast", *extra_args,
             "-f", str(d / "ref.fa"),
             str(d / "tumor.bam"), str(d / "normal.bam"), str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(errs)


def test_two_process_distributed_matches_golden(data_dir, tmp_path):
    d = data_dir / "e2e" / "sim1"
    outs = [tmp_path / f"shard{i}.vcf" for i in range(2)]
    _spawn_workers(d, outs)

    merged = tmp_path / "merged.vcf"
    merge(str(merged), [str(o) for o in outs])
    assert _filtered(merged) == _filtered(d / "expected.vcf")

    # both workers actually went through jax.distributed + their shard:
    # each shard holds a strict subset of the records
    n0 = sum(1 for ln in _filtered(outs[0]) if not ln.startswith("#"))
    n1 = sum(1 for ln in _filtered(outs[1]) if not ln.startswith("#"))
    n = sum(1 for ln in _filtered(merged) if not ln.startswith("#"))
    assert n0 + n1 == n and n0 > 0 and n1 > 0


def test_two_process_collective_merge(data_dir, tmp_path):
    """--merge collective: shard bytes ride an XLA all_gather; process 0
    writes the merged output itself (no shared-filesystem merge step).
    Bytes must equal the golden, like the file-based path."""
    d = data_dir / "e2e" / "sim1"
    out = tmp_path / "merged.vcf"
    _spawn_workers(d, [out, out], extra_args=("--merge", "collective"))

    assert _filtered(out) == _filtered(d / "expected.vcf")
    # per-process shard files exist and are strict subsets
    n0 = sum(1 for ln in _filtered(tmp_path / "merged.vcf.shard0")
             if not ln.startswith("#"))
    n1 = sum(1 for ln in _filtered(tmp_path / "merged.vcf.shard1")
             if not ln.startswith("#"))
    n = sum(1 for ln in _filtered(out) if not ln.startswith("#"))
    assert n0 + n1 == n and n0 > 0 and n1 > 0
