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
from pathlib import Path

import pytest

from somatic_sniper_tpu.scripts.merge_shards import merge

FILTER = re.compile(r"##fileDate|##reference=")


def _filtered(path) -> list[str]:
    with open(path) as fh:
        return [ln.rstrip("\n") for ln in fh if not FILTER.search(ln)]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_workers(d, outs, extra_args=(), n=2, per_worker_env=None,
                   local_devices=4, expect_rc=None, timeout=300):
    port = _free_port()
    procs = []
    for i in range(n):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                f"--xla_force_host_platform_device_count={local_devices}"
            ),
            SNIPER_COORDINATOR=f"127.0.0.1:{port}",
            SNIPER_NUM_PROCESSES=str(n),
            SNIPER_PROCESS_ID=str(i),
        )
        if per_worker_env:
            env.update(per_worker_env(i) or {})
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "somatic_sniper_tpu.cli.main",
             "-F", "vcf", "--precision", "fast", *extra_args,
             "-f", str(d / "ref.fa"),
             str(d / "tumor.bam"), str(d / "normal.bam"), str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    errs, rcs = [], []
    for p in procs:
        try:
            _, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err)
        rcs.append(p.returncode)
    if expect_rc is None:
        assert all(rc == 0 for rc in rcs), "\n---\n".join(errs)
    else:
        assert rcs == expect_rc, f"{rcs}\n" + "\n---\n".join(errs)
    return errs


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


def _big_pair_dir() -> Path:
    """Cached 4 Mb synthetic pair for the multi-MB distributed tests
    (multi-MB shard outputs need multi-Mb genomes; one-time generate)."""
    d = Path(os.environ.get("SNIPER_TEST_BIG_DIR",
                            "/tmp/sniper_test_pair_4mb"))
    if not (d / "ref.fa.fai").exists():
        from somatic_sniper_tpu.utils.simulate import (SimConfig,
                                                       simulate_pair_fast)

        simulate_pair_fast(d, SimConfig(n_contigs=2, contig_len=2_000_000,
                                        mean_depth=30.0, seed=23))
    return d


@pytest.mark.slow
def test_four_process_collective_merge_multi_mb(tmp_path):
    """4 processes, multi-MB shard payloads, chunked record gather: the
    collective merge must stream in bounded chunks (several all_gather
    rounds, O(chunk x N) memory — never whole padded files) and produce
    bytes identical to the file-based merge of the same shards."""
    d = _big_pair_dir()
    out = tmp_path / "merged.vcf"
    _spawn_workers(
        d, [out] * 4, extra_args=("--merge", "collective"), n=4,
        local_devices=1,
        # 256 KB chunks over >1 MB shards: >= 5 gather rounds each
        per_worker_env=lambda i: {"SNIPER_MERGE_CHUNK": "262144"},
        timeout=1200,
    )
    shards = [str(tmp_path / f"merged.vcf.shard{i}") for i in range(4)]
    sizes = [os.path.getsize(s) for s in shards]
    assert min(sizes) > 1_000_000, f"shards too small for the bar: {sizes}"
    ref = tmp_path / "file_merge.vcf"
    merge(str(ref), shards)
    assert out.read_bytes() == ref.read_bytes()


@pytest.mark.slow
def test_worker_death_fails_fast_then_resumes(tmp_path):
    """Distributed failure semantics: SIGKILL-equivalent death of one of
    4 workers mid-run must (a) fail the survivors FAST via the pre-merge
    barrier timeout (no indefinite all_gather hang), (b) leave every
    shard's output + resume manifest consistent, and (c) a re-run with
    the same manifests must complete and match the golden."""
    d = Path(__file__).parent / "data" / "e2e" / "sim1"
    out = tmp_path / "merged.vcf"
    manifests = [str(tmp_path / f"m{i}.jsonl") for i in range(4)]
    # sim1 is 2 x 3 kb: 500 bp windows give every shard 3 windows
    base_args = ("--merge", "collective", "--window-size", "500")

    def spawn(extra_env):
        port = _free_port()
        procs = []
        for i in range(4):
            env = dict(
                os.environ,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=1",
                SNIPER_COORDINATOR=f"127.0.0.1:{port}",
                SNIPER_NUM_PROCESSES="4",
                SNIPER_PROCESS_ID=str(i),
                **(extra_env(i) or {}),
            )
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "somatic_sniper_tpu.cli.main",
                 "-F", "vcf", "--precision", "fast", *base_args,
                 "--manifest", manifests[i],
                 "-f", str(d / "ref.fa"),
                 str(d / "tumor.bam"), str(d / "normal.bam"), str(out)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            ))
        errs, rcs = [], []
        for p in procs:
            _, err = p.communicate(timeout=600)
            errs.append(err)
            rcs.append(p.returncode)
        return rcs, errs

    # worker 2 dies hard after its first completed window; the rest
    # finish scoring and must time out at the merge barrier with exit 3
    # barrier timeout must outlast the slowest peer's compile on a
    # loaded host, but a dead worker never arrives — 30 s is "fast"
    # against the indefinite all_gather hang it replaces (in practice
    # the coordination-service heartbeat errors the survivors even
    # sooner)
    rcs, errs = spawn(lambda i: {
        "SNIPER_MERGE_TIMEOUT_MS": "30000",
        **({"SNIPER_FAULT_EXIT_AFTER_WINDOW": "1"} if i == 2 else {}),
    })
    assert rcs[2] == 17, errs[2]               # the injected crash
    for i in (0, 1, 3):
        # survivors fail FAST with exit 3 — via the pre-merge barrier
        # timeout or, even earlier, the coordination service's
        # heartbeat detecting the dead task; either way no indefinite
        # all_gather hang and no shutdown-path hang (hard exit)
        assert rcs[i] == 3, (i, rcs, errs[i])
        assert ("merge barrier failed" in errs[i]
                or "distributed run failed" in errs[i]), (i, errs[i])
    # every manifest (including the victim's prefix) is well-formed
    for m in manifests:
        assert os.path.getsize(m) > 0

    # re-run with the same manifests: completed windows skip, the victim
    # resumes, the merge succeeds and matches the golden (generous
    # barrier timeout: nothing is dead, slowness must not fail it)
    rcs, errs = spawn(lambda i: {"SNIPER_MERGE_TIMEOUT_MS": "300000"})
    assert rcs == [0, 0, 0, 0], "\n---\n".join(errs)
    assert _filtered(out) == _filtered(d / "expected.vcf")


def test_collective_merge_chunking_single_process(tmp_path, monkeypatch):
    """The chunk loop itself (no multi-process machinery): a shard far
    larger than the chunk must stream through multiple gather rounds and
    reconstruct byte-identically."""
    from somatic_sniper_tpu.parallel.collective import collective_merge

    shard = tmp_path / "shard0"
    payload = b"#header\n" + b"".join(
        f"17\t{i}\trecord line {i}\n".encode() for i in range(20000)
    )
    shard.write_bytes(payload)
    out = tmp_path / "out"
    collective_merge(str(out), str(shard), 0, 1, chunk=4096)
    assert out.read_bytes() == payload
