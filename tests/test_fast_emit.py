"""Bulk text emission (output.fast_emit) is byte-identical to the
record-object path (output.formatters).

formatters.py is the readable reference implementation of
output_classic.c / output_vcf.c / output_bed.c; fast_emit.py is the
production one-pass line builder used whenever the CLI writes output.
Every fixture x format x precision must produce the same bytes through
both (headers come from formatters in both cases, so only record lines
are compared).
"""

import io

import pytest

from somatic_sniper_tpu.models.tables import ModelParams
from somatic_sniper_tpu.output.formatters import get_formatter
from somatic_sniper_tpu.runner import call_pair

from .test_e2e import E2E_CASES

# CLI flag -> ModelParams kwarg (mirrors cli/main.py:303-316)
_FLAG_PARAMS = {
    "-J": ("use_joint_priors", True),
    "-p": ("use_priors", False),
    "-L": ("include_loh", False),
    "-G": ("include_gor", False),
}


def _params_from_args(args):
    kw = {}
    i = 0
    while i < len(args):
        a = args[i]
        if a == "-F":
            i += 2
            continue
        if a in _FLAG_PARAMS:
            k, v = _FLAG_PARAMS[a]
            kw[k] = v
            i += 1
            continue
        val = args[i + 1]
        if a == "-q":
            kw["mapq_threshold"] = int(val)
        elif a == "-Q":
            kw["min_somatic_qual"] = int(val)
        elif a == "-s":
            kw["somatic_mutation_rate"] = float(val)
            kw["use_joint_priors"] = True
        elif a == "-T":
            kw["theta"] = float(val)
        elif a == "-N":
            kw["n_hap"] = int(val)
        elif a == "-r":
            kw["het_rate"] = float(val)
        i += 2
    return ModelParams(**kw)


def _fmt_of(args):
    return args[args.index("-F") + 1]


@pytest.mark.parametrize("case,tag,args", E2E_CASES)
@pytest.mark.parametrize("precision", ["exact", "fast"])
def test_lines_match_records(data_dir, case, tag, args, precision):
    d = data_dir / "e2e" / case
    fmt = _fmt_of(args)
    params = _params_from_args(args)
    common = dict(
        tumor_bam=str(d / "tumor.bam"),
        normal_bam=str(d / "normal.bam"),
        ref_fasta=str(d / "ref.fa"),
        params=params,
        precision=precision,
    )
    lines = list(call_pair(**common, fmt=fmt))
    _, record_fn = get_formatter(fmt)
    buf = io.StringIO()
    for rec in call_pair(**common):
        record_fn(buf, rec)
    assert "".join(lines) == buf.getvalue()
