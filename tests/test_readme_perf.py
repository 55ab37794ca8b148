"""README's perf block must be generated from bench_details.json.

Round-2 and round-3 reviews both caught README perf claims drifting from
the measured JSON (device_augment in r2, batch-1 latency in r3).  This
test mechanizes the consistency: the fenced block between the BENCH
markers must be exactly what tools/render_readme_perf.py renders from the
committed bench_details.json — identical prose, every number within 3%
(bench rerun noise passes, hand edits fail).
"""

import json
import os
import re

import pytest

pytestmark = pytest.mark.fast

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NUM = re.compile(r"\d[\d,]*(?:\.\d+)?")


def _split(text):
    """(prose-with-number-holes, [numbers]) for drift comparison."""
    nums = [float(m.group(0).replace(",", "")) for m in NUM.finditer(text)]
    return NUM.sub("#", text), nums


def test_readme_perf_block_matches_bench_details():
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import render_readme_perf as rrp

    details_path = os.path.join(REPO, "bench_details.json")
    assert os.path.exists(details_path), (
        "bench_details.json must be committed (run bench.py on the TPU, "
        "then tools/render_readme_perf.py)"
    )
    with open(details_path) as f:
        details = json.load(f)
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()

    assert rrp.BEGIN in readme and rrp.END in readme, (
        "README.md lost its BENCH markers"
    )
    block = readme.split(rrp.BEGIN, 1)[1].split(rrp.END, 1)[0].strip()
    rendered = rrp.render(details).strip()

    got_prose, got_nums = _split(block)
    want_prose, want_nums = _split(rendered)
    assert got_prose == want_prose, (
        "README perf prose was edited by hand — regenerate with "
        "tools/render_readme_perf.py"
    )
    assert len(got_nums) == len(want_nums)
    for got, want in zip(got_nums, want_nums):
        if want == 0:
            assert got == 0
        else:
            assert abs(got - want) / abs(want) <= 0.03, (
                f"README number {got} drifted >3% from bench_details.json "
                f"value {want} — rerun tools/render_readme_perf.py"
            )
