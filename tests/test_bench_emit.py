"""Pin bench.py's truncation-proof output contract (VERDICT r06 #1).

The driver captures a bounded TAIL of bench.py's stdout, so the LAST
non-empty line must be a short, standalone-parseable JSON headline.
BENCH_r05 and BENCH_r06 both arrived ``parsed: null`` because the
headline printed first — exactly the part a tail capture cuts. These
tests exercise ``emit_results`` directly (no Spark needed) so the
ordering can never silently invert again.
"""

from __future__ import annotations

import json
import os

import bench


def _sample_payload() -> dict:
    return {
        "metric": "headline_queries_total_sec",
        "value": 12.34,
        "unit": "sec",
        "protocol": "warm1+min2",
        "queries": {"q1_pricing_summary": 1.0, "sim_ivf_topk": 2.0},
        "stages": {},
        "builds": {},
        "sf": 0.1,
    }


def test_headline_is_last_stdout_line_and_parses_alone(tmp_path, capsys):
    bench.emit_results(_sample_payload(), repo_root=str(tmp_path))
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 2
    # A tail capture keeps the END of stdout: the final line must parse
    # on its own and carry the driver's headline fields.
    headline = json.loads(lines[-1])
    assert headline["metric"] == "headline_queries_total_sec"
    assert headline["value"] == 12.34
    assert headline["unit"] == "sec"
    assert headline["sf"] == 0.1
    assert headline["n_queries"] == 2
    # ...and must be SHORT — short enough that any sane bounded tail
    # (driver keeps >= ~1 KiB) includes it whole.
    assert len(lines[-1]) < 512
    # The first line is the full detail record.
    detail = json.loads(lines[0])
    assert detail["queries"] == {"q1_pricing_summary": 1.0, "sim_ivf_topk": 2.0}


def test_detail_file_written_atomically(tmp_path, capsys):
    bench.emit_results(_sample_payload(), repo_root=str(tmp_path))
    capsys.readouterr()
    detail_path = tmp_path / "BENCH_DETAIL.json"
    assert detail_path.exists()
    assert not os.path.exists(str(detail_path) + ".tmp")
    on_disk = json.loads(detail_path.read_text())
    assert on_disk["value"] == 12.34
    assert on_disk["protocol"] == "warm1+min2"
