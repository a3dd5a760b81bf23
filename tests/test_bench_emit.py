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
    returned = bench.emit_results(_sample_payload(), repo_root=str(tmp_path))
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 2
    # A tail capture keeps the END of stdout: the final line must parse
    # on its own and carry the driver contract's full field set —
    # INCLUDING the per-query seconds map (r7; the detail-only parts are
    # stages/builds/sf1, all recoverable from BENCH_DETAIL.json).
    headline = json.loads(lines[-1])
    assert headline["metric"] == "headline_queries_total_sec"
    assert headline["value"] == 12.34
    assert headline["unit"] == "sec"
    assert headline["sf"] == 0.1
    assert headline["n_queries"] == 2
    assert headline["queries"] == {"q1_pricing_summary": 1.0, "sim_ivf_topk": 2.0}
    # ...and must stay inside the driver's observed 2000-byte tail with
    # slack for post-JSON shutdown noise.
    assert len(lines[-1]) <= 1000
    # main() re-prints the RETURNED line after spark.stop() so shutdown
    # logs can never follow the final record.
    assert returned == lines[-1]
    # The first line is the full detail record.
    detail = json.loads(lines[0])
    assert detail["queries"] == {"q1_pricing_summary": 1.0, "sim_ivf_topk": 2.0}


def test_headline_drops_query_map_rather_than_overflow(tmp_path, capsys):
    """If the query surface ever grows the headline past the tail
    budget, the per-query map is dropped — the final line must stay
    parseable whole, never truncated mid-JSON."""
    payload = _sample_payload()
    payload["queries"] = {f"very_long_query_name_number_{i:04d}": 1.0 for i in range(60)}
    bench.emit_results(payload, repo_root=str(tmp_path))
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    headline = json.loads(lines[-1])
    assert "queries" not in headline
    assert headline["n_queries"] == 60
    assert len(lines[-1]) <= 1000


def test_real_headline_surface_fits_tail_budget():
    """The ACTUAL headline surface (bench.HEADLINE, not the last
    recorded detail file — a stale BENCH_DETAIL.json must not mask a
    list that grew past the budget) must fit the tail budget with the
    per-query map intact — if a rename/addition pushes it over, this
    trips before the driver's record silently loses the map."""
    names = list(bench.HEADLINE)
    headline = {
        "metric": "headline_queries_total_sec",
        "value": 8888.8888,
        "unit": "sec",
        "sf": 0.1,
        "protocol": "warm1+min2",
        "n_queries": len(names),
        # the real emit path rounds the headline map to 2dp, degrades
        # to 1dp/integers if needed, and drops the detail pointer (r9).
        # Worst case that must fit WITHOUT degradation: dd.dd; the
        # degraded floor that must ALWAYS fit: ddd-second integers.
        # Compact separators mirror emit_results' headline dumps.
        "queries": {n: 88.88 for n in names},
    }
    compact = {"separators": (",", ":")}
    assert len(json.dumps(headline, **compact)) <= 1000
    headline["queries"] = {n: 888 for n in names}
    assert len(json.dumps(headline, **compact)) <= 1000


def test_detail_file_written_atomically(tmp_path, capsys):
    bench.emit_results(_sample_payload(), repo_root=str(tmp_path))
    capsys.readouterr()
    detail_path = tmp_path / "BENCH_DETAIL.json"
    assert detail_path.exists()
    assert not os.path.exists(str(detail_path) + ".tmp")
    on_disk = json.loads(detail_path.read_text())
    assert on_disk["value"] == 12.34
    assert on_disk["protocol"] == "warm1+min2"
