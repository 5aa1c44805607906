"""The driver parses bench.py's FINAL stdout line from a 2,000-char tail
capture. Rounds 4 and 6 both shipped `parsed: null` because the line
carried a payload that grows with the headline-query count and crossed
the window. These tests pin the structural fix: the headline line stays
under the window no matter how many queries the registry grows to,
while (round 12, VERDICT r11 item 1) carrying as many per-query medians
as fit a fixed budget plus a declared sidecar for the rest.
"""

from __future__ import annotations

import json

import bench


def _fake_timings(n: int) -> dict[str, float]:
    # Worst-case realistic key length (longest current id is 31 chars)
    # and 4-digit-second timings.
    return {f"some_quite_long_query_name_{i:04d}": 123.456 for i in range(n)}


def test_headline_line_bounded_at_500_queries():
    line = bench.headline_line(9999.999, "0.1", 12345678, _fake_timings(500))
    assert len(line) < 1900
    parsed = json.loads(line)
    assert parsed["n_queries"] == 500
    assert parsed["value"] == 9999.999
    assert len(parsed["slowest5"]) == 5
    # per-query payload is capped, the rest declared omitted + reachable
    # via the sidecar pointer
    assert parsed["per_query_file"] == "BENCH_QUERIES.json"
    assert len(parsed["queries"]) + parsed["queries_omitted"] == 500
    assert parsed["queries_omitted"] > 0


def test_headline_line_survives_tail_capture():
    # Simulate the driver: stdout ends with the headline line; only the
    # last 2,000 chars are captured. The full line must be inside.
    line = bench.headline_line(45.889, "0.1", 138313, _fake_timings(62))
    stdout = "lots of earlier spark log noise\n" * 200 + line + "\n"
    tail = stdout[-2000:]
    # the complete line must appear intact in the tail
    assert line in tail
    json.loads(tail.strip().splitlines()[-1])


def test_headline_line_has_required_driver_fields():
    parsed = json.loads(bench.headline_line(1.0, "0.01", 10, _fake_timings(3)))
    for key in ("metric", "value", "unit", "sf", "queries"):
        assert key in parsed
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.01


def test_headline_line_small_registry_carries_all_queries():
    # fewer than 5 queries → slowest5 just has what exists, and every
    # query fits the per-query budget
    parsed = json.loads(bench.headline_line(0.5, "0.001", 1, _fake_timings(2)))
    assert len(parsed["slowest5"]) == 2
    assert len(parsed["queries"]) == 2
    assert parsed["queries_omitted"] == 0


def test_headline_line_queries_are_slowest_first():
    # the inclusion rule is deterministic: strictly the slowest N that
    # fit; a query in `queries` is never slower-ranked than one omitted
    timings = {f"q_{i:03d}": float(i) for i in range(120)}
    parsed = json.loads(bench.headline_line(1.0, "0.1", 10, timings))
    included = {timings[q] for q in parsed["queries"]}
    omitted = {t for q, t in timings.items() if q not in parsed["queries"]}
    assert parsed["queries_omitted"] == len(omitted)
    if included and omitted:
        assert min(included) >= max(omitted)
