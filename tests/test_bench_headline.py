"""The bench headline must stay compact (the driver parses only the LAST
stdout line within a bounded tail window — VERDICT r4 item 1) and must
surface the SLO-relevant serving numbers: max sustainable lambda plus the
p95 TTFA measured AT that lambda (the 1.0x-capacity p95 diverges by
construction, rho=1)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.fast


def _fake_result():
    return {
        "metric": "streaming_rtf", "value": 0.13, "unit": "ratio",
        "vs_baseline": 2.15, "latency_ms_median": 90.0,
        "latency_ms_p95": 98.0, "latency_ms_max": 101.0, "rtf_p95": 0.14,
        "ar_tokens_per_sec": 240.0,
        "batch_scaling": {"16": {"rtf_aggregate": 0.08,
                                 "rtf_per_stream": 1.28}},
        "max_realtime_streams": 8,
        "serving": {
            "pool_per_stream_rtf": 0.56, "realtime_streams": 16,
            "max_sustainable_lambda_ttfa500ms": 6.914,
            "poisson": [
                {"capacity_factor": 0.5625, "lambda": 6.914,
                 "ttfa_ms_p95": 247.2},
                {"capacity_factor": 1.0, "lambda": 12.291,
                 "ttfa_ms_p95": 1756.0},
            ],
        },
        "int8": {
            "rtf_median": 0.111,
            "int8_fp8_batch_scaling": {"16": {"rtf_per_stream": 0.83}},
            "int8_fp8_serving": {"max_sustainable_lambda_ttfa500ms": 6.253},
        },
        "tunnel_rtt_ms": {"median": 29.0, "p95": 31.0, "max": 32.0},
        "warmup_s": 20.0, "dtype": "bfloat16", "device": "TPU v5 lite0",
    }


def test_headline_compact_and_slo_fields():
    from bench import build_headline

    head = build_headline(_fake_result())
    line = json.dumps(head)
    # must survive the driver's tail capture with a wide margin
    assert len(line) < 1500, len(line)
    assert json.loads(line)["metric"] == "streaming_rtf"
    s = head["serving"]
    assert s["max_sustainable_lambda_ttfa500ms"] == 6.914
    # p95 AT the max sustainable rate (the SLO-passing evidence), and the
    # at-capacity p95 alongside for the divergence context
    assert s["ttfa_ms_p95_at_max_lambda"] == 247.2
    assert s["ttfa_ms_p95_at_capacity"] == 1756.0
    assert head["int8"]["int8_fp8_max_lambda_ttfa500ms"] == 6.253
    assert head["b16_rtf_per_stream"] == 1.28


def test_headline_degrades_without_sections():
    from bench import build_headline

    r = _fake_result()
    r["serving"] = None
    r["int8"] = None
    r["batch_scaling"] = None
    head = build_headline(r)
    assert head["serving"] is None and head["int8"] is None
    assert head["b16_rtf_per_stream"] is None
    json.dumps(head)  # still serializable

    # sweep that never found a sustainable rate: field present, null, and
    # no at-max row invented
    r2 = _fake_result()
    r2["serving"]["max_sustainable_lambda_ttfa500ms"] = None
    head2 = build_headline(r2)
    assert head2["serving"]["max_sustainable_lambda_ttfa500ms"] is None
    assert "ttfa_ms_p95_at_max_lambda" not in head2["serving"]


def test_committed_detail_record_builds_headline():
    """The committed BENCH_DETAIL.json (the last full TPU record) must
    round-trip through build_headline — guards the record schema and the
    headline builder against drifting apart."""
    from bench import build_headline

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAIL.json")
    if not os.path.exists(path):
        pytest.skip("no committed detail record")
    detail = json.load(open(path))
    head = build_headline(detail)
    assert len(json.dumps(head)) < 1500
    assert head["value"] == detail["value"]
