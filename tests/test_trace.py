"""Structured tracing subsystem (porla_tpu/utils/trace.py) — replaces the
reference's ad-hoc chrono timers (SURVEY.md §5)."""

import json

from porla_tpu.utils import trace


def setup_function(_):
    trace.reset()
    trace.enable(True)


def teardown_function(_):
    trace.enable(False)
    trace.reset()


def test_nested_spans_and_summary():
    with trace.span("outer", n=4):
        with trace.span("inner"):
            pass
        with trace.span("inner"):
            pass
    s = trace.summary()
    assert s["outer"]["calls"] == 1
    assert s["outer/inner"]["calls"] == 2
    assert s["outer"]["total_s"] >= s["outer/inner"]["total_s"]


def test_counters_attach_to_current_path():
    with trace.span("op"):
        trace.count("bytes", 10)
        trace.count("bytes", 5)
    trace.count("bytes", 1)  # top level
    s = trace.summary()
    assert s["op/bytes"]["count"] == 15
    assert s["bytes"]["count"] == 1


def test_disabled_is_noop():
    trace.enable(False)
    with trace.span("x"):
        trace.count("c")
    assert trace.summary() == {}


def test_jsonl_dump(tmp_path):
    with trace.span("a", k="v"):
        pass
    out = tmp_path / "t.jsonl"
    trace.dump_jsonl(str(out))
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert lines[0]["name"] == "a" and lines[0]["attrs"] == {"k": "v"}
    assert "summary" in lines[-1]


def test_protocol_emits_spans():
    """A tiny n=4 IPA flow emits the expected span tree."""
    from porla_tpu.config import PorlaConfig
    from porla_tpu.protocol.client import PorlaClient
    from porla_tpu.protocol.server import PorlaServer
    from porla_tpu.protocol.transport import InProcTransport
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        cfg = PorlaConfig(storage_dir=d)
        server = PorlaServer(cfg)
        client = PorlaClient(cfg, InProcTransport(server))
        client.initialize(4)
        client.update(1)
        client.audit()
    s = trace.summary()
    assert s["client.initialize"]["calls"] == 1
    assert s["client.update"]["calls"] == 1
    assert s["client.update/server.update/server.hadd"]["calls"] == 1
    assert s["client.audit/server.audit/server.audit.gather"]["calls"] == 1
    assert any(k.endswith("transport.round_trips") for k in s)
