"""The official bench's main() flow, with the measurement stubbed out.

The driver captures `python bench.py`'s single stdout JSON line as the
round's official perf artifact (BENCH_r{N}.json); round 3's artifact was
lost to an unguarded backend probe. The hardening lives in
utils/backend.py (tested in test_backend_check.py); this covers the rest
of main(): the JSON contract, the vs_baseline anchor lookup
(benchmarks/anchors.json) and the provenance append
(benchmarks/bench_history.jsonl) — so a refactor cannot silently break
the artifact format again.
"""

import json

import bench


def test_main_emits_contract_json_and_history(monkeypatch, capsys, tmp_path):
    hist = tmp_path / "hist.jsonl"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(hist))
    monkeypatch.setattr(bench, "_ensure_backend", lambda: None)
    monkeypatch.setattr(bench, "measure_throughput", lambda solver: 4.2345)

    bench.main()

    line = capsys.readouterr().out.strip()
    result = json.loads(line)  # exactly one JSON object on stdout
    assert result["metric"] == "maxstyle_train_steps_per_sec_per_chip"
    assert result["value"] == 4.234  # rounded to 3 decimals
    assert "steps/s" in result["unit"]
    # anchors.json ships in-repo -> the ratio must be computed, not null
    with open(bench.ANCHORS_PATH) as f:
        ref = json.load(f)["ref_cpu_steps_per_sec"]
    assert result["vs_baseline"] == round(4.2345 / ref, 1)

    rec = json.loads(hist.read_text().strip())
    assert rec["value"] == result["value"]
    assert rec["ts"] > 0 and "backend" in rec


def test_ensure_backend_reraises_with_history_context(monkeypatch, capsys,
                                                      tmp_path):
    """A dead tunnel must still fail the bench (no CPU number), but the
    stderr should carry the last captured measurement as context."""
    import pytest

    from maxstyle_tpu.utils import backend as B

    hist = tmp_path / "hist.jsonl"
    hist.write_text('{"value": 4.17, "ts": 1}\n')
    monkeypatch.setattr(bench, "HISTORY_PATH", str(hist))

    def down(**kw):
        raise RuntimeError("environment failure (TPU tunnel)")
    monkeypatch.setattr(B, "wait_for_backend", down)

    with pytest.raises(RuntimeError, match="environment failure"):
        bench._ensure_backend()
    err = capsys.readouterr().err
    assert "last captured measurement" in err and "4.17" in err


def test_main_survives_missing_anchors_and_history(monkeypatch, capsys):
    monkeypatch.setattr(bench, "ANCHORS_PATH", "/nonexistent/anchors.json")
    monkeypatch.setattr(bench, "HISTORY_PATH", "/nonexistent/dir/h.jsonl")
    monkeypatch.setattr(bench, "_ensure_backend", lambda: None)
    monkeypatch.setattr(bench, "measure_throughput", lambda solver: 1.0)

    bench.main()  # must not raise: artifact > provenance

    result = json.loads(capsys.readouterr().out.strip())
    assert result["value"] == 1.0
    assert result["vs_baseline"] is None
