"""bench.py artifact-landing contract (VERDICT r2 weak #1).

Round 2 produced NO bench artifact because the single JSON line printed
only after every stage finished and the relay wait was unbounded in
practice. These tests pin the parent-side logic (no jax import, no
devices): the payload is parseable with zero stages, degrades field-by-
field, and the relay wait short-circuits when no relay is configured.
"""
import importlib.util
import json
import os
import sys
import time

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _payload(results, **kw):
    base = dict(fit_np=1.0, pps_np=1000.0, waited=0.0, cpu=True,
                failed=[], skipped=[])
    base.update(kw)
    return bench._payload(results, **base)


def test_payload_with_no_stages_is_valid_json():
    p = _payload({})
    s = json.dumps(p)
    back = json.loads(s)
    assert back["value"] == 0.0
    assert back["vs_baseline"] == 0.0
    assert back["metric"].startswith("posterior_predict")
    assert back["tpu"] is False


def test_payload_accumulates_stage_by_stage():
    p0 = _payload({})
    p1 = _payload({"core": {"predict_points_per_s": 5000.0,
                            "fit_seconds": 0.5, "device": "FakeTPU"}})
    assert p0["fit_seconds_n4096"] is None
    assert p1["fit_seconds_n4096"] == 0.5
    assert p1["value"] == 5000.0
    assert p1["vs_baseline"] == 5.0
    assert p1["device"] == "FakeTPU"
    p2 = _payload({"roofline": {"n": 16384, "cholesky_blocked": {
        "tflops": 14.0, "pct_of_fp32_roof": 43.0}}})
    assert p2["cholesky_tflops"] == 14.0
    assert p2["cholesky_pct_fp32_roof"] == 43.0
    assert p2["roofline_n"] == 16384


def test_payload_without_numpy_baseline():
    p = _payload({"core": {"predict_points_per_s": 5000.0}},
                 fit_np=None, pps_np=None)
    assert p["vs_baseline"] == 0.0
    assert p["numpy_baseline_points_per_s"] is None


def test_relay_wait_short_circuits_without_relay_env(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    t0 = time.monotonic()
    alive, waited = bench._wait_for_relay(time.monotonic() + 3600.0)
    assert not alive and waited == 0.0
    assert time.monotonic() - t0 < 1.0


def test_stage_failure_keeps_payload_parseable():
    p = _payload({}, failed=["core"], skipped=["fit16k"])
    back = json.loads(json.dumps(p))
    assert back["stages_failed"] == ["core"]
    assert back["stages_skipped"] == ["fit16k"]


def test_stage_cache_round_trip(tmp_path, monkeypatch):
    """Round-4 contract: a successful stage persists under a BACKEND-
    qualified key (a CPU-fallback run must not clobber the cached TPU
    result — code-review r4 finding #1), and legacy bare-name entries
    migrate on load."""
    monkeypatch.setattr(bench, "CACHE_PATH", str(tmp_path / "cache.json"))
    cache = bench._cache_load()
    assert cache == {}
    bench._cache_store(cache, "core", {"predict_points_per_s": 7.0}, tpu=True)
    # a CPU result for the same stage coexists instead of overwriting
    bench._cache_store(cache, "core", {"predict_points_per_s": 1.0}, tpu=False)
    c2 = bench._cache_load()
    assert c2["tpu:core"]["result"]["predict_points_per_s"] == 7.0
    assert c2["cpu:core"]["result"]["predict_points_per_s"] == 1.0
    assert c2["tpu:core"]["tpu"] is True and "ts" in c2["tpu:core"]
    # legacy (pre backend-keying) entries migrate by their stored tpu flag
    import json as _json
    (tmp_path / "cache.json").write_text(_json.dumps(
        {"hmc": {"result": {"x": 2}, "tpu": True, "ts": 1}}))
    c3 = bench._cache_load()
    assert c3["tpu:hmc"]["result"]["x"] == 2 and "hmc" not in c3


def test_cache_load_tolerates_corrupt_file(tmp_path, monkeypatch):
    path = tmp_path / "cache.json"
    path.write_text("{not json")
    monkeypatch.setattr(bench, "CACHE_PATH", str(path))
    assert bench._cache_load() == {}


def test_payload_reports_cached_stages_and_error_tails():
    p = _payload({"core": {"predict_points_per_s": 5000.0}},
                 failed=["hmc"], cached=["core"],
                 errors={"hmc": "rc=1: OOM"})
    back = json.loads(json.dumps(p))
    assert back["stages_cached"] == ["core"]
    assert back["stage_errors"]["hmc"] == "rc=1: OOM"
    assert back["value"] == 5000.0


def test_run_stage_returns_error_tail_on_bad_stage():
    """A crashing stage child must surface its stderr tail, not just None."""
    out, err = bench._run_stage("no_such_stage", cpu=True, timeout_s=60.0)
    assert out is None
    assert err is not None and "rc=" in err
