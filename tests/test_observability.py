"""Structured logging + failure-detection selfchecks (SURVEY §5 rows:
metrics/observability "structured per-host logging", failure detection
"deterministic re-run per tile")."""

import io
import json

import numpy as np
import pytest

import raymarching_tpu as rt
from raymarching_tpu.utils import structlog
from raymarching_tpu.utils.selfcheck import (assert_healthy, oracle_check,
                                             rerun_check)

CFG = rt.RenderConfig(width=96, height=72, ssaa=1, iterations=200)


@pytest.fixture()
def demo():
    scene = rt.load_scene("scenes/demo.txt")
    return rt.compile_scene(scene)


@pytest.fixture()
def log_stream():
    stream = io.StringIO()
    structlog.configure(stream=stream)
    yield stream
    structlog._default = None


class TestStructLog:
    def test_events_are_json_lines_with_provenance(self, log_stream):
        log = structlog.get_logger()
        log.log("render", backend="jnp", seconds=1.25)
        structlog.emit("done", out="x.png")
        lines = [json.loads(l) for l in log_stream.getvalue().splitlines()]
        assert len(lines) == 2
        for rec in lines:
            # per-host provenance on EVERY record: mergeable across hosts
            assert {"ts", "host", "pid", "process", "event"} <= set(rec)
        assert lines[0]["event"] == "render"
        assert lines[0]["seconds"] == 1.25
        assert lines[1]["out"] == "x.png"
        assert lines[0]["process"] == 0   # single-process run

    def test_span_records_seconds_and_throughput(self, log_stream):
        with structlog.get_logger().span("phase", rays=1000, backend="jnp"):
            pass
        rec = json.loads(log_stream.getvalue())
        assert rec["event"] == "phase"
        assert rec["seconds"] >= 0
        assert rec["mrays_per_s"] > 0

    def test_emit_is_noop_when_unconfigured(self):
        structlog._default = None
        structlog.emit("anything", x=1)   # must not raise

    def test_file_logger_appends(self, tmp_path):
        path = tmp_path / "events.jsonl"
        log = structlog.StructuredLogger(path=str(path))
        log.log("a")
        log.close()
        log = structlog.StructuredLogger(path=str(path))
        log.log("b")
        log.close()
        events = [json.loads(l)["event"] for l in path.read_text().splitlines()]
        assert events == ["a", "b"]


class TestSelfcheck:
    @pytest.mark.slow
    def test_rerun_check_passes_on_healthy_device(self, demo, log_stream):
        plan, tables = demo
        report = rerun_check(plan, tables, CFG, backend="jnp", repeats=3)
        assert report["ok"] and report["mismatches"] == []
        # the check itself reports through the structured log
        rec = json.loads(log_stream.getvalue())
        assert rec["event"] == "selfcheck" and rec["check"] == "rerun"

    def test_rerun_check_localizes_injected_corruption(self, demo):
        plan, tables = demo
        from raymarching_tpu.api import render_tables
        base = np.asarray(render_tables(plan, tables, CFG, backend="jnp"))
        flipped = base.copy()
        flipped[40, 70, 1] += 1e-3          # one flipped value, one tile
        imgs = iter([base, flipped])

        import raymarching_tpu.utils.selfcheck as sc
        tiles = sc._tile_mismatches(base, flipped, (64, 64))
        assert tiles == [(0, 64, 1)]        # localized to the owning tile

        # end-to-end via a monkeypatched renderer
        real = sc.rerun_check
        import raymarching_tpu.api as api
        orig = api.render_tables
        try:
            api.render_tables = lambda *a, **k: next(imgs)
            report = real(plan, tables, CFG, backend="jnp")
        finally:
            api.render_tables = orig
        assert not report["ok"]
        assert report["mismatches"][0]["tiles"] == [(0, 64, 1)]

    def test_oracle_check_passes_and_detects_wrong_function(self, demo):
        plan, tables = demo
        report = oracle_check(plan, tables, CFG, backend="jnp")
        assert report["ok"] and report["bad_pixel_frac"] == 0.0

        # a consistently-wrong device: rerun can't see it, oracle must
        import raymarching_tpu.api as api
        import raymarching_tpu.utils.selfcheck as sc
        orig = api.render_tables

        def corrupted(plan_, tables_, cfg_, *, backend="auto", **kw):
            img = orig(plan_, tables_, cfg_, backend=backend, **kw)
            if backend != "jnp":
                img = img + 0.1
            return img

        try:
            api.render_tables = corrupted
            bad = sc.oracle_check(plan, tables, CFG, backend="ref")
        finally:
            api.render_tables = orig
        assert not bad["ok"]

    def test_assert_healthy_roundtrip(self, demo):
        plan, tables = demo
        report = assert_healthy(plan, tables, CFG, backend="jnp")
        assert report["ok"]


class TestPhaseTruthfulTiming:
    """utils.timing.Phase: on a tunneled platform a throughput phase that
    never host-fetched its result must raise, not print a fake rate."""

    def test_unsync_throughput_phase_raises_on_tunnel(self, monkeypatch):
        from raymarching_tpu.utils import timing
        monkeypatch.setattr(timing, "_on_tunneled_platform", lambda: True)
        with pytest.raises(RuntimeError, match="never"):
            with timing.Phase("render", rays=1000, verbose=False):
                pass

    def test_synced_phase_passes_on_tunnel(self, monkeypatch):
        from raymarching_tpu.utils import timing
        monkeypatch.setattr(timing, "_on_tunneled_platform", lambda: True)
        with timing.Phase("render", rays=1000, verbose=False) as ph:
            out = ph.sync(np.zeros(3))
        assert isinstance(out, np.ndarray)
        assert ph.seconds >= 0

    def test_no_rays_phase_needs_no_sync(self, monkeypatch):
        from raymarching_tpu.utils import timing
        monkeypatch.setattr(timing, "_on_tunneled_platform", lambda: True)
        with timing.Phase("scene load", verbose=False):
            pass

    def test_exception_propagates_unmasked(self, monkeypatch):
        from raymarching_tpu.utils import timing
        monkeypatch.setattr(timing, "_on_tunneled_platform", lambda: True)
        with pytest.raises(ValueError):
            with timing.Phase("render", rays=1000, verbose=False):
                raise ValueError("original error")

    def test_untunneled_platform_is_lenient(self, monkeypatch):
        from raymarching_tpu.utils import timing
        monkeypatch.setattr(timing, "_on_tunneled_platform", lambda: False)
        with timing.Phase("render", rays=1000, verbose=False):
            pass


class TestCLIIntegration:
    @pytest.mark.slow
    def test_log_json_and_selfcheck_flags(self, tmp_path):
        from raymarching_tpu.cli import main
        out = tmp_path / "out.png"
        logp = tmp_path / "log.jsonl"
        rc = main(["--scene", "scenes/demo.txt", "--out", str(out),
                   "--width", "64", "--height", "48", "--ssaa", "1",
                   "--iterations", "150", "--backend", "jnp",
                   "--log-json", str(logp), "--selfcheck"])
        assert rc == 0 and out.exists()
        events = [json.loads(l) for l in logp.read_text().splitlines()]
        names = [e["event"] for e in events]
        assert names[0] == "start" and names[-1] == "done"
        assert "scene" in names and "render" in names
        assert names.count("selfcheck") == 2   # rerun + oracle
        render = next(e for e in events if e["event"] == "render")
        assert render["mrays_per_s"] > 0
        structlog._default = None
