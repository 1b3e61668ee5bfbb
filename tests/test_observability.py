"""Observability utilities (utils/observability.py) — reference analogs:
kmer-cnt logger.h / memory_info.h, f5c phase report meth_main.c:617-676."""

import io
import time

from genomicsbench_tpu.utils.observability import (
    Logger, PhaseTimer, ProgressPercent, peak_rss, roi,
)


def test_logger_levels_and_file(tmp_path):
    buf = io.StringIO()
    log = Logger(level="info", logfile=str(tmp_path / "x.log"), stream=buf)
    log.debug("hidden")
    log.info("shown")
    log.error("bad")
    out = buf.getvalue()
    assert "hidden" not in out and "shown" in out and "[ERROR" in out
    assert "shown" in (tmp_path / "x.log").read_text()


def test_phase_timer_report():
    t = PhaseTimer()
    with t.phase("align"):
        time.sleep(0.02)
    with t.phase("events"):
        time.sleep(0.005)
    with t.phase("align"):
        pass
    buf = io.StringIO()
    rep = t.report(buf)
    assert "dominant phase: align" in rep and "(x2)" in rep


def test_roi_and_peak_rss():
    with roi("test-kernel"):
        x = sum(range(1000))
    assert x == 499500
    assert peak_rss() > 1 << 20


def test_progress():
    buf = io.StringIO()
    p = ProgressPercent(4, stream=buf)
    for _ in range(4):
        p.advance()
    assert "100%" in buf.getvalue()
