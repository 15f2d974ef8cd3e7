"""Live HTML dashboard (pavlov/dashboard.py) — the zero-dependency analogue
of the reference's Bokeh live charts (pavlov/stats/plotting.py) and widget
compositor (pavlov/widgets.py)."""
import logging
import urllib.request

import numpy as np

import datetime

from boardlaw_tpu.pavlov import dashboard, logs, runs, stats
from boardlaw_tpu.pavlov.tests import mock_dir, mock_time, set_time


def _seed_run():
    run = runs.new_run()
    t0 = datetime.datetime(2020, 1, 1)
    with stats.to_run(run), mock_time(t0):
        for i in range(5):
            set_time(t0 + datetime.timedelta(seconds=61 * (i + 1)))
            stats.mean("loss.policy", 3.0 - 0.5 * i)
            stats.mean_std("elo.mohex", -2.0 + 0.3 * i, 0.2)
            stats.rate("sample-rate", 1000)
            stats.quantiles("q.values", np.array([0.1, 0.5, 0.9]))
    with logs.to_run(run):
        logging.getLogger("demo").info("dashboard log line")
    return run


def test_render_groups_channels_and_logs():
    with mock_dir():
        run = _seed_run()
        page = dashboard.render(run, rule="60s")
        # channel groups become sections; each chart is single-series
        assert "loss" in page and "loss.policy" in page
        assert "elo.mohex" in page  # mean_std -> one mu line + band
        assert "q.values (q1)" in page  # multi-column -> chart per column
        assert page.count("<polyline") >= 4
        assert "polygon" in page  # ±sigma band on the mean_std chart
        assert "dashboard log line" in page
        assert "http-equiv='refresh'" in page


def test_render_empty_run():
    with mock_dir():
        run = runs.new_run()
        page = dashboard.render(run)
        assert "<h1>" in page  # renders without stats or logs


def test_write_registers_file():
    with mock_dir():
        run = _seed_run()
        path = dashboard.write(run)
        text = open(path).read()
        assert "loss.policy" in text
        from boardlaw_tpu.pavlov import files
        assert "dashboard.html" in files.glob(run, "dashboard.html")


def test_serve_live():
    with mock_dir():
        run = _seed_run()
        server = dashboard.serve(run)
        try:
            port = server.server_address[1]
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=10).read().decode()
            assert "loss.policy" in page

            # the page re-renders per request: new stats appear on refetch
            with stats.to_run(run):
                stats.mean("loss.fresh", 1.0)
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=10).read().decode()
            assert "loss.fresh" in page
        finally:
            server.shutdown()
