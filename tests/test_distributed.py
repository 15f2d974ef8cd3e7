"""Multi-process data parallelism without a real cluster: two host processes
x 4 virtual CPU devices each, connected by `jax.distributed` (gloo
collectives), launched through the `fleet` scheduler exactly like production
workers — the reference's pattern of testing jittens against localhost
(cloud/jittens/tests.py:46-115) applied to the in-program DP path the
reference never had (SURVEY.md §2.2)."""
import json
import os
import socket
import time
from pathlib import Path

import pytest

from boardlaw_tpu.fleet import jobs, machines, manage

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, os, sys
sys.path.insert(0, {repo!r})
params = json.loads(os.environ["FLEET_PARAMS"])
from boardlaw_tpu.parallel import distributed
distributed.initialize(
    coordinator=params["coord"],
    num_processes=params["n"],
    process_id=params["rank"],
    local_device_count=4,
    platform="cpu",
)
out = distributed.worker_demo()
import pathlib
pathlib.Path("output").mkdir(exist_ok=True)
with open("output/result-%d.json" % params["rank"], "w") as f:
    json.dump(out, f)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture
def fleet_root(tmp_path, monkeypatch):
    monkeypatch.setenv("FLEET_ROOT", str(tmp_path / ".fleet"))
    yield tmp_path


def test_fleet_launched_multiprocess_dp(fleet_root, tmp_path):
    d = tmp_path / "code"
    d.mkdir()
    (d / "worker.py").write_text(WORKER.format(repo=REPO))

    machines.add(
        "box", "local", resources={"devices": 2}, workdir=str(tmp_path / "work")
    )
    coord = f"localhost:{_free_port()}"
    for rank in range(2):
        jobs.submit(
            "python worker.py",
            dir=d,
            resources={"devices": 1},
            params={"coord": coord, "n": 2, "rank": rank},
            name=f"dpworker-{rank}",
        )

    js = manage.refresh()
    assert all(j.status == "active" for j in js.values()), manage.tails()

    # the tiny sharded train program compiles through the remote hook; give
    # the pair a generous window
    deadline = time.time() + 600
    while time.time() < deadline:
        js = manage.refresh()
        if all(j.status == "dead" for j in js.values()):
            break
        time.sleep(2)
    assert all(j.status == "dead" for j in js.values()), manage.tails(60)

    target = tmp_path / "fetched"
    manage.fetch(target=str(target))
    results = [
        json.loads((target / f"result-{rank}.json").read_text()) for rank in range(2)
    ]
    assert {r["process"] for r in results} == {0, 1}
    assert all(r["n_processes"] == 2 and r["n_devices"] == 8 for r in results)
    # GSPMD over the 2-process mesh: both ranks see the identical global loss
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert all(r["step"] == 1 for r in results)

    manage.cleanup()
