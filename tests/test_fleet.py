"""Fleet orchestration tests against localhost — the reference's pattern of
testing jittens end-to-end with real local subprocesses (SURVEY.md §4.6,
jittens/tests.py:46-74)."""
import json
import os
import time
from pathlib import Path

import pytest

from boardlaw_tpu.fleet import jobs, machines, manage


@pytest.fixture
def fleet_root(tmp_path, monkeypatch):
    monkeypatch.setenv("FLEET_ROOT", str(tmp_path / ".fleet"))
    yield tmp_path


def test_job_registry(fleet_root, tmp_path):
    d = tmp_path / "code"
    d.mkdir()
    (d / "hello.py").write_text("print('hi')")
    name = jobs.submit("python hello.py", dir=d, resources={"devices": 1}, params={"x": 1})
    js = jobs.jobs()
    assert js[name].status == "fresh"
    assert js[name].params == {"x": 1}
    assert Path(js[name].archive).exists()
    jobs.delete(name)
    assert name not in jobs.jobs()


def test_local_end_to_end(fleet_root, tmp_path):
    # a real job: writes its params + device allocation into output/
    d = tmp_path / "code"
    d.mkdir()
    (d / "job.py").write_text(
        "import os, json, pathlib\n"
        "pathlib.Path('output').mkdir(exist_ok=True)\n"
        "with open('output/result.json', 'w') as f:\n"
        "    json.dump({'params': os.environ['FLEET_PARAMS'],"
        " 'devices': os.environ['FLEET_DEVICES']}, f)\n"
    )

    machines.add("box", "local", resources={"devices": 2},
                 workdir=str(tmp_path / "work"))
    name = jobs.submit("python job.py", dir=d, resources={"devices": 1},
                       params={"width": 8})

    js = manage.refresh()
    assert js[name].status == "active"
    assert js[name].allocation["devices"] == [0]

    # wait for it to finish and be marked dead
    for _ in range(50):
        js = manage.refresh()
        if js[name].status == "dead":
            break
        time.sleep(0.2)
    assert js[name].status == "dead"

    target = tmp_path / "fetched"
    manage.fetch(target=str(target))
    result = json.loads((target / "result.json").read_text())
    assert json.loads(result["params"]) == {"width": 8}
    assert result["devices"] == "0"

    manage.cleanup()
    assert name not in jobs.jobs()


def test_allocation_limits(fleet_root, tmp_path):
    d = tmp_path / "code"
    d.mkdir()
    (d / "job.py").write_text("import time; time.sleep(30)")
    machines.add("tiny", "local", resources={"devices": 1},
                 workdir=str(tmp_path / "work"))
    a = jobs.submit("python job.py", dir=d, resources={"devices": 1})
    b = jobs.submit("python job.py", dir=d, resources={"devices": 1})
    js = manage.refresh()
    statuses = sorted(j.status for j in js.values())
    assert statuses == ["active", "fresh"]  # only one device available
    # stop the running job so the test tree doesn't leak processes
    import signal

    for j in js.values():
        if j.status == "active":
            try:
                os.killpg(os.getpgid(j.pid), signal.SIGTERM)
            except ProcessLookupError:
                pass


def test_forbid(fleet_root, tmp_path):
    machines.add("box2", "local", resources={"devices": 1},
                 workdir=str(tmp_path / "work"))
    machines.forbid("box2")
    assert machines.machines() == {}
