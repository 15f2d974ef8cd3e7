"""SSH machine plugin end-to-end — the reference tests jittens' ssh path
against localhost:22 (cloud/jittens/tests.py:78-115). This container ships no
sshd/ssh binaries, so the transport is replaced by local shims (`ssh host
cmd` runs cmd in bash, `scp`/`rsync` copy locally) while the Machine's OWN
logic — tar upload, bash-wrapped nohup launch echoing the PID, `ps` liveness
polling, rsync fetch, cleanup — runs unmodified."""
import json
import os
import stat
import time
from pathlib import Path

import pytest

from boardlaw_tpu.fleet import jobs, machines, manage

SSH_SHIM = """#!/usr/bin/env python3
import subprocess, sys
# argv: ssh [args...] host cmd  -- our Machine always passes (host, cmd)
host, cmd = sys.argv[-2], sys.argv[-1]
r = subprocess.run(["bash", "-c", cmd], capture_output=True, text=True)
sys.stdout.write(r.stdout)
sys.stderr.write(r.stderr)
sys.exit(r.returncode)
"""

SCP_SHIM = """#!/usr/bin/env python3
import shutil, sys
src, dst = sys.argv[-2], sys.argv[-1]
dst = dst.split(":", 1)[1] if ":" in dst else dst
src = src.split(":", 1)[1] if ":" in src else src
shutil.copy(src, dst)
"""

RSYNC_SHIM = """#!/usr/bin/env python3
import os, shutil, sys
args = [a for a in sys.argv[1:] if not a.startswith("-")]
args = [a for a in args if a not in ("ssh",)]
src, dst = args[-2], args[-1]
src = src.split(":", 1)[1] if ":" in src else src
if os.path.isdir(src):
    shutil.copytree(src, dst, dirs_exist_ok=True)
"""


@pytest.fixture
def fleet_root(tmp_path, monkeypatch):
    monkeypatch.setenv("FLEET_ROOT", str(tmp_path / ".fleet"))
    yield tmp_path


@pytest.fixture
def fake_transport(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, body in [("ssh", SSH_SHIM), ("scp", SCP_SHIM), ("rsync", RSYNC_SHIM)]:
        p = bindir / name
        p.write_text(body)
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    yield bindir


def test_ssh_machine_end_to_end(fleet_root, fake_transport, tmp_path):
    d = tmp_path / "code"
    d.mkdir()
    (d / "job.py").write_text(
        "import os, json, pathlib, time\n"
        "pathlib.Path('output').mkdir(exist_ok=True)\n"
        "with open('output/result.json', 'w') as f:\n"
        "    json.dump({'params': os.environ['FLEET_PARAMS'],"
        " 'devices': os.environ['FLEET_DEVICES']}, f)\n"
    )

    workdir = tmp_path / "remote-work"
    workdir.mkdir()
    machines.add(
        "farbox", "ssh", resources={"devices": 1},
        host="testhost", workdir=str(workdir),
    )
    name = jobs.submit(
        "python job.py", dir=d, resources={"devices": 1}, params={"depth": 2}
    )

    js = manage.refresh()
    assert js[name].status == "active"
    assert js[name].machine == "farbox"
    assert js[name].pid > 0

    # the remote job ran under the fake transport; poll PID liveness until
    # the scheduler marks it dead (reference tests.py:102-110)
    for _ in range(100):
        js = manage.refresh()
        if js[name].status == "dead":
            break
        time.sleep(0.2)
    assert js[name].status == "dead"

    # rsync fetch pulls output back
    target = tmp_path / "fetched"
    manage.fetch(target=str(target))
    result = json.loads((target / "result.json").read_text())
    assert json.loads(result["params"]) == {"depth": 2}
    assert result["devices"] == "0"

    # tail reads the remote log; cleanup removes the payload
    manage.cleanup()
    assert name not in jobs.jobs()
    assert not (workdir / name).exists()
