"""Local machine plugin: jobs run as subprocesses on this host.

Reference counterpart: jittens/local.py — Popen with FLEET_* env injection,
psutil PID liveness, direct file-copy fetch (:19-77).
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import tarfile
from pathlib import Path

import psutil

from . import jobs


class Machine:
    def __init__(self, spec):
        self.spec = spec
        self.name = spec.name
        self.resources = spec.resources
        self.workdir = Path(spec.config.get("workdir", jobs.root() / "local"))

    def launch(self, job, allocation):
        d = self.workdir / job.name
        d.mkdir(parents=True, exist_ok=True)
        with tarfile.open(job.archive) as tar:
            tar.extractall(d)

        env = dict(os.environ)
        env["FLEET_NAME"] = job.name
        env["FLEET_PARAMS"] = json.dumps(job.params)
        env["FLEET_DEVICES"] = ",".join(str(x) for x in allocation.get("devices", []))

        with open(d / "fleet-out.log", "w") as out:
            p = subprocess.Popen(
                job.command,
                shell=True,
                cwd=d,
                env=env,
                stdout=out,
                stderr=subprocess.STDOUT,
                start_new_session=True,
            )
        return p.pid

    def alive(self, job):
        try:
            p = psutil.Process(job.pid)
            return p.is_running() and p.status() != psutil.STATUS_ZOMBIE
        except psutil.NoSuchProcess:
            return False

    def fetch(self, job, target="output"):
        """Copy the job's output dir back (reference local.py:61-77)."""
        src = self.workdir / job.name / "output"
        if not src.exists():
            return
        dst = Path(target)
        dst.mkdir(parents=True, exist_ok=True)
        shutil.copytree(src, dst, dirs_exist_ok=True)

    def cleanup(self, job):
        d = self.workdir / job.name
        if d.exists():
            shutil.rmtree(d)

    def tail(self, job, n=20):
        p = self.workdir / job.name / "fleet-out.log"
        if not p.exists():
            return ""
        return "".join(p.read_text().splitlines(keepends=True)[-n:])
