"""Machine registry: `.fleet/machines/*.json` plugin-loaded machine specs.

Reference counterpart: jittens/machines.py — each config names a `type`
selecting its plugin module; resources are named pools (here: device
counts). Machines can be `forbid`den to drain them (:66-70).
"""
from __future__ import annotations

import importlib
import json
from dataclasses import dataclass, field
from pathlib import Path

from . import jobs


@dataclass
class MachineSpec:
    name: str
    type: str
    resources: dict = field(default_factory=dict)
    config: dict = field(default_factory=dict)
    forbidden: bool = False


def machine_dir():
    d = jobs.root() / "machines"
    d.mkdir(parents=True, exist_ok=True)
    return d


def add(name, type, resources, **config):
    spec = {"name": name, "type": type, "resources": resources, "config": config}
    (machine_dir() / f"{name}.json").write_text(json.dumps(spec, indent=2))


def forbid(name, value=True):
    p = machine_dir() / f"{name}.json"
    spec = json.loads(p.read_text())
    spec["forbidden"] = value
    p.write_text(json.dumps(spec, indent=2))


def specs():
    out = {}
    for p in sorted(machine_dir().glob("*.json")):
        raw = json.loads(p.read_text())
        out[raw["name"]] = MachineSpec(**raw)
    return out


def load(spec: MachineSpec):
    """Instantiate the plugin Machine for a spec (reference machines.py:37-55)."""
    module = importlib.import_module(f".{spec.type}", __package__)
    return module.Machine(spec)


def machines():
    return {name: load(spec) for name, spec in specs().items() if not spec.forbidden}
