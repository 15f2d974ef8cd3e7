"""Build & locate the bundled `gtphex` GTP engine (cpp/gtphex.cpp) — the
framework's real external opponent for environments without a MoHex binary.

The reference drives MoHex subprocesses over GTP (boardlaw/mohex.py:66-151);
this module gives `boardlaw_tpu.mohex`'s client a real compiled engine to
talk to: `MoHexAgent(command=gtp_engine.command(seed=0))` plays actual Hex
through the full load-SGF / reg_genmove round-trip. The engine picks
immediate wins and otherwise maximises uniform-playout win rate, so it
doubles as a deterministic calibration rung for the arena ladder.
"""
import hashlib
import os
import shutil
import subprocess
from pathlib import Path

SOURCE = Path(__file__).parent / "cpp" / "gtphex.cpp"
CACHE = Path(os.environ.get("GTPHEX_CACHE", "/tmp/boardlaw_tpu_gtphex"))


def available():
    """True if a C++ compiler is present to build the engine."""
    return shutil.which("g++") is not None


def binary():
    """Compile (once, content-hashed cache) and return the engine path."""
    src = SOURCE.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = CACHE / f"gtphex-{tag}"
    if out.exists():
        return str(out)
    CACHE.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(".build")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-o", str(tmp), str(SOURCE)],
        check=True, capture_output=True,
    )
    os.replace(tmp, out)
    return str(out)


def command(seed=0x5EED, playouts=None):
    """A command line for mohex.GTP/MoHex(command=...). `playouts` tunes
    strength at startup via the engine's param command (None = default 64)."""
    cmd = f"{binary()} --seed={int(seed)}"
    return cmd
