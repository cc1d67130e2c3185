"""Build the native rANS shared library (g++, cached by source hash).

The extension is a plain C-ABI shared object loaded via ctypes — no pybind11
(not available in this environment). Rebuilds only when csrc/rans.cpp changes.
"""

import hashlib
import os
import subprocess
import sysconfig
from pathlib import Path

_CSRC = Path(__file__).parent / "csrc" / "rans.cpp"
_BUILD_DIR = Path(__file__).parent / "_build"


def _source_tag() -> str:
    return hashlib.sha256(_CSRC.read_bytes()).hexdigest()[:16]


def lib_path() -> Path:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    del suffix  # plain .so; not a Python extension module
    return _BUILD_DIR / f"librans_{_source_tag()}.so"


def build(verbose: bool = False) -> Path:
    """Compile csrc/rans.cpp → cached .so; returns its path."""
    out = lib_path()
    if out.exists():
        return out
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"),
        "-std=c++17",
        "-O3",
        "-fPIC",
        "-shared",
        "-pthread",
        str(_CSRC),
        "-o",
        str(out),
    ]
    if os.environ.get("DEBUG_BUILD"):
        # parity with the reference's DEBUG_BUILD env switch (setup.py:56-60)
        cmd[2:2] = ["-O0", "-g", "-UNDEBUG"]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise RuntimeError(f"failed to build native rANS coder: {e}") from e
    # drop stale builds
    for old in _BUILD_DIR.glob("librans_*.so"):
        if old != out:
            try:
                old.unlink()
            except OSError:
                pass
    return out
