"""Small Ray helpers shared by pipeline stages."""

from __future__ import annotations

import os

_PKG_PARENT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def package_runtime_env() -> dict:
    """Runtime env ensuring workers can import ``trinity_ray``.

    Ray does not propagate the driver's ``sys.path`` to workers — only the
    driver's cwd ends up importable.  When the driver runs from elsewhere
    (bench scripts, notebooks), actor/task deserialization of our classes
    would fail with ``No module named 'trinity_ray'``.  Shipping PYTHONPATH
    via runtime_env env_vars fixes that without any network/pip dependency.
    """
    existing = os.environ.get("PYTHONPATH", "")
    path = _PKG_PARENT if not existing else f"{_PKG_PARENT}{os.pathsep}{existing}"
    return {"env_vars": {"PYTHONPATH": path}}
