"""Small Ray helpers shared by pipeline stages."""

from __future__ import annotations

import os

def _preseed_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` import deterministic.

    Ray's parquet path resolution imports that module per dataset; in this
    environment the import FAILS (no aiohttp), and CPython exposes a
    module that is mid-failing-import to CONCURRENT importers as a plain
    ImportError ("cannot import name 'HTTPFileSystem'") which Ray's
    ``except ModuleNotFoundError`` does not catch — a reproducible crash
    whenever two threads plan datasets at once (observed in the
    compact_plans wave and a bench run).  Pre-seed a stub module nothing
    ever instantiates so every later import resolves deterministically;
    semantics unchanged — this engine reads local paths only.
    """
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import sys
        import types

        stub = types.ModuleType("fsspec.implementations.http")

        class _NoHTTPFileSystem:
            pass

        stub.HTTPFileSystem = _NoHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub


_preseed_fsspec_http()

_PKG_PARENT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# cwd as of module import — workers inherit the driver's STARTUP cwd on
# sys.path, so a later os.chdir() must not change this decision
_IMPORT_CWD = os.path.abspath(os.getcwd())


def package_runtime_env() -> dict:
    """Runtime env ensuring workers can import ``trinity_ray``.

    Ray does not propagate the driver's ``sys.path`` to workers — only the
    driver's cwd ends up importable.  When the driver runs from elsewhere
    (bench scripts, notebooks), actor/task deserialization of our classes
    would fail with ``No module named 'trinity_ray'``.  Shipping PYTHONPATH
    via runtime_env env_vars fixes that without any network/pip dependency.

    Returns {} when workers can already import the package (driver cwd is
    the repo — Ray puts the driver's cwd on workers' sys.path in local
    mode — or PYTHONPATH already covers it).  An empty runtime env lets
    every stage share the default worker pool; a distinct env_vars env
    forces Ray to spin up a dedicated worker group per stage, seconds of
    fixed cost each.
    """
    existing = os.environ.get("PYTHONPATH", "")
    if (_IMPORT_CWD == _PKG_PARENT
            or _PKG_PARENT in existing.split(os.pathsep)):
        return {}
    path = _PKG_PARENT if not existing else f"{_PKG_PARENT}{os.pathsep}{existing}"
    return {"env_vars": {"PYTHONPATH": path}}


def actor_pool(n: int) -> tuple[int, int]:
    """Autoscaling actor-pool spec for map_batches: (1, n).

    A FIXED pool of n actors deadlocks the streaming executor when n equals
    the cluster's CPU count (all CPUs held by waiting actors, upstream read
    tasks can never schedule).  (1, n) starts one actor immediately and
    scales only into genuinely free CPUs, so any cluster size makes
    progress; on big clusters it still reaches n.
    """
    return (1, max(1, int(n)))


def exclusive_prefix_offsets(totals, key_col: str, val_col: str) -> dict:
    """Driver-side exclusive prefix sum over a per-range totals frame — the
    small half of the distributed prefix-sum pattern shared by
    ``ops.pack.pack_sequences`` and ``ops.sample.epoch_shuffle``: the input
    is one row per RANGE (never per corpus row), the output a
    {range_key: global_offset} dict to broadcast via ``ray.put``."""
    if totals.empty or key_col not in totals.columns:
        return {}   # empty input: Ray's aggregate yields a column-less frame
    totals = totals.sort_values(key_col).reset_index(drop=True)
    csum = totals[val_col].cumsum().shift(1, fill_value=0)
    return dict(zip(totals[key_col].astype(int), csum.astype(int)))
