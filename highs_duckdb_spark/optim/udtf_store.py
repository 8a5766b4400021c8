"""File-backed model store for the SQL table functions.

UDTFs evaluate in Python worker processes, and Spark's worker pool gives no
affinity guarantee — consecutive SQL statements may land on different
workers. The reference's registry is process-global (one DuckDB process);
the equivalent scope for a Spark app on one machine is machine-global
state, implemented here as pickled per-model files guarded by an exclusive
file lock (load → mutate → store is atomic under the lock).

On a multi-node cluster this directory would live on shared storage or the
table functions would be routed through the driver; the programmatic API
(:mod:`highs_duckdb_spark.optim.registry`) and the distributed bulk path
don't need any of this.
"""

from __future__ import annotations

import contextlib
import fcntl
import getpass
import os
import pickle
import tempfile

from highs_duckdb_spark.optim.registry import HighsModelInfo

#: per-user, 0700 directory: pickles are only ever read from a directory the
#: current user owns (a world-shared path would let another local user plant
#: a malicious pickle). Override with HDS_REGISTRY_DIR (e.g. per-CI-run) —
#: concurrent same-user apps share the store, like two sessions of one
#: DuckDB process share the reference's registry.
STORE_DIR = os.environ.get("HDS_REGISTRY_DIR") or os.path.join(
    tempfile.gettempdir(), f"highs_duckdb_spark_registry_{getpass.getuser()}"
)


def _ensure_store_dir() -> None:
    """Create STORE_DIR and verify it is safe to unpickle from.

    ``makedirs(mode=0o700, exist_ok=True)`` does NOT re-check an existing
    path, so a pre-planted world-writable dir or symlink (another local user
    squatting the predictable tempdir name) would let them feed us a
    malicious pickle. Verify: non-symlink directory, owned by us, mode 0700.
    """
    os.makedirs(STORE_DIR, mode=0o700, exist_ok=True)
    st = os.lstat(STORE_DIR)
    import stat as _stat

    if not _stat.S_ISDIR(st.st_mode):
        raise RuntimeError(f"registry store {STORE_DIR!r} is not a directory (symlink attack?)")
    if st.st_uid != os.getuid():
        raise RuntimeError(
            f"registry store {STORE_DIR!r} is owned by uid {st.st_uid}, not us ({os.getuid()}); "
            "refusing to unpickle from it — set HDS_REGISTRY_DIR to a private path"
        )
    if _stat.S_IMODE(st.st_mode) & 0o077:
        os.chmod(STORE_DIR, 0o700)  # tighten a group/other-accessible dir we own


def _paths(model_name: str) -> tuple[str, str]:
    _ensure_store_dir()
    safe = model_name.replace("/", "_")
    return (
        os.path.join(STORE_DIR, f"{safe}.pkl"),
        os.path.join(STORE_DIR, f"{safe}.lock"),
    )


@contextlib.contextmanager
def locked_model(model_name: str, create: bool, readonly: bool = False):
    """Yield (model | None); mutations are persisted on clean exit unless
    ``readonly`` (pure readers skip the re-pickle and shorten lock holds)."""
    path, lock_path = _paths(model_name)
    with open(lock_path, "w") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        try:
            model: HighsModelInfo | None = None
            if os.path.exists(path):
                with open(path, "rb") as f:
                    model = pickle.load(f)
            elif create:
                model = HighsModelInfo()
            yield model
            if model is not None and not readonly:
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(model, f)
                os.replace(tmp, path)
        finally:
            fcntl.flock(lockf, fcntl.LOCK_UN)


def remove_model(model_name: str) -> None:
    remove_model_checked(model_name)


def remove_model_checked(model_name: str) -> bool:
    """Atomically remove a model; returns whether it existed.

    Existence check and deletion happen under the SAME exclusive lock —
    a check-under-one-lock / delete-under-another sequence would let a
    concurrent create land in the window and be silently deleted."""
    path, lock_path = _paths(model_name)
    with open(lock_path, "w") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        try:
            if os.path.exists(path):
                os.remove(path)
                return True
            return False
        finally:
            fcntl.flock(lockf, fcntl.LOCK_UN)
