"""Packaging: SURVEY §2.2 maps the reference's `LOAD highs` / `INSTALL highs
FROM community` (example_usage.sql:13, docs/README.md:98-100) to "pip install
+ import". pyproject.toml + setup.py make that mapping a concrete artifact:
`pip install -e .` on a machine with the `wheel` package, or
`python setup.py develop` in this wheel-less container, installs the package
so `import highs_duckdb_spark` works from any cwd."""

from __future__ import annotations

import os
import subprocess
import sys

try:
    import tomllib  # stdlib from 3.11
except ModuleNotFoundError:  # pragma: no cover - py3.10 (requires-python >=3.10)
    import pytest

    tomllib = pytest.importorskip("tomli")  # skip, not crash, on bare 3.10

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_metadata_parses():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    assert proj["name"] == "highs-duckdb-spark"
    deps = " ".join(proj["dependencies"])
    assert "pyspark" in deps and "pyarrow" in deps
    assert meta["build-system"]["build-backend"] == "setuptools.build_meta"


def test_package_discovery_covers_all_subpackages():
    from setuptools import find_packages

    found = set(find_packages(REPO, include=["highs_duckdb_spark*"]))
    expected = {
        "highs_duckdb_spark",
        "highs_duckdb_spark.operators",
        "highs_duckdb_spark.optim",
        "highs_duckdb_spark.functions",
        "highs_duckdb_spark.plans",
        "highs_duckdb_spark.sources",
        "highs_duckdb_spark.streaming",
    }
    assert expected <= found, expected - found


def test_import_from_clean_cwd():
    """The installed (or path-provided) package imports with cwd != repo —
    the `LOAD highs` equivalent. Uses PYTHONPATH to stay hermetic whether or
    not a develop-install is present in site-packages."""
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c",
         "import highs_duckdb_spark as h; "
         "from highs_duckdb_spark.optim import registry; "
         "print(h.__name__)"],
        cwd="/tmp", env=env, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "highs_duckdb_spark" in out.stdout
