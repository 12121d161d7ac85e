"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`mapreduceece563_spark.registry`, which maps every
implemented operator from SURVEY.md §2 to a (Spark callable, DuckDB
oracle SQL) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

# JVM-spawned Python subprocesses (the transformWithState driver
# worker, the Python data-source planner) inherit the JVM's
# environment, not this process's sys.path, and sc.addPyFile only
# reaches executor task workers. Exporting PYTHONPATH here — before
# the driving process launches the JVM — is what makes the package
# importable in those runners when the driver's cwd is not the repo
# root (the cluster analogue is shipping the wheel in the image or
# via --py-files + spark.yarn.appMasterEnv.PYTHONPATH).
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _REPO
    )

from mapreduceece563_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's entire surface (word count) on
    sf0.001; driver checks rows>0 and a stable schema."""
    return registry.queries()["wordcount"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
