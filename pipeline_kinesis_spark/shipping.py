"""Ship this package to executor Python workers.

Operators backed by Python/pandas UDFs (B27, C2-C5, stateful streaming)
cloudpickle their functions BY REFERENCE to this module, so executor
Python workers must be able to import ``pipeline_kinesis_spark``. When the
driver process launched from a directory that doesn't contain the repo
(e.g. an external harness with a plain SparkSession), that import fails.

``ship_package`` zips the package once per process and registers it with
``SparkContext.addPyFile`` — PySpark then places it on every Python
worker's sys.path (per-task include list), exactly how a wheel would be
shipped with ``--py-files`` on a real cluster. Idempotent per
SparkContext; call it from any driver-facing entry point.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"pipeline_kinesis_spark-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    _SHIPPED.add(id(sc))
