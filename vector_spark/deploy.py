"""Ship the vector_spark package to Spark Python workers.

On a real cluster this is `spark-submit --py-files vector_spark.zip`
(the north-rule deployment mode). For sessions we did not launch —
e.g. a harness hands us its own SparkSession — `ship_package(spark)`
zips the installed package and sc.addPyFile()s it, so Arrow/pandas
UDF closures (pickled by reference) resolve on workers regardless of
the driver process's cwd/sys.path.

Idempotent per session.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_vector_spark_shipped"


def package_zip(path: str | None = None) -> str:
    """Zip the vector_spark package (importable at zip root)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # already imported FROM a zip (spark-submit --py-files): that
        # archive IS the package zip. Walking the phantom dir would
        # produce — and OVERWRITE the real artifact with — an empty
        # zip, which is how we found this out.
        zip_path = pkg_dir
        while zip_path and not zip_path.lower().endswith(".zip"):
            parent = os.path.dirname(zip_path)
            if parent == zip_path:
                break
            zip_path = parent
        if zip_path.lower().endswith(".zip") and os.path.isfile(zip_path):
            return zip_path
        raise RuntimeError(
            f"vector_spark imported from {pkg_dir!r}, which is neither a "
            "directory nor inside a zip archive"
        )
    if path is None:
        path = os.path.join(tempfile.gettempdir(), "vector_spark_pkg.zip")
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join("vector_spark", os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    os.replace(tmp, path)
    return path


def ship_package(spark: SparkSession) -> None:
    """Make vector_spark importable on executors of this session."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if os.path.isdir(pkg_dir):
        sc.addPyFile(package_zip())
    # else: we're running from a --py-files zip, which spark-submit has
    # already distributed to every executor — nothing to ship.
    setattr(sc, _SHIPPED_ATTR, True)
