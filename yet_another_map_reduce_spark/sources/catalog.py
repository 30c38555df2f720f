"""Name → dataset catalog (reference F9 ``main_manifest`` → Spark-side catalog).

The reference resolves dataset names to worker locations via a JSON
``main_manifest`` (``/root/reference/Master/master_handler.py:108-119``)
and raises "File Not Found in Metadata" on a miss
(``Master/master_handler.py:136-144``).  Here a dataset name maps to a
(path, format) pair; block placement is the filesystem's concern and is
deliberately not modeled.  On a real deployment this would be a Hive
metastore / Unity-style catalog — the in-memory dict keeps the same verbs
with zero infra for tests.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class DatasetNotFound(KeyError):
    """Raised on lookup miss — the analog of the reference's HTTP 500
    "File Not Found in Metadata"."""


class Catalog:
    """Tiny persistent name→(path, format) registry.

    ``register`` after a write = the reference's manifest POST
    (``Client/client.py:188-190``); ``resolve`` before a read = the
    manifest lookup (``Master/master_handler.py:58-62``).
    """

    def __init__(self, root: str | None = None) -> None:
        self._root = root
        self._entries: dict[str, dict[str, str]] = {}
        if root:
            os.makedirs(root, exist_ok=True)
            manifest = os.path.join(root, "main_manifest.json")
            if os.path.exists(manifest):
                with open(manifest) as fh:
                    self._entries = json.load(fh)

    def _persist(self) -> None:
        if self._root:
            with open(os.path.join(self._root, "main_manifest.json"), "w") as fh:
                json.dump(self._entries, fh, indent=2, sort_keys=True)

    def register(self, name: str, path: str, fmt: str = "parquet") -> None:
        self._entries[name] = {"path": path, "format": fmt}
        self._persist()

    def resolve(self, name: str) -> tuple[str, str]:
        try:
            entry = self._entries[name]
        except KeyError:
            raise DatasetNotFound(name) from None
        return entry["path"], entry["format"]

    def names(self) -> list[str]:
        return sorted(self._entries)

    # -- verbs ---------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        name: str,
        path: str,
        fmt: str = "parquet",
        mode: str = "overwrite",
        num_partitions: int | None = None,
    ) -> None:
        """Reference WRITE (F1): store + register in one step."""
        out = df.repartition(num_partitions) if num_partitions else df
        out.write.mode(mode).format(fmt).save(path)
        self.register(name, path, fmt)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Reference READ (F2) minus the forced global sort — sorting is
        an explicit operator here, not a property of scanning."""
        path, fmt = self.resolve(name)
        return spark.read.format(fmt).load(path)
