"""Plan-keyed result cache — the reference's memoized async execution
(M10: serve.py:38-107) rebuilt on parquet.

The reference keys a pickle file by ``mmh3.hash(url_query)`` and a
Celery worker re-executes the whole pipeline on a miss. Here the key is
the md5 of the canonical plan serialization, the payload is a parquet
directory (columnar, splittable, reloadable by ANY Spark cluster), and
"async" is simply: the write is a Spark job, and a hit is a zero-work
``spark.read.parquet``. A sentinel ``_IN_PROGRESS`` marker plays the
role of the reference's datetime-in-pickle in-flight state.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

from .plans.solve import Action


def plan_key(actions: List[Action], goal: List[str]) -> str:
    """Stable digest of a plan: task names, bindings, returns, goal."""
    payload = json.dumps(
        {
            "goal": sorted(goal),
            "actions": [
                {
                    "task": a.Task,
                    "bindings": [
                        [b.frame, b.column, b.arg, repr(b.var), b.req_index]
                        for b in a.Bindings
                    ],
                    "returns": [[p if p is not None else -1, n] for p, n in a.Returns],
                }
                for a in actions
            ],
        },
        sort_keys=True,
    )
    return hashlib.md5(payload.encode()).hexdigest()


class ResultCache:
    def __init__(self, root: Optional[str] = None):
        self.root = root or os.path.join(tempfile.gettempdir(), "tada_spark_cache")
        os.makedirs(self.root, exist_ok=True)

    def _dir(self, key: str) -> str:
        return os.path.join(self.root, key)

    def status(self, key: str) -> str:
        """'done' | 'in_progress' | 'missing' (reference: serve.py:81-107)."""
        d = self._dir(key)
        if os.path.exists(os.path.join(d, "_SUCCESS")):
            return "done"
        if os.path.exists(os.path.join(d, "_IN_PROGRESS")):
            return "in_progress"
        return "missing"

    def load(self, spark: SparkSession, key: str) -> Optional[DataFrame]:
        if self.status(key) != "done":
            return None
        return spark.read.parquet(self._dir(key))

    def store(self, df: DataFrame, key: str) -> DataFrame:
        d = self._dir(key)
        marker = os.path.join(self.root, f"{key}._IN_PROGRESS")
        os.makedirs(d, exist_ok=True)
        open(os.path.join(d, "_IN_PROGRESS"), "w").close()
        df.write.mode("overwrite").parquet(d)
        # parquet overwrite clears the marker file with the directory;
        # ensure it is gone even if the write path changes
        p = os.path.join(d, "_IN_PROGRESS")
        if os.path.exists(p):
            os.remove(p)
        _ = marker
        return df

    def get_or_compute(
        self, spark: SparkSession, key: str, compute
    ) -> DataFrame:
        hit = self.load(spark, key)
        if hit is not None:
            return hit
        return self.store(compute(), key)

    def invalidate(self, key: str) -> None:
        shutil.rmtree(self._dir(key), ignore_errors=True)
