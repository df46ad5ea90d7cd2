"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every setting here is chosen for the
1000-executor / 100 TB design point and merely *also* works locally:

- AQE on: runtime coalescing of the post-shuffle value-level partitions and
  skew-join splitting replace the reference's manual chunk-size knobs
  (reference: scratch/rank_gene_groups.py:92-102).
- Arrow on: the single Python-boundary operator (normal SF pandas_udf) and
  any mapInPandas extension operators transfer via Arrow batches.
- shuffle.partitions modest locally; on a real cluster AQE's coalescing makes
  the initial number a ceiling, not a target.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dask-mwu-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # reused Python workers once crashed (silent exit, no traceback) in
        # applyInPandasWithState when any streaming aggregation ran earlier
        # in the same local-mode context (observed round 2 on PySpark
        # 4.1.2); reuse=false as the blanket workaround made EVERY
        # Python-boundary task (the erfc pandas_udf, the codec mapInPandas
        # seams) pay a worker spawn.  Optimization r12: the crash no longer
        # reproduces (tests/test_streaming.py green on 3 consecutive runs
        # with reuse on), so reuse is back on — guide §4: worker startup is
        # per-task overhead at any scale.  SPARK_GRAFT_WORKER_REUSE=false
        # restores the old blanket opt-out if the crash ever resurfaces.
        .config(
            "spark.python.worker.reuse",
            os.environ.get("SPARK_GRAFT_WORKER_REUSE", "true"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS); read as long (we only use
        # it for ordering/windowing where the integer is equivalent)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # in-memory catalog warehouse (bucketed saveAsTable targets) goes to
        # a temp dir, never the repo working directory
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "dask_mwu_spark_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
