"""SparkSession factory with scale-oriented defaults.

Defaults chosen for a multi-executor cluster reading ~100 TB:
- AQE on (runtime coalesce, skew-join splitting) — the crawl frontier is
  host-skewed by construction (a few huge hosts), cf. SURVEY.md §2.5 W3.
- Arrow enabled — every Python-side transform is a vectorized pandas UDF
  (BASELINE.json input_hint mandates no per-row Python).
- UTC session timezone so timestamp semantics are engine-independent.
- Parquet pushdown/pruning left at Spark defaults (on).

In the sandbox we run ``local[N]``; on a real cluster the same builder is
used by ``spark-submit --py-files`` with master/executor conf supplied
externally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "legislation-scraper-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master=None`` leaves master resolution to spark-submit / env; tests
    pass ``local[N]`` explicitly.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Byte-bound Arrow batches: crawl rows carry multi-KB html bodies,
        # so the default 10k-row batches reach ~56 MB each; at 32 concurrent
        # tasks that is >1.7 GB of in-flight Arrow buffers, which amplifies
        # allocation stalls and anti-scales the Python boundary (measured
        # up to 40 s vs 8 s on a 580k-page parse at local[32]).  16 MB caps
        # the batch whatever the row width; narrow rows keep the 10k-row cap.
        "spark.sql.execution.arrow.maxBytesPerBatch": str(16 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        # broadcast threshold generous: dims (robots, seeds, nation...) are tiny
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.parquet.filterPushdown": "true",
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
