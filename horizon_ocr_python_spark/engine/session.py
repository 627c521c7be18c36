"""SparkSession builder with the engine's tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(master: str | None = None, app_name: str = "horizon-spark",
                  shuffle_partitions: int | None = None,
                  arrow_batch: int = 256) -> SparkSession:
    """Engine defaults, chosen for the heavy-UDF workload:

    - AQE on (runtime shuffle coalescing + skew-join splitting for the
      relational tail; it does NOT fix UDF-compute skew — that's the salted
      repartition's job, engine.partitioning)
    - arrow.maxRecordsPerBatch kept moderate: page payloads are KB-to-MB
      sized, so an Arrow batch of 256 rows stays well under worker memory
      (SURVEY §7.5 hard-part 3)
    - python worker reuse: the kernel's module import cost (and any future
      per-worker model cache) is paid once per executor, like the
      reference's lock-guarded lazy model init (orchestrator.py:115-161)
    - shuffle partitions default to 2x cores, scaled with master
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() if master == "local[*]" else None
        if master.startswith("local[") and master != "local[*]":
            n = int(master[len("local["):-1])
        shuffle_partitions = 2 * (n or 8)

    return (
        SparkSession.builder
        .master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.local.dir", _local_dir())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _local_dir() -> str:
    """Shuffle/spill directory. On this single box the one data disk is a
    shared bottleneck that does not scale with task threads (a real cluster
    adds disks with executors), so prefer tmpfs when present."""
    shm = "/dev/shm/spark-local"
    if os.path.isdir("/dev/shm"):
        os.makedirs(shm, exist_ok=True)
        return shm
    return "/tmp"
