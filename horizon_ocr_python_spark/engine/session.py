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
    - the Python runner is warmed at session build (one no-op mapInPandas
      over `cores` synthetic rows): the first Arrow-Python job in a fresh
      session otherwise pays ~5 s of one-time JVM/worker bring-up (measured
      local[32]) that is session infrastructure, not query work. Disable
      with HSP_WARM_PYTHON=0.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() if master == "local[*]" else None
        if master.startswith("local[") and master != "local[*]":
            n = int(master[len("local["):-1])
        shuffle_partitions = 2 * (n or 8)

    # repo root on the worker PYTHONPATH so the custom daemon module (and
    # pickled-by-reference kernel functions) import regardless of cwd
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    worker_pythonpath = os.pathsep.join(
        p for p in [repo_root, os.environ.get("PYTHONPATH", "")] if p)

    return (
        SparkSession.builder
        .master(master)
        .appName(app_name)
        # workers fork from a daemon that preimports numpy/pandas/pyarrow +
        # the kernel (copy-on-write inheritance): the first Python-boundary
        # job stops paying `cores x cold-import` (guide §4.5, hoisted to
        # once per host)
        .config("spark.python.daemon.module",
                "horizon_ocr_python_spark.engine.pydaemon")
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
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
    if os.environ.get("HSP_WARM_PYTHON", "1") != "0":
        _warm_python_runner(spark)
    return spark


def _warm_python_runner(spark: SparkSession) -> None:
    """One no-op Arrow-Python round trip so a fresh session's first real
    Python-boundary query does not absorb the one-time runner bring-up
    (worker daemon spawn, Arrow/Netty class loading, codegen of the Python
    eval operators — ~5 s at local[32]). Touches no input data: the job runs
    over `cores` synthetic longs."""
    import pandas as pd

    def _noop(batches):
        for pdf in batches:
            yield pd.DataFrame({"i": pdf["i"][:0]})

    cores = spark.sparkContext.defaultParallelism
    try:
        spark.sparkContext.setJobDescription("session: python-runner warmup")
        (spark.range(0, cores, 1, cores).toDF("i")
         .mapInPandas(_noop, "i long").count())
    finally:
        spark.sparkContext.setJobDescription(None)


def _local_dir() -> str:
    """Shuffle/spill directory. On this single box the one data disk is a
    shared bottleneck that does not scale with task threads (a real cluster
    adds disks with executors), so prefer tmpfs when present."""
    shm = "/dev/shm/spark-local"
    if os.path.isdir("/dev/shm"):
        os.makedirs(shm, exist_ok=True)
        return shm
    return "/tmp"
