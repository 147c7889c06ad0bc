"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the config block is written so the same
session options hold on a real multi-executor cluster: AQE on (runtime
coalescing, skew-join splitting), adaptive broadcast detection, Arrow for the
pandas-UDF surface, and a shuffle-partition default that AQE coalesces down
at small scale but that fans out on big inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make ``oc_meta_spark`` importable on executor Python workers.

    Pandas UDFs are pickled by module reference; a session whose driver was
    launched outside the repo (or a real cluster) needs the package shipped.
    ``addPyFile`` with a package zip works on any live session, so this is
    callable lazily from every UDF-bearing entry point.
    """
    sc = spark.sparkContext
    if getattr(sc, "_oc_meta_pkg_added", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "oc_meta_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
    sc.addPyFile(zpath)
    sc._oc_meta_pkg_added = True


def release_session_state(spark: SparkSession) -> None:
    """Drop every leftover persisted RDD and cached relation from the
    session — the measurement-isolation / long-session hygiene hook.

    ``localCheckpoint`` pins its RDD in the block manager until the
    driver-side reference is GC'd; a session that runs many independent
    queries (the bench, a nightly driver looping over jobs) therefore
    accumulates each query's checkpoint + cache blocks and pays for them
    as heap pressure in every LATER query (guide §5: cached data competes
    with execution memory; unpersist when done).  Calling this between
    queries releases the blocks immediately instead of waiting for the
    periodic GC.  It never touches data a future query could reuse: every
    query plan in this repo is built fresh from the parquet inputs, so
    nothing here is result caching — only garbage disposal.

    PRECONDITION — no live checkpointed frame may outlive the call: a
    ``localCheckpoint``-ed DataFrame's lineage is TRUNCATED, so once its
    blocks are unpersisted here the frame is unrecomputable — its next
    action fails with a "locally checkpointed ... cannot be recomputed"
    error.  Drop every reference to checkpoint-bearing results (query
    outputs, ``NightlyStores``, ``SignatureIndex``, curation catalogs)
    BEFORE calling; plain ``persist()``-ed frames merely lose their cache
    and recompute.  ``tests/test_io_streaming.py::
    test_release_session_state_invalidates_checkpoints`` pins both the
    release (blocks freed) and the loud failure mode.
    """
    import sys

    failed = 0
    jsc = spark.sparkContext._jsc
    try:
        # py4j exposes the Java map as a dict-like view — iterate its
        # values directly, one unpersist round-trip per RDD instead of the
        # keySet + scala Option.get chain
        for jrdd in list(jsc.getPersistentRDDs().values()):
            try:
                jrdd.unpersist(False)
            except Exception:
                failed += 1
    except Exception:
        failed = -1
    try:
        spark.catalog.clearCache()
    except Exception:
        print(
            "release_session_state: catalog.clearCache() failed — cached "
            "relations may linger",
            file=sys.stderr,
        )
    if failed:
        # a silent no-op release would quietly reintroduce the r12 bench-tail
        # heap inflation (up to 40x) with no signal — make it visible
        print(
            f"release_session_state: {failed if failed > 0 else 'all'} RDD "
            "unpersist(s) failed (py4j/Spark API drift?) — leaked blocks "
            "will only be freed by periodic GC",
            file=sys.stderr,
        )


def get_spark(app_name: str = "oc-meta-spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Scale notes (100 TB target):

    - AQE is the load-bearing setting: it re-plans shuffles at runtime, so a
      plan authored at sf0.01 still picks sane partition counts and converts
      sort-merge joins to broadcast when a post-filter side turns out small.
    - ``spark.sql.adaptive.skewJoin`` splits skewed partitions — the engine's
      resolution joins key on identifier values where a handful of hubs
      (big venues / prolific authors in the reference's domain) dominate.
    - Arrow execution for every pandas UDF; row-at-a-time Python UDFs are
      banned in the hot path (SURVEY §2.10).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # ContextCleaner only frees shuffle files, broadcast blocks and
        # checkpointed RDDs when the driver GCs their references; the JVM
        # default interval (30 min) is longer than a whole bench/ingest
        # session, so a long-lived session accumulates every gate's
        # broadcast + localCheckpoint blocks until the heap chokes
        # (measured r12: the 46-query bench degraded its tail queries up
        # to 40x — CUR1 221 s polluted vs 58 s clean).  90 s keeps cleanup
        # inside the lifetime of even a single composed gate; on a real
        # cluster the same setting bounds executor shuffle-dir growth for
        # long-running drivers (guide §5: unpersist when done).
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "90s"),
        )
        # Deliberate one-group windows (small-batch minting) use a literal
        # partition key; this rule would fold it away and degrade them to
        # warned-about no-partition global windows.  Excluding it keeps the
        # intent visible in the plan (operators/minting.py).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions",
        )
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return builder.master(f"local[{cpus}]").getOrCreate()
