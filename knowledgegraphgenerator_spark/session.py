"""SparkSession factory tuned for the KG pipeline.

Local-mode defaults mirror the sandbox (local[32], 32 shuffle partitions)
but every knob is the one you'd set on a 1000-executor cluster too:

  * AQE on — runtime coalescing + skew-join splitting; corpus-derived
    dictionaries are broadcast explicitly (stats can mislead AQE).
  * Arrow on, bounded batch size — spaCy-class per-batch UDF work wants
    mid-sized batches (too big → executor-python memory spikes, too small
    → per-batch model-dispatch overhead).
  * shuffle partitions: set to cores locally; on a real cluster size to
    ~2-3x total cores or let AQE coalesce from a higher initial number.
  * UTC session timezone so timestamp arithmetic is reproducible.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from knowledgegraphgenerator_spark.config import (
    ARROW_MAX_RECORDS_PER_BATCH,
    DEFAULT_SHUFFLE_PARTITIONS,
)


def get_spark(
    app_name: str = "kg-construct",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # Python workers are separate processes that resolve this package via
    # PYTHONPATH, not the driver's sys.path — a session started from any
    # cwd must still let executors unpickle our UDFs. (On a real cluster
    # the equivalent is shipping the package via --py-files / pex.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
        )
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4.1 ChecksumCheckpointFileManager deadlocks under the
        # HDFS-backed state store on local FS (await inside task commit);
        # plain checkpoint files are sufficient here.
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
                "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
