"""Cheap source-parallelism probe.

Several operators round-robin-repartition their input when the SOURCE has
fewer splits than half the cores (a single small parquet file would other-
wise run every narrow Python/HOF stage on ONE task). The obvious probe —
``df.rdd.getNumPartitions()`` — forces a full physical planning pass
(~0.3 s per call, twice per benched query); for plain local file scans the
same number is computable driver-side from file sizes with Spark's own
split-packing formula (``FilePartition.maxSplitBytes`` +
``getFilePartitions`` bin packing, public Spark source). Anything that
isn't a simple local-file scan falls back to the RDD probe, so the
estimate can never change behavior on cloud storage or exotic plans.
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame


def _conf_bytes(spark, key: str, default: int) -> int:
    raw = spark.conf.get(key, str(default))
    s = str(raw).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    try:
        if s and s[-1] == "b":
            s = s[:-1]
        if s and s[-1] in units:
            return int(float(s[:-1]) * units[s[-1]])
        return int(s)
    except ValueError:
        return default


_NARROW_NODES = frozenset({"Project", "Filter", "Relation", "SubqueryAlias", "View"})


def _is_narrow_over_scan(df: DataFrame) -> bool:
    """True when the ANALYZED plan is only Project/Filter over one file
    relation — the shapes whose partitioning equals the scan's splits."""
    try:
        tree = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001 — connect mode etc.
        return False
    for line in tree.splitlines():
        node = line.lstrip(" :+-").split(" ", 1)[0].split("[", 1)[0]
        if node and node not in _NARROW_NODES:
            return False
    return True


def estimated_source_partitions(df: DataFrame) -> int:
    """Partition count of ``df``'s scan, estimated driver-side when cheap.

    Exact enough for the "under-partitioned?" decision: replicates Spark's
    maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    (totalBytes + nFiles·openCost) / minPartitionNum)) and the greedy
    packing partitions ≈ ceil(totalSize / maxSplitBytes). Falls back to
    ``df.rdd.getNumPartitions()`` (the ground truth, one planning pass)
    for non-file sources, non-local URIs, or unreadable files.
    """
    spark = df.sparkSession
    # the file estimate describes the SCAN — it is only the DataFrame's
    # partition count when every operator above the scan is narrow and
    # partitioning-preserving (Project/Filter). A repartition, join,
    # aggregate or generate in between changes the partitioning, and
    # treating e.g. an explicitly pre-repartitioned corpus as "one split"
    # would re-shuffle the whole (possibly huge) relation. Measured: that
    # exact mistake shuffled a 24 GB synthetic corpus and doubled a
    # 12M-page run.
    if not _is_narrow_over_scan(df):
        return df.rdd.getNumPartitions()
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — e.g. streaming relations
        return df.rdd.getNumPartitions()
    if not files:
        return df.rdd.getNumPartitions()
    sizes = []
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return df.rdd.getNumPartitions()
        try:
            sizes.append(os.path.getsize(unquote(u.path)))
        except OSError:
            return df.rdd.getNumPartitions()
    max_pb = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    min_parts = int(
        spark.conf.get(
            "spark.sql.files.minPartitionNum",
            str(spark.sparkContext.defaultParallelism),
        )
    )
    total = sum(sizes) + len(sizes) * open_cost
    max_split = min(max_pb, max(open_cost, total // max(min_parts, 1)))
    splits = sum(
        max(1, math.ceil(sz / max(max_split, 1))) for sz in sizes
    )
    # greedy packing merges small splits up to max_split per partition
    packed = max(1, math.ceil(total / max(max_split, 1)))
    return min(splits, packed) if splits else 1
