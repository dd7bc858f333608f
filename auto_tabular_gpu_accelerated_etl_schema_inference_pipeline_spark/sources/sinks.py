"""Sink connectors (reference O2, etl_benchmark.py:19: a single parquet
write with a create-if-absent guard — generalized to the formats and
layouts a 100 TB pipeline needs).

Scale notes:
- ``partition_by`` produces hive-style directory partitioning so
  downstream reads prune whole directories (partition pruning).
- ``bucket_by`` + saveAsTable co-locates future equi-joins/aggs on the
  bucket key without a shuffle (sort-merge-bucket reads).
- ``max_records_per_file`` bounds file sizes so a 1000-executor write
  neither produces 10^6 tiny files nor 100 GB monoliths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    compression: str = "snappy",
) -> None:
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_parquet_if_absent(df: DataFrame, path: str) -> None:
    """The reference's idempotent create (os.path.exists guard at
    etl_benchmark.py:15) -> write mode 'ignore'."""
    df.write.mode("ignore").parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: equi-joins/aggs on bucket_col read
    co-located buckets with no exchange (the bucketing half of a
    shuffle-free join strategy at scale)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib default). ORC is the remaining self-describing
    columnar format in the Hadoop ecosystem; like the parquet sink it
    carries predicate-pushdown indexes (min/max, bloom) so scans stay
    prunable."""
    df.write.mode(mode).orc(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """Native XML sink (Spark 4 built-in ``xml`` source). Row-oriented
    text like CSV/JSON — an interchange format for feeds that demand it,
    never the analytics hot path (no columnar pruning, no pushdown)."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction — the OPTIMIZE/maintenance job every
    long-lived table needs: streaming ingest and fine-grained partitioned
    writes accumulate thousands of KB-sized files, and at 100 TB the
    resulting per-file open/footer overhead (plus task-per-file
    scheduling) dominates scan time. Rewrites ``path`` into
    ``out_path`` with file count sized from the ACTUAL input bytes,
    summed through the Hadoop FileSystem API (a recursive metadata
    listing — scheme-agnostic, so s3a://, hdfs://, abfs:// and file://
    all work, and NO data or row-level pass happens before the rewrite),
    optionally sorting within partitions so min/max file statistics stay
    selective after the rewrite. Returns the target file count.

    Writes to a NEW directory + atomic swap by the caller (object-store
    reality: rewrite-then-repoint; an in-place overwrite of a live table
    loses reader isolation)."""
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)  # recursive: hive-partitioned layouts too
    total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):  # _SUCCESS, checksums, hidden
            continue
        total += st.getLen()
    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(out_path)
    return n_files


def copy_into(
    spark,
    source_glob: str,
    target_dir: str,
    schema=None,
) -> int:
    """COPY-INTO-style idempotent incremental loader: append only files
    NOT yet recorded in the target's manifest, then extend the manifest.
    Re-running after new files arrive loads exactly the delta; re-running
    with no new files is a no-op — the exactly-once-per-FILE guarantee a
    table format gives you, here with a plain parquet dir + manifest.

    Scale shape: the manifest holds file PATHS (one row per loaded file,
    thousands at most), the membership check is a driver-side set
    difference on the listing — no data is read for already-loaded
    files. Returns the number of newly loaded files.
    """
    import json
    import os
    from glob import glob

    os.makedirs(target_dir, exist_ok=True)
    manifest_path = os.path.join(target_dir, "_loaded_manifest.json")
    loaded: set[str] = set()
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            loaded = set(json.load(f))
    candidates = sorted(os.path.abspath(p) for p in glob(source_glob))
    fresh = [p for p in candidates if p not in loaded]
    if fresh:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(*fresh)
        df.write.mode("append").parquet(os.path.join(target_dir, "data"))
        # write-new-then-rename so a crash between data append and
        # manifest update re-loads (at-least-once per file) rather than
        # silently skipping; table formats make this step transactional
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(loaded | set(fresh)), f)
        os.replace(tmp, manifest_path)
    return len(fresh)


def merge_upsert(
    spark,
    target_path: str,
    source: DataFrame,
    key_cols: list[str],
    version_col: str,
    partition_col: str | None = None,
    tombstone_col: str | None = None,
) -> None:
    """MERGE INTO semantics over plain parquet: latest-wins upsert plus
    optional tombstone deletes — the batch twin of
    streaming.foreach_batch's micro-batch upsert, and the write-side
    half the reference (parquet-only, etl_benchmark.py:19) never needed.

    Per key, the surviving row is the one with the greatest
    (version_col, is_source) pair — source wins version ties, so
    re-merging the same batch is idempotent. Rows whose winner carries
    ``tombstone_col = true`` are deleted.

    Scale shape: with ``partition_col``, only partitions PRESENT IN THE
    SOURCE are read (partition-pruned scan via an IN filter on the
    collected source partition values — bounded: one row per touched
    partition) and only those partition directories are rewritten
    (``partitionOverwriteMode=dynamic``). A 100 TB table with a 1 GB
    daily delta rewrites ~the delta's partitions, not the table. Without
    ``partition_col`` the whole table is rewritten — correct but only
    sensible for small dimension tables; table formats (Delta/Iceberg)
    exist precisely to shrink this rewrite to file granularity.
    """
    from pyspark.sql import functions as SF

    exists = False
    try:
        target = spark.read.parquet(target_path)
        exists = True
    except Exception:
        target = None
    src = source.withColumn("_is_source", SF.lit(1))
    if exists:
        if partition_col is not None:
            touched = [
                r[0]
                for r in source.select(partition_col).distinct().collect()
            ]
            target = target.filter(SF.col(partition_col).isin(touched))
        # target rows written by a previous merge no longer carry the
        # tombstone column — union with allowMissingColumns so they
        # surface it as null (== not deleted)
        merged = target.withColumn("_is_source", SF.lit(0)).unionByName(
            src, allowMissingColumns=True
        )
    else:
        merged = src
    w_key = SF.struct(SF.col(version_col), SF.col("_is_source"))
    latest = (
        merged.withColumn("_wk", w_key)
        .groupBy(*key_cols)
        .agg(SF.max_by(SF.struct("*"), SF.col("_wk")).alias("_row"))
        .select("_row.*")
        .drop("_wk", "_is_source")
    )
    if tombstone_col is not None:
        latest = latest.filter(
            ~SF.coalesce(SF.col(tombstone_col), SF.lit(False))
        ).drop(tombstone_col)
    if exists:
        # the merged plan reads target_path and the write replaces it —
        # materialize first (eager localCheckpoint severs the file-scan
        # lineage; Spark otherwise refuses to overwrite an input path).
        # Bounded: the partition-scoped merge checkpoints only touched
        # partitions. A cluster deployment would checkpoint to reliable
        # storage or stage to a sibling dir + swap instead.
        latest = latest.localCheckpoint()
    writer = latest.write.mode("overwrite")
    if partition_col is not None and exists:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(target_path)
    if partition_col is not None and exists and tombstone_col is not None:
        # dynamic overwrite only replaces partitions it WRITES — a
        # partition whose every row was tombstoned produces no output
        # rows and would otherwise survive stale; drop its directory
        survived = {
            r[0] for r in latest.select(partition_col).distinct().collect()
        }
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(target_path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        for val in set(touched) - survived:
            p = jvm.org.apache.hadoop.fs.Path(
                f"{target_path}/{partition_col}={val}"
            )
            if fs.exists(p):
                fs.delete(p, True)


def erase_rows(
    spark,
    path: str,
    key_col: str,
    keys: list,
    partition_col: str | None = None,
) -> int:
    """Right-to-be-forgotten erasure on plain parquet: rewrite the table
    WITHOUT rows whose ``key_col`` is in ``keys`` and return how many
    were erased. With ``partition_col``, only partitions that actually
    CONTAIN a target row are rewritten (dynamic partition overwrite);
    untouched partitions keep their physical files — on a 100 TB table
    a deletion request rewrites only the partitions the user appears
    in. Without it, full rewrite (dimension-table mode).

    Table formats do this with deletion vectors; the parquet-native
    version is rewrite-and-replace, and the invariant that matters —
    surviving rows byte-identical, targets gone — is pinned by test via
    an orderless table checksum."""
    from pyspark.sql import functions as SF

    df = spark.read.parquet(path)
    hit = SF.col(key_col).isin(keys)
    n_erased = df.filter(hit).count()
    if n_erased == 0:
        return 0
    if partition_col is not None:
        touched = [
            r[0]
            for r in df.filter(hit).select(partition_col).distinct().collect()
        ]
        survivors = df.filter(SF.col(partition_col).isin(touched)).filter(
            ~hit
        )
        # lineage reads the path being overwritten -> materialize first
        # (same reasoning as merge_upsert)
        survivors = survivors.localCheckpoint()
        (
            survivors.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
        # a partition whose every row was erased produces no output and
        # would survive stale under dynamic overwrite — drop it
        survived = {
            r[0] for r in survivors.select(partition_col).distinct().collect()
        }
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        for val in set(touched) - survived:
            p = jvm.org.apache.hadoop.fs.Path(
                f"{path}/{partition_col}={val}"
            )
            if fs.exists(p):
                fs.delete(p, True)
    else:
        survivors = df.filter(~hit).localCheckpoint()
        survivors.write.mode("overwrite").parquet(path)
    return n_erased
