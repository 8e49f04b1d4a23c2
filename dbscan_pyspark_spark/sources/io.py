"""Sources & sinks (SURVEY.md §2.1, S1-S6).

The reference reads headerless int CSVs via ``sc.textFile(...).map(split,
int-cast)`` (``DBSCAN.py:53``) and writes JSON / parquet sinks through a
Spark-1.x sqlContext (``DBSCAN.py:80-84``, ``k-means.ipynb:cell0:L69-71``).
Here every source is a DataFrameReader (predicate pushdown + column
pruning for free) and every sink a DataFrameWriter.  Any Hadoop-FS URI
(s3a://, hdfs://, file:) works unchanged — the reference's S3 source
(``DBSCAN.py:39-40``) is just a path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_points(
    spark: SparkSession,
    path: str,
    dimension: int,
    n_cols: int | None = None,
    header: bool = False,
) -> DataFrame:
    """S1: headerless integer CSV -> points frame.

    Output schema: ``id long, features array<double>, sensitive long`` —
    the first ``dimension`` columns become the feature vector (distance
    participates), the column *after* the prefix is the sensitive
    attribute carried through anonymization untouched (``DBSCAN.py:84``).
    ``id`` is a stable surrogate (row position), replacing the
    reference's tuple-as-identity (SURVEY.md §1.3).
    """
    raw = spark.read.csv(path, header=header, inferSchema=False)
    cols = raw.columns
    if n_cols is not None:
        cols = cols[:n_cols]
    feature_cols = [F.col(c).cast("double") for c in cols[:dimension]]
    sensitive = (
        F.col(cols[dimension]).cast("long")
        if len(cols) > dimension
        else F.lit(None).cast("long")
    )
    # monotonically_increasing_id is partition-stable and never shuffles.
    return raw.select(
        F.monotonically_increasing_id().alias("id"),
        F.array(*feature_cols).alias("features"),
        sensitive.alias("sensitive"),
    )


def write_json(df: DataFrame, path: str) -> None:
    """S3: JSON sink, overwrite mode (``DBSCAN.py:80-84``)."""
    df.write.mode("overwrite").json(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S4: parquet sink, overwrite (``k-means.ipynb:cell0:L69-71``)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S5: metrics-log CSV sink (``DBSCAN.py:135-143`` wrote driver-local)."""
    w = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    w.option("header", True).csv(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 64,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table sink — the co-located-join primitive.

    Pays ONE hash shuffle at write time (``bucketBy`` clusters rows into
    ``num_buckets`` files by ``hash(bucket_by)``); every later equi-join
    or aggregation on those keys between tables bucketed the same way
    runs with NO exchange on either side — at 100 TB that converts the
    nightly fact-to-fact join from the dominant shuffle into a local
    zipper of pre-sorted buckets (``sort_by`` additionally enables
    sort-merge without the sort). The reference re-shuffled its whole
    dataset every ε iteration; this is the durable alternative.
    """
    w = df.write.mode(mode).bucketBy(int(num_buckets), *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def zorder_key(cols, bits: int = 16):
    """Morton (Z-order) key from pre-gridded nonnegative integer coords.

    Interleaves the low ``bits`` bits of each column (column j supplies
    bit position ``i*len(cols)+j`` from its bit i), so rows close in ALL
    dimensions get close keys. Pure bitwise built-ins — whole-stage
    codegen keeps the ``bits * len(cols)`` shift/or terms JVM-side.
    """
    d = len(cols)
    if d < 1 or bits * d > 63:
        # a real error, not an assert: under `python -O` an oversized
        # bits*d would otherwise silently collide bit positions and
        # produce a broken Z-order layout
        raise ValueError(
            f"interleaved key must fit a long: bits={bits} x dims={d} > 63"
        )
    z = None
    for j, c in enumerate(cols):
        c = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            term = F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * d + j
            )
            z = term if z is None else z.bitwiseOR(term)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet write clustered on the Z-order curve of ``cols``.

    Each column is min/max-scaled onto a ``2^bits`` grid (one bounded
    agg job computes the ranges), rows are range-partitioned AND sorted
    by the interleaved Morton key, then written. Because the curve
    localizes every participating dimension, each output file's parquet
    row-group min/max stats are narrow in ALL ``cols`` — so a later
    range predicate on ANY of them prunes most files/row-groups at the
    scan, where a plain ``sortWithinPartitions(col_a)`` layout prunes
    only on ``col_a`` and leaves every other column's stats spanning the
    full domain in every file. At 100 TB this is the difference between
    reading one file and reading the table for the second predicate.

    Beyond-reference extension (the reference has no layout control at
    all); same role as Delta/Iceberg OPTIMIZE ZORDER BY, built from
    plain Spark ops.
    """
    ranges = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_max_{c}") for c in cols],
    ).collect()[0]
    grid_max = (1 << bits) - 1
    coords = []
    for c in cols:
        lo, hi = ranges[f"_min_{c}"], ranges[f"_max_{c}"]
        if lo is None or hi is None:  # empty (or all-null) input
            lo, hi = 0.0, 1.0
        span = (hi - lo) or 1.0
        coords.append(
            F.least(
                F.lit(grid_max),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * grid_max),
            ).cast("long")
        )
    keyed = df.withColumn("_z", zorder_key(coords, bits=bits))
    from ..compat import default_parallelism

    n = num_files or max(default_parallelism(df.sparkSession), 1)
    (
        keyed.repartitionByRange(int(n), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


POINTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
        T.StructField("sensitive", T.LongType(), True),
    ]
)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_bytes`` files (the OPTIMIZE/compaction half of
    lakehouse table maintenance; ``write_zordered`` is the clustering
    half). Returns the new file count.

    File count is sized from the on-disk bytes of the existing footprint
    (cheap driver-side listing, no data scan), so a directory of ten
    thousand 1 MB shuffle spills becomes ~80 right-sized files — at
    100 TB, small-file explosion is what turns scans into
    metadata-bound crawls. The rewrite is one coalesce-free
    ``repartition`` (even output sizes beat coalesce's skewed unions),
    optionally sorted within partitions to keep row-group stats tight.

    Swap discipline: the rewrite lands in a ``._compact_tmp`` sibling;
    the original is then renamed to ``._compact_old``, tmp renamed into
    place, and old deleted last — so a crash at any point leaves a
    complete copy of the data under exactly one of the three names
    (recovery: if ``path`` is missing, rename whichever sibling exists
    back). Local-filesystem only (os.rename semantics); concurrent
    readers can still observe a brief window where ``path`` is absent
    between the two renames — this is maintenance for quiesced tables,
    not a transactional commit (that's a table format's job).
    """
    import glob
    import os

    subdirs = [
        d
        for d in glob.glob(os.path.join(path, "*"))
        if os.path.isdir(d) and "=" in os.path.basename(d)
    ]
    if subdirs:
        # a flat rewrite would silently drop the partition layout (and
        # its pruning); compact each leaf instead
        raise ValueError(
            f"{path} is hive-partitioned ({os.path.basename(subdirs[0])}, "
            "...); call compact_parquet on each partition directory"
        )
    files = glob.glob(os.path.join(path, "*.parquet"))
    total = sum(os.path.getsize(f) for f in files)
    n_files = max(1, round(total / target_file_bytes)) if total else 1
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + "._compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    _swap_into_place(path, tmp)
    return len(glob.glob(os.path.join(path, "*.parquet")))


def _swap_into_place(path: str, tmp: str) -> None:
    """Local-FS two-rename swap: at every instant a complete copy of
    the table exists under exactly one of (path, path._compact_old,
    tmp). Crash recovery: if ``path`` is missing, rename the surviving
    sibling back."""
    import os
    import shutil

    old = path.rstrip("/") + "._compact_old"
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a previous crashed swap
    os.rename(path.rstrip("/"), old)
    os.rename(tmp, path.rstrip("/"))
    shutil.rmtree(old)


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Raw-corpus ingestion: one row per FILE (wholetext), with the
    file URI as the deterministic document key.

    Returns DataFrame(doc_path string, text string). Line-oriented
    ``spark.read.text`` has no stable row identity (splits arrive in
    any order); whole-file rows keyed by ``input_file_name()`` do —
    the same id discipline as ``read_csv_points``. Downstream ops
    (fingerprint, dedup, chunking) key on ``doc_path``.
    """
    return (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("doc_path"),
            F.col("value").alias("text"),
        )
    )


_EXT_MODALITY = {
    "jpg": ("image", "image/jpeg"), "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"), "gif": ("image", "image/gif"),
    "webp": ("image", "image/webp"), "bmp": ("image", "image/bmp"),
    "wav": ("audio", "audio/wav"), "mp3": ("audio", "audio/mpeg"),
    "flac": ("audio", "audio/flac"), "ogg": ("audio", "audio/ogg"),
    "mp4": ("video", "video/mp4"), "mkv": ("video", "video/x-matroska"),
    "webm": ("video", "video/webm"), "avi": ("video", "video/x-msvideo"),
}


def read_media_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Raw media ingestion via Spark's built-in ``binaryFile`` source:
    one row per file, landing directly in the ``MEDIA_SCHEMA`` shape
    the multimodal operators consume (``operators/multimodal.py``).

    Returns DataFrame(media_id long, modality string, content binary,
    mime string, meta struct, media_path string, n_bytes long) —
    ``media_id = xxhash64(path)`` (deterministic: the same file gets
    the same id on any run/cluster), modality/mime inferred from the
    extension (unknown extensions -> modality 'binary', mime null),
    intrinsic ``meta`` left null for the decode stage to fill.

    Scale: binaryFile is a real DataSource — files are split across
    tasks by the FileIndex, ``pathGlobFilter`` prunes at listing time
    (never reads filtered files), and
    ``spark.sql.files.maxPartitionBytes`` packs small files per task.
    Project metadata columns only (drop ``content``) before any wide
    op, per the multimodal no-binary-through-shuffle discipline.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    # literal maps instead of a 14-deep when() chain: one flat
    # expression per column, absent extensions yield NULL
    modality_map = F.create_map(
        *[F.lit(x) for e, (mod, _) in _EXT_MODALITY.items() for x in (e, mod)]
    )
    mime_map = F.create_map(
        *[F.lit(x) for e, (_, mm) in _EXT_MODALITY.items() for x in (e, mm)]
    )
    return r.load(path).select(
        F.xxhash64("path").alias("media_id"),
        F.coalesce(modality_map[ext], F.lit("binary")).alias("modality"),
        F.col("content"),
        mime_map[ext].alias("mime"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
        F.col("path").alias("media_path"),
        F.col("length").alias("n_bytes"),
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-export sink: deterministic shuffle + shard the corpus
    (``operators/pipeline.py::shard_order``) and write one
    ``shard=<k>`` partition directory per shard, plus a ``_manifest``
    CSV (shard, n_rows) a data loader can use to plan work.

    Within a shard, files preserve ``pos`` order via a per-shard
    ``sortWithinPartitions`` after repartitioning ON the shard column —
    each output task owns whole shards, so a shard's rows land in one
    run of files in read order. Returns the manifest DataFrame.

    Scale: the export is one hash repartition on ``shard`` + a
    per-task sort (corpus/n_shards rows each, spillable); the manifest
    is an n_shards-row aggregate. Readers pull one shard with
    partition pruning — see :func:`read_shard`.
    """
    from dbscan_pyspark_spark.operators.pipeline import shard_order

    sharded = shard_order(df, n_shards=n_shards, id_col=id_col)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = df.sparkSession
    manifest = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    write_csv(manifest, f"{path}/_manifest", single_file=True)
    return manifest


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Data-loader read of ONE exported shard, in ``pos`` order.

    The ``shard = k`` filter is a partition-directory prune — the scan
    lists and reads only ``shard=<k>``, never the other shards' files
    (the property that makes N loaders over N shards cost one corpus
    pass total). The per-shard sort is tiny (corpus/n_shards rows).
    """
    return (
        spark.read.parquet(path)
        .where(F.col("shard") == shard)
        .orderBy("pos")
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (same pushdown/pruning contract as parquet)."""
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: str | None = None,
) -> DataFrame:
    """XML source (built into Spark 4): one row per ``row_tag``
    element, schema inferred unless given explicitly (give it in
    production — inference is an extra full pass and type drift across
    files is silent). Feeds/exports the same relational surface as
    every other source; attribute fields surface as ``_attrname``
    columns per the native source's convention."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = False,
) -> DataFrame:
    """CSV source with bad-record quarantine — the CSV twin of
    ``read_json_robust``: PERMISSIVE parse with a ``_corrupt`` column
    capturing each malformed line verbatim. Clean rows parse, type-bad
    and over-long rows carry evidence in ``_corrupt``; filter
    ``_corrupt IS NULL`` for the clean relation, and the corrupt
    residue is the ingest dead-letter audit.

    Short rows (fewer tokens than the schema): Spark's PERMISSIVE mode
    null-pads the missing trailing columns AND records the raw line in
    ``_corrupt`` on Spark 4.x (pinned by
    ``test_read_csv_robust_short_row_caveat``; older Spark versions
    left ``_corrupt`` NULL for short rows). Treat that pin as
    version-specific: when required columns must be present, follow
    this read with a null-count expectation (``pipeline.validate``
    with a ``not_null`` rule on the trailing columns) rather than
    relying on ``_corrupt`` alone.

    Per Spark semantics the explicit ``schema`` must include the
    corrupt column; this helper appends it."""
    full = schema.rstrip() + ", _corrupt string"
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """ORC sink, overwrite mode."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> None:
    """Keyed upsert (MERGE) into a parquet snapshot: rows in ``updates``
    replace existing rows with the same key; new keys append.

    With ``partition_col`` (hive-partitioned table) this is the
    scale-right incremental shape: only partitions that contain updated
    keys — in their NEW home or their OLD one (keys may move
    partitions; a column-pruned key-scan of the table finds the old
    homes) — are read, merged, and rewritten via Spark's dynamic
    partition overwrite; every other partition is untouched, so a
    100 TB table with a 1 GB daily delta rewrites ~the delta's
    partitions, not the table. A partition fully emptied by moved keys
    is deleted afterwards (local FS, plain string/int partition values);
    on remote filesystems or exotic hive-encoded values the helper
    raises instead of silently leaving the stale rows behind. Without it, the
    whole snapshot is merged and rewritten through the same
    temp-and-swap used by ``compact_parquet`` (safe, but O(table) — use
    partitioning for anything that won't fit a full rewrite).

    ``updates`` must be unique per key (classic MERGE precondition;
    duplicate update keys would all survive the union). Not a
    transaction log: concurrent writers need a table format
    (Delta/Iceberg). Single-writer pipeline checkpointing is the
    supported pattern — the same discipline the rest of this module
    documents.
    """
    import os

    if not key_cols:
        raise ValueError("upsert_parquet: key_cols must be non-empty")
    # remote URIs are assumed to exist (driver-side listing is local-FS)
    exists = os.path.exists(path) if "://" not in path else True

    if not exists:
        write_parquet(
            updates, path,
            partition_by=[partition_col] if partition_col else None,
        )
        return

    if partition_col is not None:
        import shutil

        current = spark.read.parquet(path)
        keys = updates.select(*key_cols).distinct()
        # partitions receiving NEW versions...
        new_parts = {
            r[0] for r in updates.select(partition_col).distinct().collect()
        }
        # ...plus partitions holding OLD versions of the updated keys —
        # a key may MOVE partitions, and skipping its former home would
        # leave a stale duplicate behind. This is a key-scan of the
        # whole table but column-pruned to (key_cols, partition_col):
        # parquet reads only those columns, not the data.
        old_parts = {
            r[0]
            for r in current.join(keys, key_cols, "left_semi")
            .select(partition_col)
            .distinct()
            .collect()
        }
        parts = list(new_parts | old_parts)
        affected = current.where(F.col(partition_col).isin(parts))
        merged = affected.join(
            keys, on=key_cols, how="left_anti"
        ).unionByName(updates)
        # materialize ONCE: the survivors collect and the write would
        # otherwise each execute the full merge, and the write would
        # re-read the very files the overwrite replaces
        merged = merged.localCheckpoint(eager=True)
        survivors = {
            r[0] for r in merged.select(partition_col).distinct().collect()
        }
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
        # a partition whose rows were ALL old versions of moved keys
        # yields no output rows, so dynamic overwrite never touches it;
        # such partitions must be DELETED or the moved keys stay
        # duplicated. Refuse loudly where we cannot delete (remote FS)
        # or cannot map the value to Spark's hive-encoded dir name —
        # silently skipping would reintroduce the stale-key bug.
        emptied = set(parts) - survivors
        for pv in emptied:
            if "://" in path:
                raise RuntimeError(
                    f"upsert_parquet: partition {partition_col}={pv!r} was "
                    "fully emptied by moved keys but the table is on a "
                    "remote filesystem this helper cannot delete from; "
                    "remove the partition with your storage tooling (or "
                    "use a table format for this workload)"
                )
            d = os.path.join(path, f"{partition_col}={pv}")
            if os.path.isdir(d):
                shutil.rmtree(d)
            else:
                raise RuntimeError(
                    f"upsert_parquet: partition {partition_col}={pv!r} was "
                    f"fully emptied but no directory named {d!r} exists — "
                    "the value's hive encoding differs from str(); delete "
                    "the partition manually (plain string/int partition "
                    "values are handled automatically)"
                )
        return

    current = spark.read.parquet(path)
    merged = current.join(
        updates.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    ).unionByName(updates)
    # full rewrite through temp-and-swap (source never clobbered mid-write)
    tmp = path.rstrip("/") + "._upsert_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    _swap_into_place(path, tmp)


def read_json_robust(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSON source with bad-record quarantine: returns (good, bad).

    At 100 TB of crawled JSON there WILL be malformed lines; failing the
    job (mode=FAILFAST) or silently dropping them (DROPMALFORMED) are
    both wrong for a pipeline that must account for every input byte.
    PERMISSIVE mode parses what it can and lands the raw text of every
    unparseable line in ``corrupt_col``; this wrapper splits the two.

    The input is persisted before splitting: Spark refuses (or, with a
    relaxed flag, misbehaves on) queries that filter the corrupt column
    of a freshly-scanned relation, because the parser only populates it
    while parsing the same pass — caching materializes one consistent
    parse for both sides. Call ``unpersist()`` on either returned frame
    when done.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if corrupt_col not in [f.name for f in schema.fields]:
        schema = schema.add(T.StructField(corrupt_col, T.StringType()))
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .persist()
    )
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad


def compact_partitioned_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> dict[str, int]:
    """Per-partition small-file compaction for hive-partitioned tables
    (the case :func:`compact_parquet` refuses): each ``key=value`` leaf
    directory is compacted independently through the same temp-and-swap,
    so the partition layout — and its pruning — survives, and a crash
    affects at most one partition's swap (recoverable the same way).

    Returns {partition_dir_name: new_file_count}. At 100 TB, run the
    leaves in parallel from an orchestrator; here they run serially —
    each leaf's rewrite already uses the full cluster.
    """
    import glob
    import os

    leaves = sorted(
        d
        for d in glob.glob(os.path.join(path, "*"))
        if os.path.isdir(d) and "=" in os.path.basename(d)
    )
    if not leaves:
        raise ValueError(
            f"{path} has no key=value partition subdirectories; use "
            "compact_parquet for flat tables"
        )
    out: dict[str, int] = {}
    for leaf in leaves:
        out[os.path.basename(leaf)] = compact_parquet(
            spark, leaf, target_file_bytes, sort_within_by
        )
    return out


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with schema evolution (``mergeSchema``): files
    written under older, narrower schemas surface null for columns they
    predate, instead of the default footer-sampling behavior silently
    dropping late-added columns when old files win the sample.

    Schema merging reads every footer (driver-side metadata pass) — at
    100 TB use it on tables that actually evolve, or pin an explicit
    read schema once evolution has settled.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)
