"""Physical IO — readers, writers, screen.

Re-expression of reference physical/IO.scala (Read/Write/Screen/
ColumnEncoder) on the PySpark DataFrameReader/Writer API. Every public
op returns ``MayFail[DataFrame]`` so pipelines compose exactly like the
reference's for-comprehensions; the underscore-free plain functions are
the monadic surface, ``*_df`` suffixed ones return bare DataFrames.

Scale notes:
- Readers never ``inferSchema`` parquet (self-describing); CSV infer is
  opt-in like the reference but schema-pass-through is preferred at
  100 TB (one extra full scan otherwise).
- Writers default to ``NoPartition`` → the REFERENCE coalesces to 1 file
  (IO.scala:191) which is a driver-killer at scale; we instead keep the
  natural parallelism and expose ``single_file=True`` for the tiny-file
  convenience case only.
- Kafka/Mongo/DynamoDB connectors: the container has no brokers and no
  connector jars, so these build the plan lazily and are import-safe;
  they raise a clear error only when actually started. Semantics (Avro
  key/value encode/decode, offsets, checkpoints) mirror IO.scala.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thundercats_spark.functional.maybe import MayFail


def _is_path_not_found(e: Exception) -> bool:
    """True only for a missing-path read failure. Spark 4 raises
    AnalysisException with errorClass PATH_NOT_FOUND; older builds say
    'Path does not exist'. Everything else (corrupt footer, permission
    denied, transient FS errors) is NOT a missing sink."""
    from pyspark.errors import AnalysisException

    if not isinstance(e, AnalysisException):
        return False
    get_cls = getattr(e, "getCondition", None) or getattr(e, "getErrorClass", lambda: None)
    cls = get_cls()
    if cls is not None:
        return "PATH_NOT_FOUND" in cls
    return "Path does not exist" in str(e)


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem of ``path`` (works
    for local paths, HDFS, and object stores alike)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


# --------------------------------------------------------------------------
# Column encoders (reference IO.scala:16 ColumnEncoder.{None,Avro})
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class NoEncoder:
    pass


@dataclass(frozen=True)
class AvroEncoder:
    """Avro-encode/decode the kafka key+value (needs spark-avro pkg)."""

    schema: str


ColumnEncoder = NoEncoder | AvroEncoder


# --------------------------------------------------------------------------
# Partition spec for writers (reference IO.scala:183)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class NoPartition:
    pass


@dataclass(frozen=True)
class PartitionCol:
    cols: tuple[str, ...]

    def __init__(self, *cols: str):
        object.__setattr__(self, "cols", tuple(cols))


Partition = NoPartition | PartitionCol


# --------------------------------------------------------------------------
# Connector option maps — PURE builders, the single source of truth the
# readers/writers below consume. The container has no broker/connector
# jars, so the live paths can never run here; these functions make the
# option surface contract-testable anyway (tests/test_io.py pins the
# exact maps against reference IO.scala:116-180/229-247) and guarantee
# reader/writer/test can't drift apart.
# --------------------------------------------------------------------------


def kafka_reader_options(
    topic: str,
    server_addr: str,
    port: int = 9092,
    offset: str | None = None,
    streaming: bool = False,
    wait_timeout: int | None = None,
) -> dict[str, str]:
    """Reference IO.scala:116-145 parity: bootstrap servers + subscribe;
    the stream reader adds startingOffsets (default ``earliest``) and
    the requests-timeout (reference defaults it to 30 ms when unset)."""
    opts = {
        "kafka.bootstrap.servers": f"{server_addr}:{port}",
        "subscribe": topic,
    }
    if streaming:
        opts["startingOffsets"] = offset or "earliest"
        # DELIBERATE bug-for-bug parity with reference IO.scala:139:
        # 'requests.timeout.ms' is not a real Kafka config (the client
        # logs an unknown-config warning and ignores it; the real knob
        # is 'request.timeout.ms') — kept verbatim because the option
        # maps are contract-pinned against the reference (test_io.py).
        opts["kafka.requests.timeout.ms"] = str(
            wait_timeout if wait_timeout is not None else 30
        )
    return opts


def kafka_writer_options(
    topic: str,
    server_addr: str,
    port: int = 9092,
    streaming: bool = False,
    wait_timeout: int | None = None,
    checkpoint_location: str = "./chk",
) -> dict[str, str]:
    """Reference IO.scala:229-287 parity: the stream sink adds the
    fetch-max-wait (default 30 ms) and its checkpoint location."""
    opts = {
        "kafka.bootstrap.servers": f"{server_addr}:{port}",
        "topic": topic,
    }
    if streaming:
        # DELIBERATE parity with reference IO.scala:268: fetch.max.wait
        # is a CONSUMER config a producer sink ignores — kept verbatim
        # for the contract-pinned option-map parity (test_io.py).
        opts["kafka.fetch.max.wait.ms"] = str(
            wait_timeout if wait_timeout is not None else 30
        )
        opts["checkpointLocation"] = checkpoint_location
    return opts


def mongo_options(server_addr: str, db: str, collection: str) -> dict[str, str]:
    """Reference IO.scala:168-172 re-expressed for the v10+ ``mongodb``
    DataSourceV2 (connection.uri + database + collection options instead
    of the legacy single-uri form)."""
    return {
        "connection.uri": f"mongodb://{server_addr}",
        "database": db,
        "collection": collection,
    }


def dynamo_options(region: str, server_addr: str, table: str) -> dict[str, str]:
    """Reference IO.scala:174-178 / amazon.scala re-expressed as generic
    dynamodb DataSourceV2 options."""
    return {"region": region, "endpoint": server_addr, "tableName": table}


class Read:
    """Batch + streaming readers."""

    # -- bare-DataFrame impls ------------------------------------------------
    @staticmethod
    def csv_df(
        spark: SparkSession,
        path: str,
        with_header: bool = True,
        delimiter: str = ",",
        schema: str | None = None,
    ) -> DataFrame:
        r = (
            spark.read.option("header", str(with_header).lower())
            .option("delimiter", delimiter)
        )
        # Schema pass-through beats inferSchema (extra full scan) at scale.
        if schema is not None:
            r = r.schema(schema)
        else:
            r = r.option("inferSchema", "true")
        return r.csv(path)

    @staticmethod
    def parquet_df(spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    @staticmethod
    def json_df(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.json(path)

    @staticmethod
    def orc_df(spark: SparkSession, path: str) -> DataFrame:
        return spark.read.orc(path)

    # -- monadic surface -----------------------------------------------------
    @staticmethod
    def csv(spark, path, with_header=True, delimiter=",", schema=None) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Read.csv_df(spark, path, with_header, delimiter, schema))

    @staticmethod
    def parquet(spark, path) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Read.parquet_df(spark, path))

    @staticmethod
    def json(spark, path, schema=None) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Read.json_df(spark, path, schema))

    @staticmethod
    def orc(spark, path) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Read.orc_df(spark, path))

    @staticmethod
    def text_corpus_df(
        spark: SparkSession, path: str, whole_file: bool = False
    ) -> DataFrame:
        """Raw-text corpus on-ramp: one row per line (or per file with
        ``whole_file``) as ``(doc_id, text, source_path)``. ``doc_id``
        is content-addressed (xxhash64 of path + text) — stable across
        re-ingestion and dedup-friendly (identical lines in one file
        collapse under exact dedup by construction). Parallelizes over
        files/splits like any file source."""
        # NB: must be the keyword form — the `wholetext` reader OPTION is
        # silently ignored by the text source.
        df = spark.read.text(path, wholetext=whole_file)
        return df.select(
            F.xxhash64(F.input_file_name(), F.col("value")).alias("doc_id"),
            F.col("value").alias("text"),
            F.input_file_name().alias("source_path"),
        )

    @staticmethod
    def text_corpus(spark, path, whole_file=False) -> MayFail[DataFrame]:
        return MayFail.of(lambda: Read.text_corpus_df(spark, path, whole_file))

    @staticmethod
    def json_quarantine_df(
        spark: SparkSession, path: str, schema: str
    ) -> tuple[DataFrame, DataFrame]:
        """JSON Lines ingestion with malformed-record quarantine:
        returns ``(good, quarantine)`` where ``good`` has ``schema``'s
        columns and ``quarantine`` carries the raw line + source file
        of every row that failed to parse — at ingest scale bad lines
        are routine, and dropping them silently (or failing the whole
        job) are both wrong.

        Implementation note: built as ``from_json`` over a text scan
        rather than the json source's ``_corrupt_record`` column,
        which Spark forbids filtering on without caching the frame —
        this formulation is a pure scan-stage projection, no cache, no
        second pass."""
        cr = "__corrupt"
        raw = spark.read.text(path).select(
            F.col("value").alias("raw"), F.input_file_name().alias("source_path")
        )
        parsed = raw.select(
            "raw",
            "source_path",
            F.from_json(
                "raw",
                f"{schema}, {cr} string",
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": cr},
            ).alias("__p"),
        ).where(F.trim("raw") != "")  # blank lines are noise, not records
        # the literal line 'null' is valid JSON but parses to a NULL
        # struct (corrupt col null too) — without the isNotNull guard it
        # would land in GOOD as a silent all-null row, the exact outcome
        # this reader exists to prevent.
        ok = F.col("__p").isNotNull() & F.col(f"__p.{cr}").isNull()
        good = parsed.where(ok).select("__p.*").drop(cr)
        bad = parsed.where(~ok).select("raw", "source_path")
        return good, bad

    @staticmethod
    def json_quarantine(spark, path, schema) -> MayFail[tuple[DataFrame, DataFrame]]:
        return MayFail.of(lambda: Read.json_quarantine_df(spark, path, schema))

    @staticmethod
    def csv_quarantine_df(
        spark: SparkSession,
        path: str,
        schema: str,
        delimiter: str = ",",
        with_header: bool = True,
    ) -> tuple[DataFrame, DataFrame]:
        """CSV twin of ``json_quarantine_df``: ``(good, quarantine)``
        via ``from_csv`` over a text scan — malformed lines (wrong
        field count, uncastable values) keep their raw text and source
        file instead of becoming silent nulls. Header lines are dropped
        by matching the schema's field names against the line's fields
        (case-, space-, and quote-insensitively — the text source has
        no header notion). Caveat: an all-string data row whose fields
        EQUAL the column names is indistinguishable from a header and
        is dropped too. Caveat 2: header matching splits the raw line
        on the bare delimiter (not a CSV parse), so a QUOTED,
        delimiter-containing column name (``"a,b"``) tokenizes
        differently than ``from_csv`` would and the header line lands
        in quarantine on every file instead of being dropped — rename
        such columns or pre-strip the header upstream."""
        cr = "__corrupt"
        raw = spark.read.text(path).select(
            F.col("value").alias("raw"), F.input_file_name().alias("source_path")
        )
        opts = {
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": cr,
            "sep": delimiter,
        }
        parsed = raw.select(
            "raw",
            "source_path",
            F.from_csv("raw", f"{schema}, {cr} string", opts).alias("__p"),
        ).where(F.trim("raw") != "")
        if with_header:
            import re as _re

            from pyspark.sql.types import StructType

            # field names from the PARSED schema (not a naive comma
            # split, which breaks on decimal(10,2)/map<k,v> types)
            names = [f.name.lower() for f in StructType.fromDDL(schema).fields]
            # normalize both sides: split on the (regex-escaped)
            # delimiter, strip spaces and optional quotes, lowercase —
            # so 'Name, City' or '"name"|"city"' still reads as the
            # header line even for metachar delimiters like '|'.
            fields = F.transform(
                F.split("raw", F.lit(_re.escape(delimiter))),
                lambda x: F.lower(F.trim(F.regexp_replace(F.trim(x), '^"|"$', ""))),
            )
            parsed = parsed.where(
                fields != F.array(*[F.lit(n) for n in names])
            )
        good = parsed.where(F.col(f"__p.{cr}").isNull()).select("__p.*").drop(cr)
        bad = parsed.where(F.col(f"__p.{cr}").isNotNull()).select(
            "raw", "source_path"
        )
        return good, bad

    @staticmethod
    def csv_quarantine(
        spark, path, schema, delimiter=",", with_header=True
    ) -> MayFail[tuple[DataFrame, DataFrame]]:
        return MayFail.of(
            lambda: Read.csv_quarantine_df(spark, path, schema, delimiter, with_header)
        )

    # -- kafka (reference IO.scala:116-166): lazy plan; no broker locally ----
    @staticmethod
    def _kafka_decode(df: DataFrame, col_encoder: ColumnEncoder) -> DataFrame:
        df = df.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
        if isinstance(col_encoder, AvroEncoder):
            from pyspark.sql.avro.functions import from_avro

            df = df.select(
                from_avro(F.col("key"), col_encoder.schema).alias("key"),
                from_avro(F.col("value"), col_encoder.schema).alias("value"),
            )
        return df

    @staticmethod
    def kafka(
        spark: SparkSession,
        topic: str,
        server_addr: str,
        port: int = 9092,
        col_encoder: ColumnEncoder = NoEncoder(),
    ) -> MayFail[DataFrame]:
        def build():
            df = (
                spark.read.format("kafka")
                .options(**kafka_reader_options(topic, server_addr, port))
                .load()
            )
            return Read._kafka_decode(df, col_encoder)

        return MayFail.of(build)

    @staticmethod
    def kafka_stream(
        spark: SparkSession,
        topic: str,
        server_addr: str,
        port: int = 9092,
        offset: str | None = None,
        wait_timeout: int | None = None,
        col_encoder: ColumnEncoder = NoEncoder(),
    ) -> MayFail[DataFrame]:
        def build():
            df = (
                spark.readStream.format("kafka")
                .options(**kafka_reader_options(
                    topic, server_addr, port, offset,
                    streaming=True, wait_timeout=wait_timeout,
                ))
                .load()
            )
            return Read._kafka_decode(df, col_encoder)

        return MayFail.of(build)

    # -- generic connector gateway (reference mongo/dynamo re-expressed) -----
    @staticmethod
    def format(
        spark: SparkSession, fmt: str, options: dict[str, str], schema: str | None = None
    ) -> MayFail[DataFrame]:
        """Generic DataSourceV2 gateway. ``Read.mongo``/``Read.dynamo`` in
        the reference are just format+options (IO.scala:168-178); any
        connector on the classpath works the same way here."""

        def build():
            r = spark.read.format(fmt)
            for k, v in options.items():
                r = r.option(k, v)
            if schema is not None:
                r = r.schema(schema)
            return r.load()

        return MayFail.of(build)

    @staticmethod
    def mongo(spark, server_addr: str, db: str, collection: str) -> MayFail[DataFrame]:
        return Read.format(spark, "mongodb", mongo_options(server_addr, db, collection))

    @staticmethod
    def dynamo(spark, region: str, server_addr: str, table: str) -> MayFail[DataFrame]:
        return Read.format(spark, "dynamodb", dynamo_options(region, server_addr, table))


class Write:
    """Batch + streaming writers. Return the input df for chaining."""

    @staticmethod
    def _prep(df: DataFrame, partition: Partition, overwrite: bool, single_file: bool):
        if single_file:
            if isinstance(partition, PartitionCol):
                # contradictory: coalesce(1) would silently drop the
                # partitioning and downstream pruned reads would scan
                # everything — refuse instead of quietly unpartitioning
                raise ValueError(
                    "single_file=True cannot be combined with "
                    "PartitionCol — pick one"
                )
            # reference NoPartition semantics (IO.scala:191): one output file.
            w = df.coalesce(1).write
        elif isinstance(partition, PartitionCol):
            w = df.write.partitionBy(*partition.cols)
        else:
            w = df.write
        return w.mode("overwrite" if overwrite else "errorifexists")

    @staticmethod
    def csv(
        df: DataFrame,
        path: str,
        partition: Partition = NoPartition(),
        delimiter: str = ",",
        overwrite: bool = False,
        single_file: bool = False,
    ) -> MayFail[DataFrame]:
        def run():
            (
                Write._prep(df, partition, overwrite, single_file)
                .option("header", "true")
                .option("delimiter", delimiter)
                .csv(path)
            )
            return df

        return MayFail.of(run)

    @staticmethod
    def parquet(
        df: DataFrame,
        path: str,
        partition: Partition = NoPartition(),
        overwrite: bool = False,
        single_file: bool = False,
    ) -> MayFail[DataFrame]:
        def run():
            Write._prep(df, partition, overwrite, single_file).parquet(path)
            return df

        return MayFail.of(run)

    @staticmethod
    def json(
        df: DataFrame,
        path: str,
        partition: Partition = NoPartition(),
        overwrite: bool = False,
        single_file: bool = False,
    ) -> MayFail[DataFrame]:
        def run():
            Write._prep(df, partition, overwrite, single_file).json(path)
            return df

        return MayFail.of(run)

    @staticmethod
    def orc(
        df: DataFrame,
        path: str,
        partition: Partition = NoPartition(),
        overwrite: bool = False,
        single_file: bool = False,
    ) -> MayFail[DataFrame]:
        def run():
            Write._prep(df, partition, overwrite, single_file).orc(path)
            return df

        return MayFail.of(run)

    # -- kafka batch/stream (reference IO.scala:229-287) ----------------------
    @staticmethod
    def _kafka_encode(df: DataFrame, col_encoder: ColumnEncoder) -> DataFrame:
        if isinstance(col_encoder, AvroEncoder):
            from pyspark.sql.avro.functions import to_avro

            return df.select(
                to_avro(F.col("key")).alias("key"), to_avro(F.col("value")).alias("value")
            )
        return df

    @staticmethod
    def kafka(
        df: DataFrame,
        topic: str,
        server_addr: str,
        port: int = 9092,
        col_encoder: ColumnEncoder = NoEncoder(),
    ) -> MayFail[DataFrame]:
        def run():
            (
                Write._kafka_encode(df, col_encoder)
                .write.format("kafka")
                .options(**kafka_writer_options(topic, server_addr, port))
                .save()
            )
            return df

        return MayFail.of(run)

    @staticmethod
    def kafka_stream(
        df: DataFrame,
        topic: str,
        server_addr: str,
        port: int = 9092,
        wait_timeout: int | None = None,
        col_encoder: ColumnEncoder = NoEncoder(),
        checkpoint_location: str = "./chk",
        termination_timeout: int | None = None,
    ) -> MayFail[DataFrame]:
        """Streaming kafka sink (reference IO.scala:229-247): optional
        Avro key/value encoding and ``kafka.fetch.max.wait.ms`` —
        reference defaults the latter to 30 ms when unset."""

        def run():
            q = (
                Write._kafka_encode(df, col_encoder)
                .writeStream.format("kafka")
                .options(**kafka_writer_options(
                    topic, server_addr, port,
                    streaming=True, wait_timeout=wait_timeout,
                    checkpoint_location=checkpoint_location,
                ))
                .outputMode("append")
                .start()
            )
            if termination_timeout is None:
                q.awaitTermination()
            else:
                q.awaitTermination(termination_timeout)
            return df

        return MayFail.of(run)

    @staticmethod
    def stream_to_file(
        df: DataFrame,
        file_type: str,
        path: str,
        partition: Partition = NoPartition(),
        checkpoint_location: str = "./chk",
        timeout: int | None = None,
    ) -> MayFail[DataFrame]:
        """Streaming file sink (reference IO.scala:289-322). Unlike the
        reference (first partition col only), Spark's file sink accepts
        the full partitionBy list."""

        def run():
            assert file_type in {"parquet", "csv", "orc", "json"}
            w = (
                df.writeStream.format(file_type)
                .outputMode("append")
                .option("path", path)
                .option("checkpointLocation", checkpoint_location)
            )
            if isinstance(partition, PartitionCol):
                w = w.partitionBy(*partition.cols)
            q = w.start()
            if timeout is None:
                q.awaitTermination()
            else:
                q.awaitTermination(timeout)
            return df

        return MayFail.of(run)

    @staticmethod
    def _sink_missing(spark: SparkSession, path: str) -> bool:
        return not _path_exists(spark, path)

    @staticmethod
    def upsert_parquet(
        df: DataFrame, path: str, keys: list[str]
    ) -> MayFail[DataFrame]:
        """Key-based idempotent parquet append: dedup the incoming frame
        on ``keys``, anti-join against keys already in the sink, append
        only new keys. Batch twin of streaming
        ``stream_upsert_parquet`` — re-running the same load can't
        double-write. The anti-join scans only the sink's key columns
        (column pruning); partition the sink to prune further at scale."""

        def run():
            b = df.dropDuplicates(keys)
            try:
                existing = df.sparkSession.read.parquet(path).select(*keys)
                b = b.join(existing, keys, "left_anti")
            except Exception as e:
                # Only a missing sink may skip the anti-join (first write).
                # Any other read failure (corrupt footer, permissions, FS
                # hiccup) must raise: silently appending would double-write
                # keys — the exact bug this operator exists to prevent.
                if not _is_path_not_found(e):
                    raise
            b.write.mode("append").parquet(path)
            return df

        return MayFail.of(run)

    @staticmethod
    def _swap_validate(spark: SparkSession, path: str, tmp: str) -> DataFrame:
        """Publish ``tmp`` over ``path`` with the validate-before-
        dropping-backup discipline shared by compact_delete and
        compact_parquet: keep a ``.old`` backup until the swapped-in
        dataset's footers read back, restore it if they don't. The two
        ``os.replace`` calls are each atomic but the pair is not — a
        crash between them leaves the original at ``<path>.old``
        (recovery: rename it back). Same-filesystem only (EXDEV
        otherwise); on object stores write a versioned prefix and
        repoint a manifest instead."""
        import shutil

        old = path.rstrip("/") + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(path, old)
        os.replace(tmp, path)
        try:
            out = spark.read.parquet(path)
            out.schema  # noqa: B018 - forces footer read
        except Exception:
            shutil.rmtree(path, ignore_errors=True)
            os.replace(old, path)
            raise
        shutil.rmtree(old, ignore_errors=True)
        return out

    @staticmethod
    def compact_delete(
        spark: SparkSession, path: str, delete_keys: DataFrame, keys: list[str]
    ) -> MayFail[DataFrame]:
        """Targeted deletion (retention purge / right-to-be-forgotten):
        rewrite the dataset at ``path`` without rows whose key appears
        in ``delete_keys``, via a broadcast anti join into a sibling
        directory, then swap. Returns the surviving frame. The delete
        set is usually tiny → broadcast; survivors stream through
        without a shuffle.

        Durability: the ``.old`` backup is kept until the swapped-in
        data has been re-read and validated, then removed. The two
        ``os.replace`` calls are each atomic but the pair is not — a
        crash between them leaves no dataset at ``path`` with the
        original intact at ``<path>.old`` (recovery: rename it back).
        ``os.replace`` requires source and destination on the same
        filesystem (EXDEV otherwise); on object stores, write a new
        versioned prefix and repoint a manifest instead of renaming."""

        def run():
            import shutil

            from pyspark.sql.functions import broadcast

            survivors = spark.read.parquet(path).join(
                broadcast(delete_keys.select(*keys).distinct()), keys, "left_anti"
            )
            tmp = path.rstrip("/") + ".compact"
            survivors.write.mode("overwrite").parquet(tmp)
            return Write._swap_validate(spark, path, tmp)

        return MayFail.of(run)

    @staticmethod
    def parquet_bloom(
        df: DataFrame,
        path: str,
        bloom_cols,
        overwrite: bool = False,
        n_files: int | None = None,
        sort_cols: list[str] | None = None,
    ) -> MayFail[DataFrame]:
        """Point-lookup-optimized write: parquet BLOOM filters on the
        given columns. Min/max footer stats (``parquet_sorted`` /
        ``parquet_zorder``) are useless for hash-random columns —
        fingerprints, xxhash64 ids, UUIDs — because every row group
        spans the whole value range; a bloom filter gives the reader
        row-group-level EQUALITY skipping there (parquet-mr consults it
        for pushed-down ``col = literal`` / IN predicates; Spark's scan
        does this whenever filter pushdown is on). The serving shape:
        "is this fingerprint in the corpus?" touches ~one row group
        instead of every one.

        ``bloom_cols``: ``{col: expected_ndv}``, or a list of columns
        to size automatically from ONE ``approx_count_distinct`` pass
        (NDV sizing matters: parquet-mr allocates ~1.25 bytes/value at
        the default 1% false-positive rate — the 100k-NDV filter in the
        tests costs ~130 KB per file). ``sort_cols`` optionally layers
        the range-clustered layout on top so range AND point predicates
        both skip. Verification note: the container's pyarrow predates
        bloom-offset metadata exposure, so tests pin the written bloom
        block via the file-size delta and the option contract."""

        def run():
            cols = (
                dict(bloom_cols)
                if isinstance(bloom_cols, dict)
                else {c: None for c in bloom_cols}
            )
            missing = [c for c in cols if c not in df.columns]
            if missing:
                raise ValueError(
                    f"bloom columns {missing} not in frame: {df.columns}"
                )
            need = [c for c, v in cols.items() if v is None]
            if need:
                r = df.agg(
                    *[F.approx_count_distinct(c).alias(c) for c in need]
                ).collect()[0]
                for c in need:
                    cols[c] = max(int(r[c]), 1)
            out = df
            if sort_cols:
                parts = [n_files] if n_files else []
                out = out.repartitionByRange(
                    *parts, *[F.col(c) for c in sort_cols]
                ).sortWithinPartitions(*sort_cols)
            elif n_files:
                out = out.repartition(n_files)
            w = out.write.mode("overwrite" if overwrite else "error")
            for c, ndv in cols.items():
                w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
                w = w.option(
                    f"parquet.bloom.filter.expected.ndv#{c}", str(int(ndv))
                )
            w.parquet(path)
            return df

        return MayFail.of(run)

    @staticmethod
    def parquet_zorder(
        df: DataFrame,
        path: str,
        cols: list[str],
        **kw,
    ) -> MayFail[DataFrame]:
        """Multi-column clustered write (Morton/Z-order curve) — the
        completion of ``parquet_sorted`` for workloads that filter on
        MORE than one column: every clustered column gets footer
        min/max locality, so selective scans prune on any of them.
        Delegates to physical/layout.py; yields the input frame like
        every other writer (the boundary map persists in the dataset's
        ``_zorder_layout.json`` sidecar, ``read_layout_meta``)."""
        from thundercats_spark.physical.layout import write_parquet_zorder_mf

        return write_parquet_zorder_mf(df, path, cols, **kw)

    @staticmethod
    def parquet_sorted(
        df: DataFrame,
        path: str,
        sort_cols: list[str],
        n_files: int | None = None,
        overwrite: bool = False,
    ) -> MayFail[DataFrame]:
        """Cluster-and-sort write for DATA SKIPPING: range-partition the
        frame on ``sort_cols`` and sort within each partition before
        writing, so every output file covers a narrow, mostly disjoint
        value range — parquet footer min/max stats then let selective
        scans skip whole files/row-groups instead of reading them (the
        poor man's Z-order; for one sort key it IS optimal clustering).
        Costs one range exchange + in-partition sort at write time and
        pays back on every selective read. ``n_files`` pins the output
        file count (default: Spark's shuffle partition setting)."""

        def run():
            parts = [n_files] if n_files else []
            clustered = df.repartitionByRange(
                *parts, *[F.col(c) for c in sort_cols]
            ).sortWithinPartitions(*sort_cols)
            clustered.write.mode("overwrite" if overwrite else "error").parquet(path)
            return df

        return MayFail.of(run)

    @staticmethod
    def parquet_balanced_shards(
        df: DataFrame,
        path: str,
        n_shards: int,
        weight,
        id_col: str = "doc_id",
        overwrite: bool = False,
        key=None,
    ) -> MayFail[DataFrame]:
        """Materialize a training corpus as ``shard=N`` parquet
        directories of near-equal WEIGHT (token mass, bytes) via
        ``operators.curation.assign_balanced_shards`` — the write step
        after the shard plan: equal-mass shard files let lockstep
        training readers finish together instead of idling behind the
        shard that drew the long documents. Deterministic (the md5
        placement order), so re-runs produce identical shard
        membership. One extra shuffle on the 4-byte shard id
        (range-partitioned: shard ids are contiguous small ints, so
        range boundaries give a near-one-to-one shard->task layout —
        hash repartitioning would collide several shards onto one task
        and leave others empty); integral-weight and non-negativity
        guards are enforced by the assignment operator."""

        def run():
            from thundercats_spark.operators.curation import (
                assign_balanced_shards,
            )

            sharded = assign_balanced_shards(
                df, n_shards, weight, id_col=id_col, key=key
            )
            (
                sharded.repartitionByRange(n_shards, F.col("shard"))
                .write.mode("overwrite" if overwrite else "error")
                .partitionBy("shard")
                .parquet(path)
            )
            return df

        return MayFail.of(run)

    @staticmethod
    def compact_parquet(
        spark: SparkSession, path: str, target_files: int | None = None
    ) -> MayFail[DataFrame]:
        """Small-file compaction for append-accumulating datasets: the
        incremental dedup indexes gain ~one file set per committed
        batch, and after thousands of batches the listing + footer
        overhead taxes every probe. Rewrites ``path`` into
        ``target_files`` files (default: one per 128 MB of current
        bytes, min 1) using the same write-sibling / swap / validate /
        drop-backup dance as ``compact_delete`` (same crash-recovery
        contract — see that docstring). Periodic maintenance; never run
        concurrently with a committer on the same path."""

        def run():
            import math
            import shutil

            if target_files is None:
                nbytes = sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(path)
                    for f in fs
                    if f.endswith(".parquet")
                )
                n_out = max(1, math.ceil(nbytes / (128 << 20)))
            else:
                n_out = max(1, int(target_files))
            compacted = spark.read.parquet(path).coalesce(n_out)
            tmp = path.rstrip("/") + ".compact"
            compacted.write.mode("overwrite").parquet(tmp)
            return Write._swap_validate(spark, path, tmp)

        return MayFail.of(run)

    @staticmethod
    def format(
        df: DataFrame, fmt: str, options: dict[str, str], mode: str = "append"
    ) -> MayFail[DataFrame]:
        def run():
            w = df.write.format(fmt).mode(mode)
            for k, v in options.items():
                w = w.option(k, v)
            w.save()
            return df

        return MayFail.of(run)

    @staticmethod
    def mongo(df, server_addr: str, db: str, collection: str) -> MayFail[DataFrame]:
        return Write.format(df, "mongodb", mongo_options(server_addr, db, collection))

    @staticmethod
    def dynamo(df, region: str, server_addr: str, table: str) -> MayFail[DataFrame]:
        """Named DynamoDB writer — twin of ``Read.dynamo``. The reference
        declares the symbol but leaves it unimplemented (IO.scala:336
        ``???``); here it goes through the generic connector gateway, so
        any dynamodb DataSourceV2 on the classpath works."""
        return Write.format(df, "dynamodb", dynamo_options(region, server_addr, table))


class Screen:
    """Console inspection (reference IO.scala:30-85)."""

    @staticmethod
    def _simplify(df: DataFrame) -> DataFrame:
        """Disguise complex (array/struct/binary) cols for readable show
        (single select — one analysis pass regardless of column count)."""
        from pyspark.sql.types import ArrayType, BinaryType, StructType

        def disguise(f_):
            if isinstance(f_.dataType, ArrayType):
                return F.lit(f"<array<{f_.dataType.elementType.simpleString()}>>").alias(f_.name)
            if isinstance(f_.dataType, StructType):
                return F.lit("<struct>").alias(f_.name)
            if isinstance(f_.dataType, BinaryType):
                return F.lit("<binary>").alias(f_.name)
            return F.col(f_.name)

        return df.select(*[disguise(f_) for f_ in df.schema.fields])

    @staticmethod
    def show_df(
        df: DataFrame,
        title: str | None = None,
        num_rows: int = 5,
        truncate: bool = True,
        hide_complex: bool = False,
    ) -> MayFail[DataFrame]:
        def run():
            if title:
                print(title)
            (Screen._simplify(df) if hide_complex else df).show(num_rows, truncate)
            return df

        return MayFail.of(run)

    @staticmethod
    def show_df_stream(df: DataFrame, title: str | None = None, timeout_ms: int = 50) -> MayFail[DataFrame]:
        def run():
            if title:
                print(title)
            q = df.writeStream.outputMode("append").format("console").start()
            q.awaitTermination(timeout_ms / 1000.0)
            q.stop()
            return df

        return MayFail.of(run)

    @staticmethod
    def show_schema(df: DataFrame) -> MayFail[DataFrame]:
        def run():
            df.printSchema()
            return df

        return MayFail.of(run)


def schema_map(df: DataFrame) -> dict[str, str]:
    """Column → simple type-name map (reference Util.scala:26)."""
    return {f_.name: f_.dataType.simpleString() for f_ in df.schema.fields}


class Bucketed:
    """Bucketed-table layout (Hive-style bucketing) — the co-located
    join/agg strategy at scale: both sides pre-hashed into the same
    bucket count on the join key mean the join plans with ZERO
    exchanges. Requires saveAsTable (bucket metadata lives in the
    catalog, not the parquet files)."""

    @staticmethod
    def write(
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        num_buckets: int = 32,
        sort_cols: list[str] | None = None,
        overwrite: bool = True,
    ) -> MayFail[DataFrame]:
        def run():
            if overwrite:
                # saveAsTable(overwrite) only reclaims a location the
                # CATALOG knows about; a warehouse dir orphaned by a
                # dead session (the in-memory catalog dies with it, the
                # files don't) fails the CREATE with "location is not
                # empty" — drop stragglers first.
                # Orphan reclaim via the Hadoop FileSystem API (ADVICE
                # r06: os.path only sees a driver-local warehouse and
                # an unqualified layout — 'db.table' lives at
                # wh/<db>.db/<table>, remote warehouse URIs were a
                # silent no-op). ADVICE r07 hardening: when the catalog
                # DOES know the table, resolve its REAL location and
                # type from the catalog — custom-LOCATION tables are no
                # longer silently missed, and an EXTERNAL table's data
                # (which DROP deliberately preserves) is never
                # force-deleted; we warn and leave it. Validate BEFORE
                # the DROP so the error names the contract, not a
                # catalog internal.
                parts = table.lower().split(".")
                if len(parts) == 1:
                    db, tbl = None, parts[0]
                elif len(parts) == 2:
                    db, tbl = parts
                else:
                    raise ValueError(
                        f"table name {table!r} has more than one "
                        "qualifier — expected [db.]table"
                    )
                spark = df.sparkSession
                loc, external = None, False
                if spark.catalog.tableExists(table):
                    info = {
                        r.col_name: r.data_type
                        for r in spark.sql(
                            f"DESCRIBE TABLE EXTENDED {table}"
                        ).collect()
                    }
                    external = info.get("Type", "").upper() == "EXTERNAL"
                    loc = info.get("Location")
                spark.sql(f"DROP TABLE IF EXISTS {table}")

                def _managed_loc() -> str:
                    # where the rewrite's MANAGED table will land:
                    # resolve the DATABASE location if the catalog
                    # knows it (persistent metastore / custom
                    # LOCATION), else the default warehouse layout.
                    # An unqualified name resolves against the
                    # session's CURRENT database, not 'default' —
                    # assuming 'default' after USE <db> would delete a
                    # live default-db table's data and miss the real
                    # orphan (review r08 wave 2).
                    try:
                        cur = db or spark.catalog.currentDatabase()
                    except Exception:
                        cur = db or "default"
                    try:
                        dbloc = spark.catalog.getDatabase(
                            cur
                        ).locationUri.rstrip("/")
                        return f"{dbloc}/{tbl}"
                    except Exception:
                        wh = spark.conf.get(
                            "spark.sql.warehouse.dir"
                        ).rstrip("/")
                        rel = (
                            tbl
                            if cur == "default"
                            else f"{cur}.db/{tbl}"
                        )
                        return f"{wh}/{rel}"

                if external:
                    import warnings

                    warnings.warn(
                        f"Bucketed.write(overwrite=True): {table} was "
                        f"EXTERNAL; its data at {loc} is preserved (as "
                        "DROP TABLE semantics promise) — the rewrite "
                        "creates a MANAGED table at the warehouse "
                        "location instead",
                        stacklevel=3,
                    )
                    # Never reclaim the EXTERNAL location — but the
                    # MANAGED destination may still hold an orphan from
                    # a dead session (the case this reclaim exists
                    # for), so reclaim THAT, unless the external data
                    # itself lives there (review r08).
                    from urllib.parse import urlparse

                    managed = _managed_loc()
                    same = loc and urlparse(loc).path.rstrip(
                        "/"
                    ) == urlparse(managed).path.rstrip("/")
                    loc = None if same else managed
                elif loc is None:
                    # orphan path: the catalog has no record at all.
                    loc = _managed_loc()
                if loc is not None:
                    jvm = spark._jvm
                    hpath = jvm.org.apache.hadoop.fs.Path(loc)
                    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
                    if fs.exists(hpath):
                        fs.delete(hpath, True)
            w = df.write.bucketBy(num_buckets, *bucket_cols)
            if sort_cols:
                w = w.sortBy(*sort_cols)
            w.format("parquet").mode("overwrite" if overwrite else "errorifexists").saveAsTable(table)
            return df

        return MayFail.of(run)

    @staticmethod
    def read(spark: SparkSession, table: str) -> MayFail[DataFrame]:
        return MayFail.of(lambda: spark.table(table))
