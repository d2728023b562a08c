"""Multi-column data layout — Z-order clustered writes, a distributed
parquet footer-stats pruning report, and rebuild-on-degradation
maintenance.

Completes the clustering story started by ``Write.parquet_sorted``
(physical/io.py — optimal for ONE sort key, degenerate for the
others): a Z-order (Morton) curve interleaves the bits of per-column
equi-depth bucket ids, so EVERY clustered column gets locality in the
written files and parquet min/max footer stats prune selective scans
on any of them — the standard lakehouse layout technique (public:
Morton 1966; Delta/Iceberg OPTIMIZE ZORDER) re-expressed on plain
open-source Spark primitives, no table format required.

Scale design (100 TB posture):
- Bucket boundaries come from ONE ``approxQuantile`` pass over all
  clustering columns together (Greenwald-Khanna, driver gets
  n_buckets-1 scalars per column — bounded, never row data).
- The z-value is pure JVM arithmetic over the boundary literals
  (sum-of-when bucketing, shift/AND/OR bit interleave) — no Python in
  the row path, no window functions, no single-sort-partition trap
  (cf. operators/ranking.py). The write path materializes each
  column's bucket id in a projection BEFORE interleaving, so the plan
  carries O(cols × buckets) + O(cols × bits) expression nodes, not
  the O(cols × bits × buckets) blowup of inlining the bucket chain
  under every bit extraction (the re-evaluated-fold pitfall class).
- The write is the same range-exchange + in-partition sort shape as
  ``parquet_sorted``: one shuffle on an 8-byte z column.
- The footer reports read ONLY parquet footers, distributed via
  ``mapInPandas`` over the file list (footer reads scale with the
  executor count, never through the driver); row data is never read.
  Non-local URIs (hdfs://, s3a://, ...) resolve through
  ``pyarrow.fs.FileSystem.from_uri`` — they work wherever pyarrow has
  the scheme's binding and fail with that resolver's error otherwise.
- Layout parameters (columns, bucket count, file count, boundaries)
  persist in a ``_zorder_layout.json`` sidecar INSIDE the dataset
  (underscore-prefixed → invisible to Spark's scans), so maintenance
  rebuilds reproduce the original granularity instead of silently
  re-clustering with defaults.

Reference parity note: the reference engine has no layout optimizer
(its Write coalesces to one file, IO.scala:191); this module is
net-new capability for the 100 TB target.
"""

from __future__ import annotations

import json
from typing import Callable, Iterable, Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from thundercats_spark.functional.maybe import MayFail

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

_LAYOUT_META_FILE = "_zorder_layout.json"


def _check_numeric(df: DataFrame, cols: Sequence[str]) -> None:
    """Z-order needs a total order with numeric quantiles on every
    clustering column — reject anything else loudly (hashing a string
    column would DESTROY locality, the opposite of clustering; cast
    dates to epoch days/seconds upstream)."""
    by_name = {f.name: f.dataType for f in df.schema.fields}
    bad = []
    for c in cols:
        if c not in by_name:
            raise ValueError(f"zorder column {c!r} not in frame: {sorted(by_name)}")
        if not isinstance(by_name[c], _NUMERIC_TYPES):
            bad.append(f"{c}: {by_name[c].simpleString()}")
    if bad:
        raise TypeError(
            "zorder columns must be numeric (approxQuantile boundaries + "
            "ordered bucketing); got [" + ", ".join(bad) + "]. Cast "
            "date/timestamp to epoch numbers upstream; string keys have "
            "no meaningful linear order to cluster on."
        )


def zorder_bounds(
    df: DataFrame, cols: Sequence[str], n_buckets: int = 64,
    relative_error: float = 0.001,
) -> dict[str, list[float]]:
    """Equi-depth bucket boundaries for every clustering column in ONE
    ``approxQuantile`` pass (nulls ignored by the sketch; they bucket
    to 0 at assignment). Boundaries are deduplicated per column — a
    heavily repeated value collapses its buckets, which only coarsens
    that column's contribution, never corrupts the curve."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    quants = df.approxQuantile(list(cols), probs, relative_error)
    out: dict[str, list[float]] = {}
    for c, qs in zip(cols, quants):
        dedup: list[float] = []
        for q in qs:
            if not dedup or q > dedup[-1]:
                dedup.append(q)
        out[c] = dedup
    return out


def _bucket_expr(col: str, bounds: Sequence[float]) -> Column:
    """Bucket id = count of boundaries <= value, as a sum-of-when
    chain over the boundary literals (same job-stable
    boundary-literal device as operators/ranking.py — the ids are a
    pure function of the value, identical across jobs and retries).
    NULL buckets to 0, i.e. clusters with the lowest values."""
    b: Column = F.lit(0)
    for v in bounds:
        b = b + F.when(F.col(col) >= F.lit(v), 1).otherwise(0)
    return b


def _bit_budget(bounds: Mapping[str, Sequence[float]]) -> int:
    """Uniform per-column bit width (max bucket id per column is
    len(bounds[c]): n_boundaries+1 buckets), with the <=62-bit long
    guard."""
    cols = list(bounds)
    max_bits = max(max(1, len(bounds[c]).bit_length()) for c in cols)
    if len(cols) * max_bits > 62:
        raise ValueError(
            f"zorder bit budget {len(cols)}*{max_bits} exceeds a long; "
            "lower n_buckets or cluster fewer columns"
        )
    return max_bits


def _interleave_bits(buckets: Sequence[Column], max_bits: int) -> Column:
    """Morton interleave of already-computed bucket-id columns: bit j
    of column c lands at position ``j * k + (k - 1 - c)`` (column 0
    owns the most significant bit within each group, so ties break on
    the first column — matching multi-key sort intuition)."""
    k = len(buckets)
    z: Column = F.lit(0).cast("long")
    for c_idx, b in enumerate(buckets):
        for j in range(max_bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * k + (k - 1 - c_idx)))
    return z


def zorder_expr(bounds: Mapping[str, Sequence[float]]) -> Column:
    """Morton z-value over per-column bucket ids, as ONE column
    expression. Convenient for probes and tests; note the bucket
    chain is inlined under every bit extraction here, so the
    expression carries O(cols × bits × buckets) nodes — fine at probe
    scale, but the WRITE path materializes bucket ids in a projection
    first (see ``write_parquet_zorder``) and large-bucket callers
    should do the same."""
    cols = list(bounds)
    if not cols:
        raise ValueError("zorder_expr needs at least one column")
    max_bits = _bit_budget(bounds)
    return _interleave_bits(
        [_bucket_expr(c, bounds[c]).cast("long") for c in cols], max_bits
    )


def write_parquet_zorder(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_buckets: int = 64,
    n_files: int | None = None,
    overwrite: bool = False,
    relative_error: float = 0.001,
) -> dict[str, list[float]]:
    """Z-order clustered parquet write: bucket each clustering column
    equi-depth, interleave the bucket bits into a Morton z-value,
    range-partition + sort the frame on it, write WITHOUT the helper
    columns. Returns the boundary map; the layout parameters
    (including the realized file count) also persist in the
    ``_zorder_layout.json`` sidecar inside the dataset so
    ``maintain_zorder`` can rebuild at the original granularity.

    Cost: one quantile pass + one range exchange on an 8-byte z
    column, the same write-time shape as ``parquet_sorted``. Pays back
    on every selective scan over ANY clustered column via footer
    min/max skipping; ``parquet_sorted`` remains the better choice
    when only one column is ever filtered."""
    _check_numeric(df, cols)
    helper = ["__z"] + [f"__zb{i}" for i in range(len(cols))]
    clash = [h for h in helper if h in df.columns]
    if clash:
        raise ValueError(
            f"input frame already has helper column(s) {clash}; rename "
            "them — the write would silently drop that data otherwise"
        )
    bounds = zorder_bounds(df, cols, n_buckets, relative_error)
    max_bits = _bit_budget(bounds)
    # materialize bucket ids ONCE per column, then interleave the
    # materialized columns — O(cols×buckets) + O(cols×bits) plan nodes
    bucketed = df.withColumns(
        {
            f"__zb{i}": _bucket_expr(c, bounds[c]).cast("long")
            for i, c in enumerate(cols)
        }
    )
    z = _interleave_bits([F.col(f"__zb{i}") for i in range(len(cols))], max_bits)
    parts = [n_files] if n_files else []
    clustered = (
        bucketed.withColumn("__z", z)
        .repartitionByRange(*parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop(*helper)  # projection after sort keeps the row order
    )
    clustered.write.mode("overwrite" if overwrite else "error").parquet(path)
    spark = df.sparkSession
    meta = {
        "cols": list(cols),
        "n_buckets": n_buckets,
        "n_files": len(spark.read.parquet(path).inputFiles()),
        "relative_error": relative_error,
        "bounds": bounds,
    }
    _write_sidecar(spark, path.rstrip("/") + "/" + _LAYOUT_META_FILE, meta)
    return bounds


def write_parquet_zorder_mf(
    df: DataFrame, path: str, cols: Sequence[str], **kw
) -> MayFail[DataFrame]:
    """Monadic surface, composing like the other writers: yields the
    input frame (read the sidecar or call ``read_layout_meta`` for
    the boundary map)."""

    def run():
        write_parquet_zorder(df, path, cols, **kw)
        return df

    return MayFail.of(run)


def _write_sidecar(spark: SparkSession, file_path: str, obj: dict) -> None:
    """Single-line JSON sidecar through the Hadoop FileSystem of the
    path — works on local paths and any configured remote scheme, and
    the underscore prefix keeps it invisible to Spark's parquet
    scans (same convention as _SUCCESS)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(file_path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()


def read_layout_meta(spark: SparkSession, path: str) -> dict | None:
    """The ``_zorder_layout.json`` sidecar of a z-ordered dataset, or
    None when the dataset wasn't written by ``write_parquet_zorder``
    (plain reads work regardless — the sidecar only informs
    maintenance and probe tooling)."""
    file_path = path.rstrip("/") + "/" + _LAYOUT_META_FILE
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(file_path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    # NOT spark.read.text: Spark's listing filters _-prefixed files (the
    # very rule that hides the sidecar from scans), so read via the FS API
    stream = fs.open(p)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return json.loads(bytes(data).decode("utf-8"))


# --------------------------------------------------------------------------
# distributed footer scans


def _open_parquet_meta(uri: str):
    """pyarrow FileMetaData for one Spark ``inputFiles()`` URI. Local
    ``file:`` URIs open directly; other schemes resolve through
    ``pyarrow.fs.FileSystem.from_uri`` (hdfs/s3/gcs work wherever
    pyarrow carries the binding; otherwise its resolver error
    propagates — never a silent skip)."""
    import pyarrow.parquet as pq

    if uri.startswith("file:"):
        return pq.ParquetFile(uri[5:]).metadata
    if "://" not in uri:
        return pq.ParquetFile(uri).metadata
    from pyarrow import fs as pafs

    filesystem, p = pafs.FileSystem.from_uri(uri)
    with filesystem.open_input_file(p) as f:
        return pq.ParquetFile(f).metadata


def _column_index_map(meta, needed: Sequence[str], uri: str) -> dict[str, int]:
    names = {meta.schema.column(i).path: i for i in range(meta.num_columns)}
    missing = [c for c in needed if c not in names]
    if missing:
        raise ValueError(
            f"columns {missing} not in parquet schema of {uri}: {sorted(names)}"
        )
    return names


def _footer_scan(
    spark: SparkSession,
    path: str,
    per_file: Callable[[str], tuple],
    schema: str,
    file_parallelism: int | None = None,
) -> DataFrame:
    """Fan the dataset's file list out over ``mapInPandas`` and apply
    ``per_file`` (uri -> one result tuple, reading only the footer)
    in each task — the shared engine of both footer reports. O(files)
    footer reads spread across the cluster; row data never read."""
    files = spark.read.parquet(path).inputFiles()
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    n_tasks = file_parallelism or min(
        len(files), spark.sparkContext.defaultParallelism
    )
    paths_df = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(n_tasks)
    col_names = [s.strip().split()[0] for s in schema.split(",")]

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [per_file(uri) for uri in pdf["path"]], columns=col_names
            )

    return paths_df.mapInPandas(run, schema)


_REPORT_SCHEMA = (
    "path string, row_groups long, may_match_row_groups long, "
    "rows long, may_match_rows long, bytes long, may_match_bytes long"
)


def _normalize_predicates(
    predicates: Mapping[str, tuple],
) -> dict[str, tuple]:
    out = {}
    for c, rng in predicates.items():
        if len(rng) != 2:
            raise ValueError(f"predicate for {c!r} must be (lo, hi), got {rng!r}")
        lo, hi = rng
        if lo is not None and hi is not None and lo > hi:
            raise ValueError(f"predicate for {c!r} is empty: lo {lo} > hi {hi}")
        out[c] = (lo, hi)
    return out


def scan_pruning_report(
    spark: SparkSession,
    path: str,
    predicates: Mapping[str, tuple],
    file_parallelism: int | None = None,
) -> DataFrame:
    """Per-file parquet footer-stats report for a closed-interval box
    predicate ``{col: (lo, hi)}`` (``None`` = unbounded side): which
    row groups COULD contain matching rows, judged purely from the
    footer min/max statistics — exactly the skipping decision the
    parquet reader makes, surfaced as data so layouts can be compared
    and regressions caught in CI.

    A row group with no stats for a predicate column (or a null-only
    one against a bounded predicate) counts as may-match —
    conservative, like the reader."""
    preds = _normalize_predicates(predicates)

    def per_file(uri: str) -> tuple:
        meta = _open_parquet_meta(uri)
        names = _column_index_map(meta, list(preds), uri)
        match_rg = match_rows = match_bytes = 0
        tot_rows = tot_bytes = 0
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            tot_rows += rg.num_rows
            tot_bytes += rg.total_byte_size
            may = True
            for c, (lo, hi) in preds.items():
                st = rg.column(names[c]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats: cannot prune on c
                if (hi is not None and st.min is not None and st.min > hi) or (
                    lo is not None and st.max is not None and st.max < lo
                ):
                    may = False
                    break
            if may:
                match_rg += 1
                match_rows += rg.num_rows
                match_bytes += rg.total_byte_size
        return (
            uri, meta.num_row_groups, match_rg, tot_rows, match_rows,
            tot_bytes, match_bytes,
        )

    return _footer_scan(spark, path, per_file, _REPORT_SCHEMA, file_parallelism)


def pruning_summary(report: DataFrame) -> dict:
    """Collapse a ``scan_pruning_report`` frame to the scalar numbers a
    layout comparison wants: total/may-match row groups, rows, bytes,
    and the skipped fractions. One small agg; the collect is one row."""
    r = report.agg(
        F.sum("row_groups").alias("rg"),
        F.sum("may_match_row_groups").alias("rg_m"),
        F.sum("rows").alias("rows"),
        F.sum("may_match_rows").alias("rows_m"),
        F.sum("bytes").alias("bytes"),
        F.sum("may_match_bytes").alias("bytes_m"),
        F.count(F.lit(1)).alias("files"),
        F.sum(
            F.when(F.col("may_match_row_groups") == 0, 1).otherwise(0)
        ).alias("files_skipped"),
    ).collect()[0]
    return {
        "files": r["files"],
        "files_skipped": r["files_skipped"],
        "row_groups": r["rg"],
        "may_match_row_groups": r["rg_m"],
        "rows": r["rows"],
        "may_match_rows": r["rows_m"],
        "bytes": r["bytes"],
        "may_match_bytes": r["bytes_m"],
        "row_group_skip_fraction": (
            1.0 - r["rg_m"] / r["rg"] if r["rg"] else 0.0
        ),
        "byte_skip_fraction": (
            1.0 - r["bytes_m"] / r["bytes"] if r["bytes"] else 0.0
        ),
    }


# --------------------------------------------------------------------------
# clustering health + rebuild-on-degradation maintenance


def file_minmax_report(
    spark: SparkSession,
    path: str,
    cols: Sequence[str],
    file_parallelism: int | None = None,
) -> DataFrame:
    """Per-FILE bounding box over ``cols`` from parquet footers (row
    groups folded per file), on the same distributed footer-scan
    engine as ``scan_pruning_report``. Values surface as doubles. A
    file with no stats for a column gets NULL bounds (callers treat
    it as covering everything — conservative)."""
    cols = list(cols)
    schema = "path string, rows long, bytes long, " + ", ".join(
        f"{c}_min double, {c}_max double" for c in cols
    )

    def per_file(uri: str) -> tuple:
        meta = _open_parquet_meta(uri)
        names = _column_index_map(meta, cols, uri)
        tot_rows = tot_bytes = 0
        lo: dict[str, float | None] = {c: None for c in cols}
        hi: dict[str, float | None] = {c: None for c in cols}
        stats_ok = {c: True for c in cols}
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            tot_rows += rg.num_rows
            tot_bytes += rg.total_byte_size
            for c in cols:
                st = rg.column(names[c]).statistics
                if st is None or not st.has_min_max:
                    stats_ok[c] = False
                    continue
                mn, mx = float(st.min), float(st.max)
                lo[c] = mn if lo[c] is None else min(lo[c], mn)
                hi[c] = mx if hi[c] is None else max(hi[c], mx)
        row: list = [uri, tot_rows, tot_bytes]
        for c in cols:
            row += [
                lo[c] if stats_ok[c] else None,
                hi[c] if stats_ok[c] else None,
            ]
        return tuple(row)

    return _footer_scan(spark, path, per_file, schema, file_parallelism)


def clustering_health(report: DataFrame, cols: Sequence[str]) -> dict:
    """How clustered is the layout, judged from the per-file bounding
    boxes: ``mean_box_volume`` is the average fraction of the dataset's
    value space a single file's box covers (product over columns of
    normalized widths) — ~1/files for a fresh Z-order layout, →1.0 as
    unclustered appends accumulate; ``expected_may_match_files`` =
    files × mean volume is what a uniform point query must open.
    NULL bounds (no stats) count as full-width — conservative, like
    the pruning report. Constant columns (zero global width) count as
    width 1 so they neither rescue nor poison the metric;
    ``prunable_dims`` reports how many columns actually contributed
    (0 → the metric is degenerate and maintenance must not act on it).
    The footer scan runs ONCE: the report is persisted across the
    two aggs and released before returning."""
    cols = list(cols)
    cached = report.persist()
    try:
        g = cached.agg(
            *[F.min(f"{c}_min").alias(f"g_{c}_min") for c in cols],
            *[F.max(f"{c}_max").alias(f"g_{c}_max") for c in cols],
        ).collect()[0]
        vol: Column = F.lit(1.0)
        prunable = 0
        for c in cols:
            glo, ghi = g[f"g_{c}_min"], g[f"g_{c}_max"]
            if glo is None or ghi is None or ghi <= glo:
                continue  # no stats anywhere, or constant column: width 1
            prunable += 1
            width = (F.col(f"{c}_max") - F.col(f"{c}_min")) / F.lit(ghi - glo)
            vol = vol * F.coalesce(width, F.lit(1.0))
        r = cached.agg(
            F.avg(vol).alias("mean_vol"), F.count(F.lit(1)).alias("files")
        ).collect()[0]
    finally:
        cached.unpersist()
    mean_vol = float(r["mean_vol"])
    return {
        "files": r["files"],
        "mean_box_volume": mean_vol,
        "expected_may_match_files": mean_vol * r["files"],
        "prunable_dims": prunable,
    }


def maintain_zorder(
    spark: SparkSession,
    path: str,
    cols: Sequence[str] | None = None,
    rebuild_above: float = 0.25,
    n_buckets: int | None = None,
    n_files: int | None = None,
) -> dict:
    """Append-then-rebuild-on-degradation maintenance for a Z-ordered
    dataset — the layout twin of ``maintain_ann_index``: plain
    appends keep ingestion cheap but each appended file is an
    unclustered full-width box that selective scans can't skip; when
    ``mean_box_volume`` crosses ``rebuild_above`` the whole dataset is
    re-clustered in place through the same write-sibling / swap /
    validate / drop-backup crash contract as ``compact_parquet``
    (never run concurrently with a writer on the same path).

    Unspecified ``cols``/``n_buckets``/``n_files`` come from the
    dataset's ``_zorder_layout.json`` sidecar, so a bare
    ``maintain_zorder(spark, path)`` reproduces the ORIGINAL layout
    granularity instead of silently re-clustering with defaults;
    explicit arguments override the sidecar. A degenerate health
    reading (no prunable dimension — constant columns or statless
    files) never triggers a rebuild: re-clustering can't improve it.
    Returns the decision with before/after health so maintenance jobs
    can log their trigger."""
    from thundercats_spark.physical.io import Write

    meta = read_layout_meta(spark, path)
    if cols is None:
        if meta is None:
            raise ValueError(
                f"no cols given and no {_LAYOUT_META_FILE} sidecar under "
                f"{path!r} — pass cols explicitly for datasets not written "
                "by write_parquet_zorder"
            )
        cols = meta["cols"]
    if n_buckets is None:
        n_buckets = meta["n_buckets"] if meta else 64
    if n_files is None and meta:
        n_files = meta["n_files"]
    cols = list(cols)
    before = clustering_health(file_minmax_report(spark, path, cols), cols)
    out = {"health_before": before, "rebuilt": False}
    if before["prunable_dims"] == 0:
        out["reason"] = "degenerate: no prunable dimension, rebuild cannot help"
        return out
    if before["mean_box_volume"] <= rebuild_above:
        return out
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".zorder"
    write_parquet_zorder(
        df, tmp, cols, n_buckets=n_buckets, n_files=n_files, overwrite=True
    )
    Write._swap_validate(spark, path, tmp)
    out["rebuilt"] = True
    out["health_after"] = clustering_health(
        file_minmax_report(spark, path, cols), cols
    )
    return out
