"""Z-order (Morton) data layout for multi-dimensional file pruning.

At 100 TB the cheapest query is the one that never reads the file:
parquet min/max statistics prune whole files, but only for columns the
data is physically clustered on. Sorting on (a, b) clusters a and
scatters b; interleaving the BITS of a and b (the Morton / Z-order
curve) clusters BOTH, so range predicates on either column prune —
the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything here is pure codegen'd integer bit arithmetic (the classic
spread-bits multiply-mask ladder), identical in Spark and DuckDB, so
the curve itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits per dimension → 32-bit Morton codes; bucket = top bits of z.
ZORDER_DIM_BITS = 16
ZORDER_BUCKET_BITS = 8  # 256 buckets in the demo stats rollup

# (shift, mask) ladder spreading a 16-bit value to even bit positions
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def spread16(v: Column) -> Column:
    """Spread a 16-bit int's bits to the even positions of a 32-bit int."""
    x = v.bitwiseAND(F.lit(0xFFFF)).cast("long")
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def spread16_sql(e: str) -> str:
    """DuckDB twin of ``spread16`` for oracle composition."""
    x = f"(({e}) & 65535)"
    for shift, mask in _SPREAD:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def morton32(x: Column, y: Column) -> Column:
    """32-bit Morton code interleaving two 16-bit dimensions
    (x in even bits, y in odd bits)."""
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1)).cast("long")


def morton32_sql(ex: str, ey: str) -> str:
    return f"({spread16_sql(ex)} | ({spread16_sql(ey)} << 1))"


def _with_z(df: DataFrame, xc: str, yc: str) -> DataFrame:
    """Append ``__z``: the Morton code of (xc, yc) min-max normalized
    onto the full 16-bit grid. Without normalization a narrow-domain
    column leaves the curve's high bits constant and the interleave
    degenerates into a plain sort on the wider column. The bounds come
    from one single-row aggregate broadcast back — the same two-pass
    shape Delta's OPTIMIZE uses (with sampling) for its range IDs."""
    rng = df.agg(
        F.min(xc).alias("__x0"),
        F.max(xc).alias("__x1"),
        F.min(yc).alias("__y0"),
        F.max(yc).alias("__y1"),
    )
    g = (1 << ZORDER_DIM_BITS) - 1
    x16 = F.expr(f"(({xc} - __x0) * {g}) div greatest(__x1 - __x0, 1)")
    y16 = F.expr(f"(({yc} - __y0) * {g}) div greatest(__y1 - __y0, 1)")
    return (
        df.crossJoin(F.broadcast(rng))
        .withColumn("__z", morton32(x16, y16))
        .drop("__x0", "__x1", "__y0", "__y1")
    )


def zorder_layout(
    df: DataFrame, x: Column, y: Column, n_partitions: int
) -> DataFrame:
    """Physically cluster ``df`` on the Z-curve of (x, y): range-partition
    by the normalized Morton code, sort within partitions. Writing the
    result gives files whose min/max statistics are tight on BOTH
    dimensions — range predicates on either column prune files. One
    single-row stats pass, one range-exchange (with its sampling pass),
    one local sort; no further shuffles."""
    helper = {"__zx", "__zy", "__z", "__x0", "__x1", "__y0", "__y1"}
    if helper & set(df.columns):
        raise ValueError(f"columns collide with z-order helpers: {helper & set(df.columns)}")
    out = _with_z(
        df.withColumn("__zx", x.cast("long")).withColumn(
            "__zy", y.cast("long")
        ),
        "__zx",
        "__zy",
    )
    return (
        out.repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__zx", "__zy")
    )


def zorder_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    bucket_bits: int = ZORDER_BUCKET_BITS,
) -> DataFrame:
    """Per-Z-bucket clustering statistics: min-max normalize both
    dimensions onto the full 16-bit grid (otherwise narrow-domain
    columns leave the curve's high bits constant and every row lands in
    one bucket), bucket the Morton code on its top ``bucket_bits`` bits,
    and report count + min/max of each RAW dimension per bucket.

    Tight per-bucket spans on BOTH dims are exactly what the
    file-pruning argument needs — and this frame is the oracle-checkable
    surface of the curve math. The normalization bounds come from one
    single-row aggregate broadcast back (the same two-pass shape Delta's
    OPTIMIZE uses, with sampling, to pick its range boundaries); then
    one projection + one groupBy. All integer arithmetic (truncating
    div on non-negative offsets), engine-portable."""
    shift = 2 * ZORDER_DIM_BITS - bucket_bits
    pts = df.select(x.cast("long").alias("x"), y.cast("long").alias("y"))
    return (
        _with_z(pts, "x", "y")
        .select(
            F.shiftright(F.col("__z"), shift).cast("long").alias("zbucket"),
            "x",
            "y",
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


LAYOUT_N_FILES = 64
# predicate selectivity, permille of each dimension's value range
LAYOUT_PRED_PERMILLE = 20


def layout_prune_compare(
    df: DataFrame,
    x: Column,
    y: Column,
    n_files: int = LAYOUT_N_FILES,
    pred_permille: int = LAYOUT_PRED_PERMILLE,
) -> DataFrame:
    """The layout advisor: quantify what zone-map (min/max) file
    pruning each physical layout would deliver for range predicates on
    EITHER dimension — the decision input behind ``zorder_layout``
    ("is interleaving worth it for THIS table, or does one sort key
    dominate?").

    Simulates three layouts over the same rows, ``n_files`` files each:
    ``zorder`` (files = equal slices of the normalized Morton curve),
    ``by_x`` and ``by_y`` (files = equal value-range slices of one
    column — the plain sorted layout). For each, builds the per-file
    zone maps (min/max of both dims) and evaluates two mid-range
    predicates (a ``pred_permille``-of-range band on x, same on y),
    counting files and rows a zone-map-pruning scan must read. The
    expected read-out: by_x prunes the x predicate perfectly and the y
    predicate not at all, by_y the mirror, zorder prunes BOTH
    sub-linearly — the case for the interleave.

    Scale shape: one single-row min/max aggregate broadcast back; one
    projection exploding each row into its 3 (layout, file) assignments
    (a codegen'd generator — NOT three scans); one groupBy to the
    3·n_files zone-map frame; the predicate evaluation runs over that
    tiny frame. All integer arithmetic, engine-portable.

    Returns (layout, predicate, n_files, files_scanned, rows_total,
    rows_scanned).
    """
    pts = df.select(x.cast("long").alias("x"), y.cast("long").alias("y"))
    zed = _with_z(pts, "x", "y").select("x", "y", "__z")
    z_bits = 2 * ZORDER_DIM_BITS
    rng = pts.agg(
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
        F.min("y").alias("y0"),
        F.max("y").alias("y1"),
    )
    nf = int(n_files)
    if nf & (nf - 1):
        raise ValueError("n_files must be a power of two (z-slicing)")
    z_shift = z_bits - (nf.bit_length() - 1)
    assigned = (
        zed.crossJoin(F.broadcast(rng))
        .select(
            "x",
            "y",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("zorder").alias("layout"),
                        F.shiftright(F.col("__z"), z_shift)
                        .cast("long")
                        .alias("file_id"),
                    ),
                    F.struct(
                        F.lit("by_x").alias("layout"),
                        F.expr(
                            f"((x - x0) * {nf}) div greatest(x1 - x0 + 1, 1)"
                        )
                        .cast("long")
                        .alias("file_id"),
                    ),
                    F.struct(
                        F.lit("by_y").alias("layout"),
                        F.expr(
                            f"((y - y0) * {nf}) div greatest(y1 - y0 + 1, 1)"
                        )
                        .cast("long")
                        .alias("file_id"),
                    ),
                )
            ).alias("a"),
        )
        .select("x", "y", "a.layout", "a.file_id")
    )
    zones = assigned.groupBy("layout", "file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("x").alias("fx0"),
        F.max("x").alias("fx1"),
        F.min("y").alias("fy0"),
        F.max("y").alias("fy1"),
    )
    # mid-range band predicates, pred_permille of each dim's range wide
    p = int(pred_permille)
    zp = zones.crossJoin(F.broadcast(rng)).select(
        "*",
        F.expr(f"x0 + ((x1 - x0) * {500 - p // 2}) div 1000").alias("px_lo"),
        F.expr(f"x0 + ((x1 - x0) * {500 + p // 2}) div 1000").alias("px_hi"),
        F.expr(f"y0 + ((y1 - y0) * {500 - p // 2}) div 1000").alias("py_lo"),
        F.expr(f"y0 + ((y1 - y0) * {500 + p // 2}) div 1000").alias("py_hi"),
    )
    preds = zp.select(
        "layout",
        "n_rows",
        F.explode(
            F.array(
                F.struct(
                    F.lit("x_band").alias("predicate"),
                    ((F.col("fx0") <= F.col("px_hi"))
                     & (F.col("fx1") >= F.col("px_lo"))).alias("keep"),
                ),
                F.struct(
                    F.lit("y_band").alias("predicate"),
                    ((F.col("fy0") <= F.col("py_hi"))
                     & (F.col("fy1") >= F.col("py_lo"))).alias("keep"),
                ),
            )
        ).alias("p"),
    ).select("layout", "n_rows", "p.predicate", "p.keep")
    return preds.groupBy("layout", "predicate").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("files_scanned"),
        F.sum("n_rows").cast("long").alias("rows_total"),
        F.sum(F.when(F.col("keep"), F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
    )
