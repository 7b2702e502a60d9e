package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-ORDER (Morton) interleaving, the
  * standard trick for making ONE physical sort order serve range
  * predicates on SEVERAL columns (Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Parquet scans prune on per-file/row-group min-max statistics. A table
  * sorted by column A prunes A-predicates perfectly and B-predicates not
  * at all — every file spans the full B range. Sorting by the bit-
  * interleaved z-value of (A, B) bounds EVERY file to a small rectangle
  * in (A, B) space, so range predicates on either column (or both) skip
  * most files. The cost is one range-partitioned sort at write time —
  * amortized over every subsequent scan, which is the right trade the
  * moment a 100 TB table is read more than once.
  *
  * Determinism: the z-value is pure BIGINT bit arithmetic
  * (`((a >> i) & 1) << 2i`, summed) — any engine reproduces it exactly,
  * which is what lets the bucket-statistics query carry a DuckDB oracle.
  */
object Layout {

  /** Morton z-value of two non-negative ints: bit i of `a` lands at even
    * position 2i, bit i of `b` at odd 2i+1. `bits` per input (≤ 31) —
    * values must fit, i.e. be < 2^bits (enforce upstream; high bits are
    * silently ignored by construction, exactly as in both engines).
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Order-preserving bin of `v ∈ [0, maxExclusive)` into `[0, 2^bits)` —
    * the rank-space normalization step before interleaving columns of
    * unequal magnitude (interleaving raw 15-bit part keys with 10-bit
    * supplier keys would zero the supplier's high interleave bits and
    * collapse the cells to one-dimensional slabs). Monotone, so file
    * min-max pruning on the raw column is preserved; exact double
    * arithmetic (products ≪ 2^53), so engines agree bit for bit.
    */
  def rankBin(v: Column, maxExclusive: Column, bits: Int): Column =
    floor(v.cast("double") * lit((1L << bits).toDouble) /
      maxExclusive.cast("double")).cast("long")

  /** The layout operation itself: range-partition by z-value into
    * `files` output files, sort within each, write parquet. Each file's
    * (a, b) min-max footer stats then bound a z-contiguous rectangle —
    * the pruning property [[zorderStats]] measures and `LayoutSpec`
    * asserts. At cluster scale this is the table-maintenance job that
    * runs after ingest compaction.
    */
  def writeZOrdered(df: DataFrame, path: String, aCol: String, bCol: String,
                    files: Int, bits: Int = 16): Unit =
    df.withColumn("zv", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(files, col("zv"))
      .sortWithinPartitions("zv")
      .drop("zv")
      .write.mode("overwrite").parquet(path)

  /** Layout-quality statistics: rows are assigned to the `4^cellPow`
    * Z-PREFIX cells of their z-value (`zv >> (2·bits - 2·cellPow)` — a
    * pure map-side shift, NOT a global sort: an ntile over a global
    * window would funnel the table through one partition, the exact
    * scale defect z-ordering exists to avoid) and each cell reports its
    * (a, b) bounding rectangle and row count. Sorted by a SINGLE column,
    * a file's other-column span stays ≈ the global span (no pruning);
    * z-cells bound BOTH spans to global/2^cellPow — the measurable
    * pruning property. One partial-combining aggregation; deterministic,
    * so oracle-checkable.
    */
  def zorderStats(df: DataFrame, aCol: String, bCol: String, cellPow: Int,
                  bits: Int = 16): DataFrame = {
    require(cellPow >= 1 && cellPow <= bits, "cellPow must be in [1, bits]")
    df.withColumn("zv", zValue(col(aCol), col(bCol), bits))
      .withColumn("cell", shiftright(col("zv"), 2 * bits - 2 * cellPow))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_rows"),
        min(aCol).cast("long").as("a_min"), max(aCol).cast("long").as("a_max"),
        min(bCol).cast("long").as("b_min"), max(bCol).cast("long").as("b_max"))
  }
}
