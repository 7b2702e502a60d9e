package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an aggregate materialized view — the
  * warehouse pattern that turns the reference's nightly full-table
  * report rebuild (`/root/reference/main.py` recomputes report №1/№2
  * from the whole fact table every run) into a delta-sized refresh.
  *
  * A view is declared over ALGEBRAIC measures only (count / sum / min /
  * max — the self-mergeable aggregates Spark itself uses for partial
  * aggregation; avg is sum/count at read time). The stored MV row is the
  * PARTIAL state per group, so a refresh is: aggregate the delta
  * (delta-sized shuffle), union with the stored MV (group-cardinality-
  * sized, not base-sized), and re-merge. Cost ∝ |delta| + |groups|; the
  * 100 TB base table is never rescanned. With the MV stored bucketed on
  * the group key (Warehouse layout), the merge plans with no MV-side
  * Exchange, exactly like the SCD1 dim merge.
  *
  * Append-only deltas: min/max are NOT subtractable, so (like every
  * production incremental-view engine's algebraic tier) retractions
  * require either a full rebuild or count-carrying deletion handling on
  * the sum/count subset — documented, not hidden.
  */
object MaterializedAgg {

  sealed trait Kind
  case object Count extends Kind
  case object Sum extends Kind
  case object Min extends Kind
  case object Max extends Kind

  /** DISTINCT COUNT, the measure that breaks the naive MV story — it is
    * not algebraic over raw values (distinct users in b ∪ d ≠ distinct
    * in b + distinct in d), so an exact MV would have to store the
    * value SETS. The standard at-scale answer is storing an HLL SKETCH
    * per group instead: registers merge by max, which IS algebraic, so
    * the sketch column rides the exact same build/merge algebra as a
    * sum — refresh stays delta-sized, and the estimate is read out at
    * query time ([[readView]]). Spark's DataSketches implementation
    * gives merge-invariance by construction (same registers whether
    * built whole or unioned from any split — spec-asserted), at the
    * documented ~1–2% relative error of `lgConfigK = 12`.
    */
  case object ApproxDistinct extends Kind

  /** A named measure: output column `name` = `kind` over `expr`. */
  final case class Measure(name: String, expr: Column, kind: Kind)

  private def build(m: Measure): Column = (m.kind match {
    case Count          => count(m.expr)
    case Sum            => sum(m.expr)
    case Min            => min(m.expr)
    case Max            => max(m.expr)
    case ApproxDistinct => hll_sketch_agg(m.expr)
  }).as(m.name)

  /** Merge function for an already-partial column: counts and sums add;
    * min/max re-minimize; HLL sketches union (register max). This is
    * exactly Spark's own partial-merge algebra, expressed relationally
    * so it can run across refreshes.
    */
  private def merge(m: Measure): Column = (m.kind match {
    case Count | Sum    => sum(col(m.name))
    case Min            => min(col(m.name))
    case Max            => max(col(m.name))
    case ApproxDistinct => hll_union_agg(col(m.name))
  }).as(m.name)

  /** Build the view from scratch (initial load, or a forced rebuild). */
  def aggregate(base: DataFrame, keys: Seq[String], measures: Seq[Measure]): DataFrame =
    base.groupBy(keys.map(col): _*).agg(build(measures.head), measures.tail.map(build): _*)

  /** Refresh the stored view with an APPENDED delta. The base table is
    * not an input — only the delta and the (small) stored state are.
    * Identity: refresh(aggregate(b), d) == aggregate(b ∪ d) for any
    * split (spec-asserted, and the `q_mv_refresh` oracle recomputes the
    * full aggregate).
    */
  def refresh(mv: DataFrame, delta: DataFrame, keys: Seq[String],
              measures: Seq[Measure]): DataFrame = {
    val deltaAgg = aggregate(delta, keys, measures)
    mv.select((keys ++ measures.map(_.name)).map(col): _*)
      .unionAll(deltaAgg.select((keys ++ measures.map(_.name)).map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(merge(measures.head), measures.tail.map(merge): _*)
  }

  /** Reader projection over the stored view: exact measures pass
    * through; sketch columns surface as their BIGINT estimate. The MV
    * stores STATE, readers want ANSWERS — this is the boundary.
    */
  def readView(mv: DataFrame, keys: Seq[String],
               measures: Seq[Measure]): DataFrame =
    mv.select(keys.map(col) ++ measures.map { m =>
      m.kind match {
        case ApproxDistinct => hll_sketch_estimate(col(m.name)).as(m.name)
        case _              => col(m.name)
      }
    }: _*)

  // -------------------------------------------------------------------
  // Incremental QUANTILES — the measure that is not algebraic over raw
  // values but IS algebraic one grain finer: a histogram at (keys ×
  // value bucket) is just a count view, so it refreshes delta-sized
  // with the machinery above, and quantiles read out of the stored
  // buckets at query time. Exact at bucket resolution (the engine's
  // bounded-histogram discipline — `text_quantile`'s trade, made
  // incremental), deterministic, oracle-checkable — where a mergeable
  // float sketch (t-digest/KLL) would be none of those.
  // -------------------------------------------------------------------

  /** Order-preserving bucketization: `v` floored to its `width`-wide
    * bucket's lower edge. The resolution/size lever: buckets per key =
    * value range / width. Computed as `v − ((v mod w) + w) mod w` (the
    * floor-mod identity) rather than `floor(v/w)·w` through DOUBLE:
    * the double route rounds integral values above 2^53 (epoch-nanos
    * magnitudes) before bucketizing, so a value just under a bucket
    * edge could land in the neighbor bucket — mod arithmetic stays in
    * the column's own type and is exact for integral inputs.
    */
  def bucketize(v: Column, width: Long): Column =
    (v - ((v % width) + width) % width).cast("long")

  /** Declare the histogram view: a count per (keys × bucket of
    * `valueCol`). Refresh with [[refresh]] over the SAME compound key —
    * the histogram is a plain algebraic view one grain finer.
    */
  def quantileView(base: DataFrame, keys: Seq[String], valueCol: String,
                   width: Long): DataFrame =
    aggregate(base.withColumn("bucket", bucketize(col(valueCol), width)),
      keys :+ "bucket", Seq(Measure("n", lit(1), Count)))

  /** Quantile readout: for each requested q, the smallest stored
    * bucket whose cumulative count reaches rank ceil(q·total) —
    * `quantile_disc` at bucket resolution. Output columns `p<q·100>`.
    * One window + one aggregate over the (small) stored view.
    */
  def readQuantiles(view: DataFrame, keys: Seq[String],
                    qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs must be in (0, 1]")
    val cum = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket"))
    val tot = Window.partitionBy(keys.map(col): _*)
    val c = view
      .withColumn("cum", sum(col("n")).over(cum))
      .withColumn("total", sum(col("n")).over(tot))
    val outs = qs.map { q =>
      // rank = ceil(q·total) in EXACT decimal: the double product can
      // land one ulp above an integral value (0.07·100 = 7.000…001 in
      // IEEE) and ceil then overshoots the rank by one. The literal is
      // built from the double's shortest decimal form — the "0.07" the
      // caller wrote — so decimal·long is exact and ceil is too.
      val qDec = new java.math.BigDecimal(java.lang.Double.toString(q))
      min(when(col("cum") >= ceil(lit(qDec) * col("total")), col("bucket")))
        .as(s"p${math.round(q * 100)}")
    }
    c.groupBy(keys.map(col): _*).agg(outs.head, outs.tail: _*)
  }
}
