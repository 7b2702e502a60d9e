package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the dbt-style `not_null` /
  * `unique` / `accepted_range` / `relationships` test battery, run as a
  * handful of Spark passes instead of one query per rule.
  *
  * Rule evaluation is grouped by shape:
  *  - ALL row-level rules (not-null, check predicates) fold into ONE
  *    aggregation pass over the table — `sum(violated)` per rule in a
  *    single codegen'd HashAggregate, unpivoted with `stack`. Adding a
  *    rule adds a column to the pass, not a scan.
  *  - each UNIQUE rule is one groupBy on its key: violations = rows in
  *    excess of one per key (`Σ max(cnt-1, 0)`), i.e. 0 on a clean key.
  *  - each FOREIGN-KEY rule is one left-anti join against the parent
  *    key set: violations = child rows with a non-null key absent from
  *    the parent. The parent side is `distinct` on the key only —
  *    broadcastable for dimension-sized parents; key-hash shuffle
  *    otherwise (and bucket-co-located under the Warehouse layout).
  *
  * At 100 TB: one full scan for every row rule combined, plus one
  * shuffle per unique/FK rule — the same cost profile as the queries a
  * warehouse would already run, with no driver-side row movement.
  * Output: (rule_name, n_violations), one row per rule.
  */
object DataQuality {

  sealed trait Rule { def name: String }
  /** `col IS NULL` is a violation. */
  final case class NotNull(name: String, column: String) extends Rule
  /** Row predicate that must HOLD; a false (or null) result is a
    * violation — null-hostile on purpose: an unevaluable check is a
    * failed check.
    */
  final case class Check(name: String, predicate: Column) extends Rule
  /** More than one row per key. */
  final case class Unique(name: String, columns: Seq[String]) extends Rule
  /** Non-null child key must exist in the parent key set. */
  final case class ForeignKey(name: String, columns: Seq[String],
                              parent: DataFrame, parentColumns: Seq[String]) extends Rule

  private def violated(r: Rule): Column = r match {
    case NotNull(_, c)  => col(c).isNull
    case Check(_, p)    => !coalesce(p, lit(false))
    case _              => lit(false)
  }

  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val rowRules = rules.collect { case r @ (_: NotNull | _: Check) => r }
    val frames = Seq.newBuilder[DataFrame]
    if (rowRules.nonEmpty) {
      val aggs = rowRules.map(r =>
        sum(when(violated(r), 1L).otherwise(0L)).as(r.name))
      val stacked = rowRules.map(r => s"'${r.name}', ${r.name}").mkString(", ")
      frames += df.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${rowRules.size}, $stacked) AS (rule_name, n_violations)")
    }
    rules.foreach {
      case Unique(name, cols0) =>
        frames += df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("cnt"))
          .agg(coalesce(sum(greatest(col("cnt") - 1, lit(0L))), lit(0L)).as("n_violations"))
          .select(lit(name).as("rule_name"), col("n_violations"))
      case ForeignKey(name, cols0, parent, pcols) =>
        val keyed = df.filter(cols0.map(c => col(c).isNotNull).reduce(_ && _))
        val pkeys = parent.select(pcols.zip(cols0).map { case (p, c) => col(p).as(c) }: _*)
          .distinct()
        frames += keyed.join(pkeys, cols0, "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("rule_name"), col("n_violations"))
      case _ => ()
    }
    frames.result().reduce(_ unionAll _)
  }

  /** Row-level gate: every row tagged with the names of the row rules
    * (not-null / check) it fails — empty array means clean. The
    * split-into-quarantine pattern: `filter(size(failed)=0)` proceeds,
    * the rest lands in a reject table with its reasons attached. Pure
    * map-side; unique/FK rules are table-level and live in [[audit]].
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rowRules = rules.collect { case r @ (_: NotNull | _: Check) => r }
    require(rowRules.nonEmpty, "quarantine needs at least one row-level rule")
    val failed = array(rowRules.map(r =>
      when(violated(r), lit(r.name)).otherwise(lit(null))): _*)
    df.withColumn("failed_rules", filter(failed, _.isNotNull))
  }

  /** Tags every event with which HALF of the table's day range it falls
    * in (0 = first half, 1 = second): the self-sufficient "did the data
    * shift?" split — the span is a single-row broadcast, so no second
    * scan and nothing data-sized crosses the join.
    */
  private def withHalf(events: DataFrame, tsCol: String): DataFrame = {
    val day = col(tsCol).cast("date")
    val span = events.agg(min(day).as("d0"), max(day).as("d1"))
    events.crossJoin(broadcast(span))
      .withColumn("half",
        when(datediff(day, col("d0")) * 2 <= datediff(col("d1"), col("d0")),
          lit(0)).otherwise(lit(1)))
  }

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV drift test, exact: per series, the
    * max ECDF gap between the first and second half of the time range,
    * on values quantized to cents — D·10⁴ = (10⁴ · max|c₁N₂ − c₂N₁|)
    * div (N₁N₂), where c are cumulative counts over the sorted value
    * histogram. The quantization is what makes this 100 TB-shaped: the
    * per-series cumsum window runs over the CENT histogram (bounded by
    * the value range), never the event log — and KS of the binned
    * distributions is itself exact (D of the true ECDFs differs by at
    * most the mass inside one cent). Wide products run in
    * DECIMAL(38,0); HUGEINT mirrors them in the oracle.
    */
  def ksDrift(events: DataFrame, tsCol: String = "ts",
              typeCol: String = "event_type",
              valueCol: String = "value"): DataFrame = {
    val hist = withHalf(events, tsCol)
      .groupBy(col(typeCol).as("event_type"),
        floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("bigint").as("v"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("h1"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("h2"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    hist
      .withColumn("c1", sum(col("h1")).over(wCum))
      .withColumn("c2", sum(col("h2")).over(wCum))
      .withColumn("n1", sum(col("h1")).over(wAll))
      .withColumn("n2", sum(col("h2")).over(wAll))
      .withColumn("term", abs(col("c1").cast("decimal(38,0)") * col("n2") -
        col("c2").cast("decimal(38,0)") * col("n1")))
      .groupBy("event_type")
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(col("term")).as("mx"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .select(col("event_type"), col("n1"), col("n2"),
        expr("""CAST((CAST(10000 AS DECIMAL(38,0)) * mx)
                div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)""")
          .as("ks_bp"))
  }

  /** WASSERSTEIN-1 (earth-mover) drift, exact: per series, the area
    * between the two halves' ECDFs over the cent histogram — the
    * integral companion to [[ksDrift]]'s max gap (KS sees the worst
    * point; W₁ sees total displaced mass, in value units). With cumsum
    * counts c over sorted cent values and gap Δv to the next value,
    * W₁ · N₁N₂ = Σ |c₁N₂ − c₂N₁| · Δv exactly (beyond the last value
    * both CDFs are 1, contributing nothing), emitted as
    * w1_centi_cents = (100 · Σ) div (N₁N₂) — W₁ in hundredths of a
    * cent. Same scale shape as [[ksDrift]]: everything after the one
    * log aggregation runs over the bounded cent histogram.
    */
  def wassersteinDrift(events: DataFrame, tsCol: String = "ts",
                       typeCol: String = "event_type",
                       valueCol: String = "value"): DataFrame = {
    val hist = withHalf(events, tsCol)
      .groupBy(col(typeCol).as("event_type"),
        floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("bigint").as("v"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("h1"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("h2"))
    val ord = Window.partitionBy(col("event_type")).orderBy(col("v"))
    val wCum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    hist
      .withColumn("c1", sum(col("h1")).over(wCum))
      .withColumn("c2", sum(col("h2")).over(wCum))
      .withColumn("dv", lead(col("v"), 1).over(ord) - col("v"))
      .withColumn("n1", sum(col("h1")).over(wAll))
      .withColumn("n2", sum(col("h2")).over(wAll))
      .withColumn("term",
        abs(col("c1").cast("decimal(38,0)") * col("n2") -
          col("c2").cast("decimal(38,0)") * col("n1")) *
          coalesce(col("dv"), lit(0L)))
      .groupBy("event_type")
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(col("term")).as("area"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .select(col("event_type"), col("n1"), col("n2"),
        expr("""CAST((CAST(100 AS DECIMAL(38,0)) * area)
                div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)""")
          .as("w1_centi_cents"))
  }

  /** POPULATION STABILITY INDEX drift terms: how the event-type MIX
    * shifted between the two halves of the time range. Shares are
    * emitted both exactly (basis points, integral) and as the classic
    * PSI contribution (p₁−p₂)·ln(p₁/p₂) per type at round(…, 6) — the
    * shares themselves are single IEEE divides of exact counts, so the
    * one libm `ln` is the only inexact op and the rounding absorbs it
    * (the corr-matrix determinism recipe). A type absent from either
    * half yields a null psi_term (its classic PSI is undefined) while
    * the exact shares still report. Σ of the terms is the headline PSI;
    * emitting per-type terms keeps the gate free of order-dependent
    * double summation AND tells the operator which segment moved.
    */
  def psiDrift(events: DataFrame, tsCol: String = "ts",
               typeCol: String = "event_type"): DataFrame = {
    val perType = withHalf(events, tsCol)
      .groupBy(col(typeCol).as("event_type"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n2"))
    val tot = perType.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    val p1 = col("n1").cast("double") / col("t1").cast("double")
    val p2 = col("n2").cast("double") / col("t2").cast("double")
    perType.crossJoin(broadcast(tot))
      // A corpus spanning a single day puts every row in half 0, so
      // t2 = 0 — guard each integral div so the degenerate case reports
      // a null share (DuckDB `//` by 0 is NULL) instead of throwing
      // under ANSI mode, the same degradation ksDrift/wassersteinDrift
      // already have via their n1 > 0 AND n2 > 0 filters.
      .select(col("event_type"), col("n1"), col("n2"),
        when(col("t1") > 0, expr("(10000 * n1) div t1")).as("share1_bp"),
        when(col("t2") > 0, expr("(10000 * n2) div t2")).as("share2_bp"),
        when(col("n1") > 0 && col("n2") > 0,
          round((p1 - p2) * log(p1 / p2), 6)).as("psi_term"))
  }
}
