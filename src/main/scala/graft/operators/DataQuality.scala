package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
