package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row whose
  * timestamp is ≤ the left timestamp (per key) — the standard
  * time-series enrichment operator (trades→quotes, clicks→last
  * purchase).
  *
  * Composed from built-ins (preference order (a) of the engine
  * guidelines): tag both sides, union, ONE window sort per key carrying
  * the last-seen right payload forward (`last(_, ignoreNulls)` over an
  * unbounded-preceding frame), then keep the left rows. Cost: a single
  * shuffle+sort on (key, time) — the same lower bound a dedicated
  * merge-join implementation would have, with no custom SparkPlan to
  * maintain. At 100 TB both sides hash-partition by key; skewed keys
  * fall to AQE.
  *
  * Right-side payload columns are nullable in the output (no match ⇒
  * null, left-outer semantics).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its `valueCols` are carried)
    * @param keys       equi-join key columns (same names both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param valueCols  right columns to attach
    * @param strict     if true, match `rightTime < leftTime` (strictly
    *                   before); default allows equality
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, valueCols: Seq[String],
           strict: Boolean = false): DataFrame = {
    val t = "__asof_t"
    // at equal times the right row must sort BEFORE the left row to be
    // visible in the frame (non-strict), AFTER it to be excluded (strict)
    val side = "__asof_side"
    val leftSide = 1
    val rightSide = if (strict) 2 else 0
    val l = left.withColumn(t, col(leftTime)).withColumn(side, lit(leftSide))
      .select(keys.map(col) ++ Seq(col(t), col(side)) ++
        left.columns.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right.withColumn(t, col(rightTime)).withColumn(side, lit(rightSide))
      .select(keys.map(col) ++ Seq(col(t), col(side)) ++
        left.columns.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .select(
        (keys.map(col) :+ col(t) :+ col(side)) ++
          left.columns.filterNot(keys.contains).map(c => col(s"__l_$c")) ++
          valueCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w)
            .as(s"__v_$c")): _*)
      .filter(col(side) === leftSide)
    carried.select(
      keys.map(col) ++
        left.columns.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        valueCols.map(c => col(s"__v_$c").as(s"asof_$c")): _*)
  }
}
