package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Column-level data-quality profiling — the "know your table before you
  * train on it" pass every ingestion pipeline runs: per column, the row
  * count, null count, exact distinct count, and min/max (stringified so
  * heterogeneous column types share one output schema).
  *
  * Shape: ONE aggregation over the table produces every metric — no
  * per-column scans. The row is then unpivoted driver-free with `stack`.
  * The exact distinct counts make Spark plan an Expand (one scan,
  * shuffle volume ×(k+1) for k profiled columns): right for a profile
  * you gate data on, since an approximate distinct can hide a
  * key-uniqueness violation. For routine 100 TB monitoring swap
  * `count_distinct` for `approx_count_distinct` and the whole profile
  * collapses to a fully partial-combining single exchange.
  *
  * Timestamps are formatted `yyyy-MM-dd HH:mm:ss` (engine-portable);
  * everything else stringifies via CAST after the typed min/max, so
  * numeric ordering is preserved (min("10") < min("9") is the bug this
  * avoids).
  */
object Profiler {

  private def asString(c: Column, isTimestamp: Boolean): Column =
    if (isTimestamp) date_format(c, "yyyy-MM-dd HH:mm:ss") else c.cast("string")

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val isTs = cols.map(c => c ->
      (types(c) == TimestampType || types(c) == TimestampNTZType)).toMap
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        count_distinct(col(c)).as(s"${c}__nd"),
        asString(min(col(c)), isTs(c)).as(s"${c}__mn"),
        asString(max(col(c)), isTs(c)).as(s"${c}__mx"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stacked = cols
      .map(c => s"'$c', `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`")
      .mkString(", ")
    row.select(col("__total"),
        expr(s"stack(${cols.size}, $stacked) AS (col_name, nn, n_distinct, min_s, max_s)"))
      .select(col("col_name"), col("__total").as("n_rows"),
        (col("__total") - col("nn")).as("n_nulls"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
