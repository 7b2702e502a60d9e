package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric statistics beyond per-group moments — the feature-analysis
  * passes an ML-preprocessing pipeline runs over a table before
  * training on it.
  */
object Stats {

  /** Pairwise Pearson correlation of `cols`, all pairs in ONE
    * aggregation pass: per column the sum and sum-of-squares, per pair
    * the cross-product sum — every term a DECIMAL (exact, associative,
    * order-free, partial-combining), so the single HashAggregate
    * streams at scan speed and the result is deterministic under any
    * partitioning. The final correlations are computed from those exact
    * sums in double (`round(…, 6)` absorbs the ≤1-ulp decimal→double
    * conversion difference between engines — the q_stats_moments rule).
    *
    * Output: (col_a, col_b, corr), one row per unordered pair, derived
    * from the single aggregate row via array-explode (no driver math,
    * no second pass). k columns cost k(k+3)/2 aggregate buffers in one
    * scan — at 100 TB that is one pass over the table regardless of k,
    * where calling `stat.corr` per pair would scan it k(k-1)/2 times.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String], scale: Int = 4): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for {
      (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1)
    } yield (a, b)
    def d(c: String): Column = col(c).cast(DecimalType(18, scale))
    val aggs: Seq[Column] = (count(lit(1)).as("n") +:
      cols.map(c => sum(d(c)).as(s"s_$c"))) ++
      cols.map(c => sum(d(c) * d(c)).as(s"ss_$c")) ++
      pairs.map { case (a, b) => sum(d(a) * d(b)).as(s"sp_${a}_$b") }
    def dbl(c: String): Column = col(c).cast(DoubleType)
    val n = col("n").cast(DoubleType)
    val rows = pairs.map { case (a, b) =>
      val cov = n * dbl(s"sp_${a}_$b") - dbl(s"s_$a") * dbl(s"s_$b")
      val va = n * dbl(s"ss_$a") - dbl(s"s_$a") * dbl(s"s_$a")
      val vb = n * dbl(s"ss_$b") - dbl(s"s_$b") * dbl(s"s_$b")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        round(cov / (sqrt(va) * sqrt(vb)), 6).as("corr"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.col_a"), col("r.col_b"), col("r.corr"))
  }
}
