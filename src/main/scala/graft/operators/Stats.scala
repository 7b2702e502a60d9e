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

  /** Per-group ordinary least squares of `y` on `x` — slope, intercept
    * and R² from the closed-form normal equations, the feature/target
    * screening fit an ML pipeline runs per segment before training.
    *
    * Same exactness discipline as [[corrMatrix]]: the five sufficient
    * statistics (Σx, Σy, Σx², Σxy, Σy²) accumulate as DECIMALs in ONE
    * partial-combining HashAggregate — exact, associative, order-free,
    * so the result is deterministic under any partitioning and the
    * scan streams once regardless of group count. Only the final
    * scalar arithmetic runs in double (`round(…, 6)` absorbing ≤1-ulp
    * decimal→double conversion differences between engines).
    *
    * Groups with < 2 rows or zero x-variance have no defined line —
    * they surface with null slope/intercept/r2 rather than dropping
    * (losing a segment silently would corrupt any downstream report).
    */
  def olsFit(df: DataFrame, keys: Seq[String], x: String, y: String,
             scale: Int = 4): DataFrame = {
    val dx = col(x).cast(DecimalType(18, scale))
    val dy = col(y).cast(DecimalType(18, scale))
    val grouped = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"), sum(dx).as("sx"), sum(dy).as("sy"),
      sum(dx * dx).as("sxx"), sum(dx * dy).as("sxy"), sum(dy * dy).as("syy"))
    def dbl(c: String): Column = col(c).cast(DoubleType)
    val n = dbl("n")
    val num = n * dbl("sxy") - dbl("sx") * dbl("sy")
    val den = n * dbl("sxx") - dbl("sx") * dbl("sx")
    val deny = n * dbl("syy") - dbl("sy") * dbl("sy")
    val defined = col("n") >= 2 && den =!= 0.0
    val slope = num / den
    grouped.select(keys.map(col) :+ col("n") :+
      when(defined, round(slope, 6)).as("slope") :+
      when(defined, round((dbl("sy") - slope * dbl("sx")) / n, 6)).as("intercept") :+
      when(defined && deny =!= 0.0, round(num * num / (den * deny), 6)).as("r2"): _*)
  }
}
