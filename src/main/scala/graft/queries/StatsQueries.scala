package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical / reshaping operators: pivot, exact moments from decimal
  * power sums, exact interpolated percentiles. Portability rule as
  * everywhere: aggregation happens in exact arithmetic (DECIMAL sums,
  * sorted exact inputs), the final scalar math is a fixed op sequence.
  */
object StatsQueries {
  type Q = (SparkSession, String) => DataFrame

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q_corr_matrix oracle, generated from the same pair list the
    * operator derives — one exact-decimal aggregate row, six corr
    * branches off it (mirrors Stats.corrMatrix term for term).
    */
  private val corrOracle: String = {
    val cs = Seq("l_quantity" -> "q", "l_extendedprice" -> "e",
      "l_discount" -> "d", "l_tax" -> "t")
    // DECIMAL(30,…): DuckDB executes width-18 decimals in int64, so an
    // 18-width product overflows on real prices; width 30 forces the
    // int128 path. Values are exact integers either way, so parity with
    // Spark's (18,4)→(37,8) product arithmetic is unaffected.
    def dd(c: String) = s"CAST($c AS DECIMAL(30,4))"
    val sums = cs.map { case (c, a) =>
      s"sum(${dd(c)}) AS s_$a, sum(${dd(c)} * ${dd(c)}) AS ss_$a" }
    val pairs = for { ((ca, a), i) <- cs.zipWithIndex; (cb, b) <- cs.drop(i + 1) }
      yield (ca, a, cb, b)
    val sps = pairs.map { case (ca, a, cb, b) =>
      s"sum(${dd(ca)} * ${dd(cb)}) AS sp_$a$b" }
    def dbl(x: String) = s"CAST($x AS DOUBLE)"
    val branches = pairs.map { case (ca, a, cb, b) =>
      s"""SELECT '$ca' AS col_a, '$cb' AS col_b,
         | round((${dbl("n")} * ${dbl(s"sp_$a$b")} - ${dbl(s"s_$a")} * ${dbl(s"s_$b")}) /
         |  (sqrt(${dbl("n")} * ${dbl(s"ss_$a")} - ${dbl(s"s_$a")} * ${dbl(s"s_$a")}) *
         |   sqrt(${dbl("n")} * ${dbl(s"ss_$b")} - ${dbl(s"s_$b")} * ${dbl(s"s_$b")})), 6) AS corr
         |FROM g""".stripMargin
    }
    s"""WITH g AS (
       | SELECT count(*) AS n,
       |  ${(sums ++ sps).mkString(",\n  ")}
       | FROM lineitem)
       |${branches.mkString("\nUNION ALL\n")}
       |ORDER BY col_a, col_b""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    // PIVOT: one column per event type, decimal-exact sums
    "q_pivot" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", eventTypes)
        .agg(sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType))
        .orderBy("user_id")),

    // pairwise Pearson correlations of the lineitem numerics, all six
    // pairs from ONE aggregation pass of exact decimal sums
    "q_corr_matrix" -> ((s, dir) =>
      graft.operators.Stats.corrMatrix(Tables(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")),

    // per-group OLS: extendedprice regressed on quantity per return
    // flag — slope/intercept/R² from one exact-decimal aggregate pass
    "q_regression" -> ((s, dir) =>
      graft.operators.Stats.olsFit(Tables(s, dir, "lineitem"),
          Seq("l_returnflag"), x = "l_quantity", y = "l_extendedprice")
        .orderBy("l_returnflag")),

    // moments from exact decimal power sums: mean and sample variance
    "q_stats_moments" -> ((s, dir) => {
      val v = col("value").cast(DecimalType(18, 6))
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(v).as("s1"), sum(v * v).as("s2"))
        .select(col("event_type"), col("n"),
          // round(…, 6): wide-decimal → double conversion can differ by
          // 1 ulp between engines; 6-decimal rounding absorbs it
          round(col("s1").cast(DoubleType) / col("n").cast(DoubleType), 6).as("mean"),
          round((col("s2").cast(DoubleType) -
            col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / col("n").cast(DoubleType))
            / (col("n") - 1).cast(DoubleType), 6).as("variance"))
        .orderBy("event_type")
    }),

    // CUBE: all grouping-set combinations
    "q_cube" -> ((s, dir) =>
      Tables(s, dir, "events")
        .cube("event_type", "user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first, col("user_id").asc_nulls_first)),

    // exact interpolated percentiles (Spark `percentile` == DuckDB
    // quantile_cont: both interpolate a + f*(b-a) over the sorted set)
    "q_percentile" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.5)").as("med"),
          expr("percentile(o_totalprice, 0.95)").as("p95"))
        .orderBy("o_orderstatus")),

    // distinct-count sketch (linear counting): occupancy of a fixed
    // 4096-slot md5 bucket table per group — the integer-exact
    // sufficient statistic; the -m*ln(1-V/m) estimate is a downstream
    // scalar (ln is libm-dependent, so the gate stays on the integers)
    "q_distinct_sketch" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % 4096")
            .as("bucket"))
        .groupBy("l_returnflag")
        .agg(countDistinct(col("bucket")).as("n_occupied"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // deterministic count-min sketch: per-key over-estimates from a
    // 4x256 counter grid hashed via fixed md5 chunks (heavy hitters at
    // sketch cost; see graft.operators.Sketches)
    "q_cms_heavy" -> ((s, dir) =>
      graft.operators.Sketches
        .countMinEstimates(Tables(s, dir, "lineitem"), "l_partkey", width = 256)
        .orderBy("k")))

  val oracles: Map[String, String] = Map(
    "q_pivot" -> {
      val cols = eventTypes.map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS \"$t\"")
        .mkString(",\n  ")
      s"""SELECT user_id,
         |  $cols
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    "q_corr_matrix" -> corrOracle,

    // mirrors Stats.olsFit term for term: exact DECIMAL sufficient
    // statistics (width 30 → DuckDB's int128 path, the corrOracle
    // lesson), closed-form slope/intercept/R² in double, round(…, 6)
    "q_regression" ->
      """WITH g AS (
        | SELECT l_returnflag, count(*) AS n,
        |  sum(CAST(l_quantity AS DECIMAL(30,4))) AS sx,
        |  sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS sy,
        |  sum(CAST(l_quantity AS DECIMAL(30,4)) * CAST(l_quantity AS DECIMAL(30,4))) AS sxx,
        |  sum(CAST(l_quantity AS DECIMAL(30,4)) * CAST(l_extendedprice AS DECIMAL(30,4))) AS sxy,
        |  sum(CAST(l_extendedprice AS DECIMAL(30,4)) * CAST(l_extendedprice AS DECIMAL(30,4))) AS syy
        | FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        | CASE WHEN n >= 2 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0 THEN
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END AS slope,
        | CASE WHEN n >= 2 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0 THEN
        |  round((CAST(sy AS DOUBLE) -
        |        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE))
        |        / CAST(n AS DOUBLE), 6) END AS intercept,
        | CASE WHEN n >= 2 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
        |       AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <> 0 THEN
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
        |        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |         (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) END AS r2
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "q_stats_moments" ->
      """WITH a AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,6))) AS s1,
        |    sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS s2
        |  FROM events GROUP BY 1)
        |SELECT event_type, n,
        |  round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |  round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |    / CAST(n - 1 AS DOUBLE), 6) AS variance
        |FROM a ORDER BY event_type""".stripMargin,

    "q_cube" ->
      """SELECT event_type, user_id, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY CUBE(event_type, user_id)
        |ORDER BY event_type NULLS FIRST, user_id NULLS FIRST""".stripMargin,

    "q_percentile" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS med,
        |  quantile_cont(o_totalprice, 0.95) AS p95
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_distinct_sketch" ->
      """SELECT l_returnflag,
        |  count(DISTINCT
        |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT % 4096)
        |    AS n_occupied,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cms_heavy" ->
      """WITH base AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
        |dd AS (SELECT unnest(generate_series(0, 3)) AS d),
        |contrib AS (
        |  SELECT b.k, dd.d,
        |    ('0x' || substr(md5(b.k), 1 + 8 * dd.d, 8))::BIGINT % 256 AS bucket
        |  FROM base b CROSS JOIN dd),
        |counters AS (SELECT d, bucket, count(*) AS cnt FROM contrib GROUP BY 1, 2),
        |keys AS (
        |  SELECT k, dd.d,
        |    ('0x' || substr(md5(k), 1 + 8 * dd.d, 8))::BIGINT % 256 AS bucket
        |  FROM (SELECT DISTINCT k FROM base) CROSS JOIN dd)
        |SELECT keys.k, min(c.cnt) AS est_count
        |FROM keys JOIN counters c ON c.d = keys.d AND c.bucket = keys.bucket
        |GROUP BY 1 ORDER BY k""".stripMargin)
}
