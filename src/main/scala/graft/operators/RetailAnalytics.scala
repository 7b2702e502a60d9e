package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sales-mining operators over the order/lineitem star — market-basket
  * association pairs and RFM customer segmentation. Like the rest of
  * the engine these stay exactly integral end to end (counts, day
  * diffs, cents, basis points) so an oracle can hash-gate them.
  */
object RetailAnalytics {

  /** MARKET-BASKET PAIR ASSOCIATIONS: for every pair of items bought
    * together in at least `minSupport` orders, the co-occurrence count
    * and the LIFT (observed co-rate over the independence expectation)
    * in integer basis points — the "frequently bought together" /
    * cross-sell table, mined without any a-priori candidate pass
    * because pair support over a basket table IS one self-join.
    *
    * Plan shape: baskets dedup to (order, item) once, then the pair
    * expansion is an equi self-join on the ORDER key — both sides the
    * same frame, so the planner reuses one exchange — producing
    * O(k²/2) rows per order where k is basket size (TPC-H baskets are
    * ≤7 lines; a retail feed is tens — bounded, never corpus²). The
    * support filter runs BEFORE the per-item count joins, so only
    * surviving pairs shuffle again. Item counts join by key (the item
    * dimension is not assumed broadcastable at 100 TB); the global
    * order count is a single-row broadcast.
    *
    * Lift in bp = (10000·support·n_orders) div (c_a·c_b), computed in
    * BIGINT — exact while support·n_orders < 9.2e14 (i.e. past any
    * bench SF; a planet-scale feed would lift the product into
    * DECIMAL(38,0) before the divide, same plan).
    */
  def pairAssociations(lines: DataFrame, orderCol: String = "l_orderkey",
                       itemCol: String = "l_partkey",
                       minSupport: Long = 2L): DataFrame = {
    val baskets = lines
      .select(col(orderCol).as("ok"), col(itemCol).as("pk")).distinct()
    val nOrders = baskets.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemCnt = baskets.groupBy(col("pk")).agg(count(lit(1)).as("c"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("item_a"), col("b.pk").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(itemCnt.withColumnRenamed("pk", "item_a")
        .withColumnRenamed("c", "c_a"), "item_a")
      .join(itemCnt.withColumnRenamed("pk", "item_b")
        .withColumnRenamed("c", "c_b"), "item_b")
      .crossJoin(broadcast(nOrders))
      .select(col("item_a"), col("item_b"), col("support"),
        expr("(10000 * support * n_orders) div (c_a * c_b)").as("lift_bp"))
  }

  /** EQUAL-FREQUENCY BUCKETS over an integral column, as a value→bucket
    * map: bucket(v) = least(k, 1 + (k · |rows strictly below v|) div N).
    * Ties always share a bucket (deterministic — no ntile row-splitting
    * that depends on partition layout), and the global sort runs over
    * the VALUE HISTOGRAM, not the data: the one single-partition window
    * touches |distinct values| rows, which the caller keeps bounded
    * (day counts, order counts, whole dollars), never entity
    * cardinality. This is what makes quantile scoring viable at 100 TB
    * where a global ntile over entities would be one task sorting
    * everything.
    */
  def eqFreqBuckets(vals: DataFrame, valueCol: String, k: Int): DataFrame = {
    val w = Window.orderBy(col("v"))
    val hist = vals.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("n"))
    hist
      .withColumn("cum_lt", coalesce(
        sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("total", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("v"),
        least(lit(k), lit(1) + expr(s"($k * cum_lt) div total"))
          .cast("int").as("bucket"))
  }

  /** RFM SEGMENTATION: customers scored 1..k on Recency (days since
    * last order, relative to the newest order in the table), Frequency
    * (order count) and Monetary (lifetime spend in whole dollars), each
    * by equal-frequency bucket; output is the segment grid — customer
    * count and total cents per (r, f, m) cell, at most k³ rows. Higher
    * is always better (r = k means most recent).
    *
    * Plan shape: ONE aggregation of the order log on the customer key
    * builds the per-customer frame; the three bucket maps are
    * histogram-sized (≤ distinct days / counts / dollars) and broadcast
    * back onto it; the anchor date is a single-row broadcast. Money is
    * exact cents (floor(p·100+0.5), the one double product both engines
    * round identically); the monetary histogram is keyed on DOLLARS
    * (cents div 100) to bound its cardinality by price range rather
    * than by customers.
    */
  def rfm(orders: DataFrame, custCol: String = "o_custkey",
          dateCol: String = "o_orderdate", priceCol: String = "o_totalprice",
          k: Int = 5): DataFrame = {
    val per = orders.groupBy(col(custCol).as("cust"))
      .agg(max(col(dateCol).cast("date")).as("last_d"),
        count(lit(1)).as("freq"),
        sum(floor(col(priceCol) * lit(100.0) + lit(0.5)).cast("bigint"))
          .as("cents"))
    val anchor = orders.agg(max(col(dateCol).cast("date")).as("anchor_d"))
    val base = per.crossJoin(broadcast(anchor))
      .select(col("cust"), datediff(col("anchor_d"), col("last_d")).as("rec"),
        col("freq"), col("cents"), expr("cents div 100").as("dollars"))
    def bucketsOf(c: String) =
      broadcast(eqFreqBuckets(base.select(col(c)), c, k))
    base
      .join(bucketsOf("rec").withColumnRenamed("v", "rec")
        .withColumnRenamed("bucket", "b_rec"), "rec")
      .join(bucketsOf("freq").withColumnRenamed("v", "freq")
        .withColumnRenamed("bucket", "b_freq"), "freq")
      .join(bucketsOf("dollars").withColumnRenamed("v", "dollars")
        .withColumnRenamed("bucket", "b_dol"), "dollars")
      .select(
        (lit(k + 1) - col("b_rec")).as("r"),
        col("b_freq").as("f"), col("b_dol").as("m"), col("cents"))
      .groupBy("r", "f", "m")
      .agg(count(lit(1)).as("customers"), sum(col("cents")).as("cents"))
  }

  /** PARETO / REVENUE-CONCENTRATION DECILES: customers bucketed into
    * spend deciles (1 = biggest spenders), with each decile's share of
    * total revenue and the running "top-d deciles hold X%" curve, both
    * in exact basis points — the "do 20% of customers carry 80%?" view.
    *
    * Deciles come from [[eqFreqBuckets]] over the NEGATED whole-dollar
    * histogram (desc order, ties share a bucket), so the one global
    * window sorts |distinct dollar values| rows, never customers; the
    * cumulative curve is a window over at most 10 decile rows.
    */
  def paretoDeciles(orders: DataFrame, custCol: String = "o_custkey",
                    priceCol: String = "o_totalprice",
                    k: Int = 10): DataFrame = {
    val per = orders.groupBy(col(custCol).as("cust"))
      .agg(sum(floor(col(priceCol) * lit(100.0) + lit(0.5)).cast("bigint"))
        .as("cents"))
      .withColumn("neg_dollars", -expr("cents div 100"))
    val buckets = broadcast(
      eqFreqBuckets(per.select(col("neg_dollars")), "neg_dollars", k))
    val byDecile = per
      .join(buckets.withColumnRenamed("v", "neg_dollars")
        .withColumnRenamed("bucket", "decile"), "neg_dollars")
      .groupBy("decile")
      .agg(count(lit(1)).as("customers"), sum(col("cents")).as("cents"))
    val cum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    byDecile
      .withColumn("total", sum(col("cents")).over(all))
      .withColumn("cum", sum(col("cents")).over(cum))
      // an all-zero-spend corpus makes total = 0: shares of nothing are
      // undefined → null (the gini/hhi degenerate-divide convention)
      .select(col("decile"), col("customers"), col("cents"),
        when(col("total") > 0, expr("(10000 * cents) div total"))
          .as("share_bp"),
        when(col("total") > 0, expr("(10000 * cum) div total"))
          .as("cum_share_bp"))
  }

  /** GINI COEFFICIENT of customer spend, exact basis points: G =
    * (2·Σ rᵢxᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted values —
    * computed WITHOUT a per-entity rank. Grouping to the whole-dollar
    * histogram, a tie run of c equal values starting at global rank r₀
    * contributes v·(c·r₀ + c(c−1)/2) to Σ rᵢxᵢ (the rank sum inside a
    * run is arithmetic, and equal values make the order inside the run
    * irrelevant), so one histogram window yields the exact rank-weighted
    * sum. Wide products run in DECIMAL(38,0) — n·Σx overflows BIGINT
    * long before a 100 TB order log runs out of customers.
    */
  def gini(orders: DataFrame, custCol: String = "o_custkey",
           priceCol: String = "o_totalprice"): DataFrame = {
    val hist = orders.groupBy(col(custCol).as("cust"))
      .agg(sum(floor(col(priceCol) * lit(100.0) + lit(0.5)).cast("bigint"))
        .as("cents"))
      .groupBy(expr("cents div 100").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
    hist
      .withColumn("r0", coalesce(sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + 1L)
      .select(col("v"), col("c"), col("r0"))
      .agg(sum(col("c")).as("n_cust"),
        sum(col("v").cast("decimal(38,0)") * col("c")).as("s"),
        sum(col("v").cast("decimal(38,0)") *
          (col("c") * col("r0") + expr("(c * (c - 1)) div 2")))
          .as("rank_sum"))
      // If every customer's spend rounds to $0, s = 0 and the DECIMAL
      // div would throw under ANSI mode while DuckDB yields NULL —
      // emit null for the degenerate corpus (Gini of an all-zero
      // distribution is undefined), same convention as
      // Similarity.cosine's zero-norm guard.
      .select(col("n_cust"), col("s").cast("long").as("dollars"),
        when(col("s") > 0,
          expr("""CAST((CAST(10000 AS DECIMAL(38,0)) *
                   (2 * rank_sum - (n_cust + 1) * s))
                  div (CAST(n_cust AS DECIMAL(38,0)) * s) AS BIGINT)"""))
          .as("gini_bp"))
  }

  /** HERFINDAHL–HIRSCHMAN INDEX of customer-spend concentration per
    * market segment, exact: HHI·10⁸ = (10⁸ · Σ cᵢ²) div (Σ cᵢ)² over
    * per-customer whole-dollar spend cᵢ within the segment — 10⁸ = a
    * monopoly, 10⁸/n = perfect fragmentation. One shuffle to the
    * (segment, customer) grain, one to the segment; squares and the
    * scaled divide run in DECIMAL(38,0).
    */
  def hhi(orders: DataFrame, segCol: String = "o_orderpriority",
          custCol: String = "o_custkey",
          priceCol: String = "o_totalprice"): DataFrame = {
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    orders.groupBy(col(segCol).as("segment"), col(custCol).as("cust"))
      .agg(sum(floor(col(priceCol) * lit(100.0) + lit(0.5)).cast("bigint"))
        .as("cents"))
      .withColumn("dollars", expr("cents div 100"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_cust"),
        sum(d(col("dollars"))).as("s"),
        sum(d(col("dollars")) * d(col("dollars"))).as("ssq"))
      // Same zero-total-spend guard as gini: HHI over an all-zero
      // segment is undefined → null, not an ANSI divide-by-zero.
      .select(col("segment"), col("n_cust"),
        when(col("s") > 0,
          expr("""CAST((CAST(100000000 AS DECIMAL(38,0)) * ssq)
                  div (s * s) AS BIGINT)""")).as("hhi"))
  }
}
