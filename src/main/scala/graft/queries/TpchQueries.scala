package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The remaining classic TPC-H query shapes over the driver testdata.
  * The schema has no partsupp table and no phone/comment columns, so
  * Q2/Q11/Q16/Q20 run over a DERIVED partsupp (one deterministic
  * aggregate over lineitem, mirrored verbatim in their oracles' WITH
  * block) and Q9/Q12/Q22 adapt their filter columns while keeping the
  * canonical plan shape. Together with Q3/Q4/Q5/Q10/Q17/Q18/Q21 in
  * [[MiscQueries]] this covers all 22 TPC-H shapes end-to-end under
  * the hash oracle.
  *
  * Exact-arithmetic discipline (the cross-engine lesson from rounds
  * 5-7): every revenue/charge aggregate sums in DECIMAL and casts to
  * DOUBLE only at the end; decimal DIVISION never happens (Spark and
  * DuckDB disagree on result scale), ratios divide as IEEE doubles;
  * triple products keep factor precisions small — DECIMAL(12,2) ×
  * DECIMAL(4,2) × DECIMAL(4,2) = scale 6, well under Spark's 38-digit
  * cap, so neither engine's precision-overflow rounding ever fires.
  * Threshold comparisons against an average are cross-multiplied
  * (x·n > sum, the Q17 trick) so no division rounding can flip a
  * boundary row.
  */
object TpchQueries {
  type Q = (SparkSession, String) => DataFrame

  private val D122 = DecimalType(12, 2)
  private val D42 = DecimalType(4, 2)
  private val D182 = DecimalType(18, 2)

  /** Output convention for large exact sums. A lineitem-wide scale-6
    * sum has 16-17 significant digits at sf1 — past DOUBLE's 15.95 — so
    * casting it to DOUBLE makes the result depend on WHICH engine
    * performs the decimal→double rounding (Spark's java.math
    * correctly-rounded conversion vs DuckDB's int128·10^-s multiply
    * differ by 1 ulp on ~half the inexact values; q_tpch_q1.sum_charge
    * flipped exactly this way at sf1). Emitting raw DECIMAL(38,s)
    * instead (round 8) broke the external comparator the OTHER way: it
    * reads the engine's parquet with pyarrow (decimal128 → Decimal
    * objects, str keeps trailing zeros) but the oracle through DuckDB's
    * .df() (→ float64, repr drops them), so bit-identical values never
    * hash-matched. The scale-proof convention is STRING: both engines
    * render a DECIMAL(38,s) as the same plain fixed-scale text
    * ("3652441.185600"), exact at any SF and identical under any
    * comparator dtype path. Decimal arithmetic stays internal; only
    * the OUTPUT column is text. Oracles mirror with
    * CAST(CAST(… AS DECIMAL(38,s)) AS VARCHAR). */
  private val D386 = DecimalType(38, 6)

  /** The exact-sum output cast: exact decimal, rendered as text. */
  private def outStr(c: Column): Column = c.cast(D386).cast(StringType)

  /** l_extendedprice · (1 − l_discount) in exact decimal, scale 4. */
  private def rev: Column =
    col("l_extendedprice").cast(D122) * (lit(1.0) - col("l_discount")).cast(D42)

  private def ts(s: String): Column = lit(s"$s 00:00:00").cast(TimestampType)

  val queries: Map[String, Q] = Map(
    // Q1 pricing summary: the canonical full-surface aggregate — 4 exact
    // decimal sums (incl. the 3-factor charge product), 3 averages
    // derived as double(sum)/count (no decimal division), one count —
    // all in ONE partial-aggregating pass over the fact scan. At 100 TB
    // this is the shape whose map-side combine matters most: 2 grouping
    // keys x ~8 states cross the exchange, not rows.
    "q_tpch_q1" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("2000-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          outStr(sum(col("l_quantity").cast(D122))).as("sum_qty"),
          outStr(sum(col("l_extendedprice").cast(D122))).as("sum_base_price"),
          outStr(sum(rev)).as("sum_disc_price"),
          outStr(sum(rev * (lit(1.0) + col("l_tax")).cast(D42)))
            .as("sum_charge"),
          (sum(col("l_quantity").cast(D122)).cast(DoubleType) / count(lit(1)))
            .as("avg_qty"),
          (sum(col("l_extendedprice").cast(D122)).cast(DoubleType) / count(lit(1)))
            .as("avg_price"),
          (sum(col("l_discount").cast(D42)).cast(DoubleType) / count(lit(1)))
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Q6 forecasting revenue change: the pure scan-aggregate — every
    // predicate (date range, discount band, quantity cap) must reach
    // the parquet reader as a pushed filter; one partial-combined row
    // per partition crosses to the single reduce.
    "q_tpch_q6" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          outStr(sum(col("l_extendedprice").cast(D122) * col("l_discount").cast(D42)))
            .as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Q7 volume shipping: the two-role dimension — nation joins the
    // fact TWICE (supplier side and customer side) under aliased
    // copies, with the symmetric pair filter as a post-join residual.
    // Broadcast hints go ONLY on the fixed-cardinality nation copies:
    // supplier/customer scale with SF (billions of rows at 100 TB), so
    // their join strategy is left to stats + AQE — broadcast when they
    // fit, shuffle on the equi key when they don't. A hard-coded
    // broadcast(customer) would OOM every executor at scale.
    "q_tpch_q7" -> ((s, dir) => {
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(outStr(sum(rev)).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q8 national market share: numerator and denominator of the share
    // ratio as two conditional sums in the SAME aggregate pass (no
    // second scan, no self-join); the ratio divides as doubles at the
    // end. Only the nation/region frames carry broadcast hints —
    // part/customer/supplier scale with SF, so AQE picks their side.
    "q_tpch_q8" -> ((s, dir) => {
      val nCust = Tables(s, dir, "nation")
        .join(Tables(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val nSupp = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part")
            .filter(col("p_type") === "STANDARD").select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "orders")
            .filter(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") < ts("1998-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nCust), col("c_nationkey") === col("cn_key"))
        .join(Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_2", rev)
              .otherwise(lit(0).cast(D122))).cast(DoubleType) /
            sum(rev).cast(DoubleType)).as("mkt_share"),
          outStr(sum(rev)).as("total_volume"))
        .orderBy("o_year")
    }),

    // Q9 product-type profit (adapted: no ps_supplycost in this schema,
    // so cost = 0.5 · p_retailprice · quantity — same two-sided exact
    // subtraction shape): profit grouped by the SUPPLIER's nation and
    // the order year. Part filter prunes before the fact join.
    "q_tpch_q9" -> ((s, dir) => {
      val profit = rev -
        (col("p_retailprice").cast(D122) * col("l_quantity").cast(D122) *
          lit(0.5).cast(D42))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part")
            .filter(col("p_name").contains("red"))
            .select("p_partkey", "p_retailprice"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(outStr(sum(profit)).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q12 shipping-mode priority (adapted: l_linestatus stands in for
    // l_shipmode): fact-to-fact equi join, then BOTH priority classes
    // as conditional counts in one aggregate pass over 2 groups.
    "q_tpch_q12" -> ((s, dir) => {
      val high = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "lineitem")
            .filter(col("l_shipdate") >= ts("1997-01-01") &&
              col("l_shipdate") < ts("1998-01-01"))
            .select("l_orderkey", "l_linestatus"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_linestatus").as("shipmode"))
        .agg(
          sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("shipmode")
    }),

    // Q13 customer order-count distribution: the two-level aggregate
    // over a LEFT OUTER join — customers with zero qualifying orders
    // must survive into the c_count=0 bucket (the outer-join-then-
    // count(col) null semantics), then the distribution re-groups by
    // the count itself. First shuffle on c_custkey, second on the tiny
    // count domain.
    "q_tpch_q13" -> ((s, dir) => {
      Tables(s, dir, "customer").select("c_custkey")
        .join(Tables(s, dir, "orders")
            .filter(col("o_orderpriority") =!= "1-URGENT")
            .select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q14 promo revenue: conditional-vs-total ratio in one pass over
    // the part-joined fact month; the percentage divides as doubles.
    "q_tpch_q14" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-09-01") &&
          col("l_shipdate") < ts("1997-10-01"))
        .join(Tables(s, dir, "part").select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(D122)))
              .cast(DoubleType) * lit(100.0) /
            sum(rev).cast(DoubleType)).as("promo_revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Q15 top supplier: the max-of-an-aggregate selection — revenue
    // per supplier for a quarter, then the argmax row(s) via a
    // broadcast single-row max joined back on exact DECIMAL equality
    // (double equality could drop or duplicate the winner).
    "q_tpch_q15" -> ((s, dir) => {
      val revenue = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1997-04-01"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(rev).as("total_exact"))
      revenue
        .join(broadcast(revenue.agg(max(col("total_exact")).as("max_exact"))),
          col("total_exact") === col("max_exact"))
        .join(Tables(s, dir, "supplier"),
          col("s_suppkey") === col("supplier_no"))
        .select(col("s_suppkey"), col("s_name"),
          outStr(col("total_exact")).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // Q19 discounted revenue: the disjunctive join — three OR'd
    // (brand × size × quantity) bands where part-side and fact-side
    // predicates interleave, so no single conjunct pushes below the
    // join; each band evaluates as a codegen'd join residual on the
    // p_partkey equi key.
    "q_tpch_q19" -> ((s, dir) => {
      val band = (col("p_brand") === "Brand#12" &&
          col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" &&
          col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#24" &&
          col("p_size").between(1, 35) && col("l_quantity").between(20, 30))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part").select("p_partkey", "p_brand", "p_size"),
          col("l_partkey") === col("p_partkey") && band)
        .agg(outStr(sum(rev)).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Q22 global sales opportunity (adapted: nation bands stand in for
    // phone country codes, and — since every customer in this testdata
    // has SOME order — the correlate is "no order since the cutoff",
    // the lapsed-customer form): customers above the positive-balance
    // average with no recent orders. The average-threshold compare is
    // cross-multiplied (bal · n_pos > bal_sum, exact decimal — the Q17
    // trick), the scalar aggregate broadcasts, and the recency
    // correlate is a LEFT ANTI on the date-filtered order side.
    "q_tpch_q22" -> ((s, dir) => {
      val bands: Seq[Any] = Seq(0, 5, 10, 15)
      val cust = Tables(s, dir, "customer")
        .filter(col("c_nationkey").isin(bands: _*))
      val avgRow = cust.filter(col("c_acctbal") > 0)
        .agg(sum(col("c_acctbal").cast(D182)).as("bal_sum"),
          count(lit(1)).as("n_pos"))
      cust.crossJoin(broadcast(avgRow))
        .filter(col("c_acctbal").cast(D182) * col("n_pos") > col("bal_sum"))
        .join(Tables(s, dir, "orders")
            .filter(col("o_orderdate") >= ts("2000-06-01"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          outStr(sum(col("c_acctbal").cast(D182))).as("totacctbal"))
        .orderBy("cntrycode")
    }),

    // ---- Q2/Q11/Q16/Q20: the partsupp family, over a DERIVED partsupp.
    // The testdata has no partsupp table, so one is derived
    // deterministically from the fact: availqty = all-time shipped
    // quantity, supplycost = cheapest observed unit-extended price, per
    // (part, supplier). Both engines derive it with the identical
    // aggregate (see the WITH block shared by the four oracles), so the
    // hash gate still verifies the QUERY shape end-to-end. At 100 TB
    // the derivation is one partial-combined aggregate over the fact —
    // the same exchange the real partsupp scan would replace.

    // Q2 minimum-cost supplier: the correlated-scalar-MIN shape. The
    // correlate decorrelates to a per-part MIN aggregate joined back on
    // (part, exact-decimal cost equality). Scale discipline: the part
    // filter applies BEFORE the min is computed — the per-part minimum
    // over region suppliers is unaffected by a part-side predicate, so
    // there is no reason to aggregate the 100 TB of parts the outer
    // query discards. nation⨝region broadcasts; supplier scales with SF
    // and is left to AQE.
    "q_tpch_q2" -> ((s, dir) => {
      val euroNations = Tables(s, dir, "nation")
        .join(Tables(s, dir, "region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cand = partsupp(s, dir)
        .join(Tables(s, dir, "supplier")
            .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey"),
          col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(euroNations), col("s_nationkey") === col("n_nationkey"))
        .join(Tables(s, dir, "part")
            .filter(col("p_size").isin(15, 25, 35) && col("p_type") === "LARGE")
            .select("p_partkey", "p_type"),
          col("ps_partkey") === col("p_partkey"))
      val minCost = cand.groupBy(col("ps_partkey").as("mc_partkey"))
        .agg(min(col("ps_supplycost")).as("min_cost"))
      cand
        .join(minCost, col("ps_partkey") === col("mc_partkey") &&
          col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_type"),
          col("ps_supplycost").cast(DoubleType).as("supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
    }),

    // Q11 important stock: GROUP BY ... HAVING sum > scalar-subquery.
    // The global total and the distinct-part count compute in ONE
    // broadcast single-row aggregate; the threshold ("25% above the
    // average part's value") is scale-free, so the predicate stays
    // meaningfully selective at every SF — a fixed fraction-of-total
    // would go degenerate as the part count grows. The compare runs in
    // IEEE doubles with identical association on both engines (the
    // decimal sums are exact; only the final threshold multiply is
    // floating) — a decimal×decimal compare here would overflow
    // DuckDB's 38-digit multiply.
    "q_tpch_q11" -> ((s, dir) => {
      val vals = partsupp(s, dir)
        .join(Tables(s, dir, "supplier")
            .join(broadcast(Tables(s, dir, "nation")
              .join(Tables(s, dir, "region")
                .filter(col("r_name") === "EUROPE"),
                col("n_regionkey") === col("r_regionkey"))),
              col("s_nationkey") === col("n_nationkey"))
            .select("s_suppkey"),
          col("ps_suppkey") === col("s_suppkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost") * col("ps_availqty")).as("val"))
      val byPart = vals.groupBy("ps_partkey")
        .agg(sum(col("val")).as("part_value"))
      val total = vals.agg(sum(col("val")).as("total_value"),
        countDistinct(col("ps_partkey")).as("n_parts"))
      byPart.crossJoin(broadcast(total))
        .filter(col("part_value").cast(DoubleType) * col("n_parts") >
          col("total_value").cast(DoubleType) * lit(1.25))
        .orderBy(col("part_value").desc, col("ps_partkey"))
        .select(col("ps_partkey"),
          outStr(col("part_value")).as("value"))
    }),

    // Q16 supplier-count by part description: NOT-IN exclusion (LEFT
    // ANTI on the complaint stand-in: negative-balance suppliers) into
    // a COUNT DISTINCT over three grouping columns. The distinct
    // dedups map-side on (brand,type,size,suppkey) before the final
    // exchange — at 100 TB the count-distinct shuffle carries one row
    // per surviving combination, not per partsupp row.
    "q_tpch_q16" -> ((s, dir) => {
      partsupp(s, dir)
        .join(Tables(s, dir, "supplier").filter(col("s_acctbal") < 0)
            .select("s_suppkey"),
          col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(Tables(s, dir, "part")
            .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
              col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
            .select("p_partkey", "p_brand", "p_type", "p_size"),
          col("ps_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Q20 excess-stock suppliers: the doubly-nested correlate —
    // s_suppkey IN (ps rows WHERE ps_partkey IN (name-filtered parts)
    // AND availqty > threshold·(correlated per-(part,supp) shipped
    // qty)). Decorrelated Spark-first: the inner name filter is a LEFT
    // SEMI, the correlated scalar aggregate is a grouped sum joined on
    // BOTH correlate keys, the outer IN is a LEFT SEMI on the distinct
    // survivor set. Threshold compare stays exact decimal (×2 integer
    // cross-multiply — availqty must exceed twice the window's shipped
    // quantity, i.e. under half the all-time volume moved in 1997).
    "q_tpch_q20" -> ((s, dir) => {
      val shipped = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .groupBy(col("l_partkey").as("sh_partkey"),
          col("l_suppkey").as("sh_suppkey"))
        .agg(sum(col("l_quantity").cast(D122)).cast(D182).as("qty_shipped"))
      val bigStock = partsupp(s, dir)
        .join(Tables(s, dir, "part")
            .filter(col("p_name").startsWith("small")).select("p_partkey"),
          col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(shipped, col("ps_partkey") === col("sh_partkey") &&
          col("ps_suppkey") === col("sh_suppkey"))
        .filter(col("ps_availqty") > col("qty_shipped") * lit(2))
        .select(col("ps_suppkey")).distinct()
      Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")
          .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
          .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(bigStock, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_name"), col("s_suppkey"), col("s_acctbal"))
        .orderBy("s_name")
    }))

  /** Derived partsupp (the testdata ships none): per (part, supplier),
    * availqty = all-time shipped quantity (exact decimal sum),
    * supplycost = cheapest observed extended price (exact decimal min).
    * Mirrors the WITH block in the Q2/Q11/Q16/Q20 oracles verbatim.
    */
  private def partsupp(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(sum(col("l_quantity").cast(D122)).cast(D182).as("ps_availqty"),
        min(col("l_extendedprice").cast(D122)).as("ps_supplycost"))

  /** Shared oracle CTE: the DuckDB-side derivation of partsupp. */
  private val PsCte =
    """WITH partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
      |      AS ps_availqty,
      |    min(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_tpch_q2" -> (PsCte +
      """,
        |cand AS (
        |  SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name,
        |    p_partkey, p_type
        |  FROM partsupp
        |  JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN part ON ps_partkey = p_partkey
        |  WHERE r_name = 'EUROPE' AND p_size IN (15, 25, 35)
        |    AND p_type = 'LARGE'),
        |mc AS (SELECT ps_partkey AS mc_partkey, min(ps_supplycost) AS min_cost
        |  FROM cand GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
        |  CAST(ps_supplycost AS DOUBLE) AS supplycost
        |FROM cand JOIN mc
        |  ON ps_partkey = mc_partkey AND ps_supplycost = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin),

    "q_tpch_q11" -> (PsCte +
      """,
        |v AS (
        |  SELECT ps_partkey, ps_supplycost * ps_availqty AS val
        |  FROM partsupp
        |  JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |tot AS (SELECT sum(val) AS total_value,
        |  count(DISTINCT ps_partkey) AS n_parts FROM v),
        |bp AS (SELECT ps_partkey, sum(val) AS part_value FROM v GROUP BY 1)
        |SELECT ps_partkey,
        |  CAST(CAST(part_value AS DECIMAL(38,6)) AS VARCHAR) AS value
        |FROM bp, tot
        |WHERE CAST(part_value AS DOUBLE) * n_parts
        |    > CAST(total_value AS DOUBLE) * 1.25
        |ORDER BY part_value DESC, ps_partkey""".stripMargin),

    "q_tpch_q16" -> (PsCte +
      """
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp
        |JOIN part ON ps_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND ps_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),

    "q_tpch_q20" -> (PsCte +
      """,
        |shipped AS (
        |  SELECT l_partkey AS sh_partkey, l_suppkey AS sh_suppkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
        |      AS qty_shipped
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2),
        |big AS (
        |  SELECT DISTINCT ps_suppkey
        |  FROM partsupp
        |  JOIN shipped ON ps_partkey = sh_partkey AND ps_suppkey = sh_suppkey
        |  WHERE ps_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |    AND ps_availqty > qty_shipped * 2)
        |SELECT s_name, s_suppkey, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |  AND s_suppkey IN (SELECT ps_suppkey FROM big)
        |ORDER BY s_name""".stripMargin),


    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_qty,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_base_price,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_disc_price,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * CAST(1.0 - l_discount AS DECIMAL(4,2))
        |   * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_tpch_q6" ->
      """SELECT
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS VARCHAR) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS INT) AS l_year,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS VARCHAR) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
        |     THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |       * CAST(1.0 - l_discount AS DECIMAL(4,2))
        |     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |   / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS mkt_share,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS VARCHAR) AS total_volume
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |     * CAST(1.0 - l_discount AS DECIMAL(4,2))
        |   - CAST(p_retailprice AS DECIMAL(12,2))
        |     * CAST(l_quantity AS DECIMAL(12,2))
        |     * CAST(0.5 AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_linestatus AS shipmode,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q14" ->
      """SELECT
        | CAST(sum(CASE WHEN p_type = 'PROMO'
        |     THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |       * CAST(1.0 - l_discount AS DECIMAL(4,2))
        |     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100.0
        |   / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
        |   AS promo_revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,

    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |      * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS total_exact
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  CAST(CAST(total_exact AS DECIMAL(38,6)) AS VARCHAR) AS total_revenue
        |FROM revenue
        |JOIN supplier ON s_suppkey = supplier_no
        |WHERE total_exact = (SELECT max(total_exact) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q19" ->
      """SELECT
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS VARCHAR) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q_tpch_q22" ->
      """WITH pos AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
        |    count(*) AS n_pos
        |  FROM customer
        |  WHERE c_acctbal > 0 AND c_nationkey IN (0, 5, 10, 15))
        |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS VARCHAR) AS totacctbal
        |FROM customer, pos
        |WHERE c_nationkey IN (0, 5, 10, 15)
        |  AND CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > bal_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-06-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
