package graft.queries

import graft.Tables
import graft.etl.{Scd1, Scd2, Scd3}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational operators from SURVEY.md §2 expressed over the
  * driver testdata (TESTDATA.md), each with a DuckDB oracle.
  *
  * Determinism rules for oracle hash-matching:
  *  - double aggregation is order-dependent → cast inputs to DECIMAL
  *    before SUM (exact, associative) and cast the result back to DOUBLE;
  *  - time arithmetic in whole microseconds (`unix_micros` / `epoch_us`)
  *    then a single division — identical bit patterns in both engines;
  *  - every ORDER BY carries a unique tiebreak key.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame
  private def dec(c: String) = col(c).cast(DecimalType(18, 2))

  val queries: Map[String, Q] = Map(
    // ---- A: aggregation (TPC-H Q1 shape; SURVEY §2.5 + engine-complete group-by)
    "q_agg_pricing" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          sum(dec("l_extendedprice")).cast(DoubleType).as("sum_price"),
          sum(dec("l_extendedprice") * (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2)))
            .cast(DoubleType).as("revenue"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- P: projection + filter pushed to the parquet scan (SURVEY §2.3)
    "q_scan_prune" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01 00:00:00").cast(TimestampType))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- J5: multi-hop left-outer chain + group (reports №1/№2 join shape)
    "q_join_multihop" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"), "left")
        .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_rows"),
          sum(dec("l_extendedprice")).cast(DoubleType).as("sum_price"))
        .orderBy(col("r_name").asc_nulls_first)
    }),

    // ---- J8: semi join (IN-subquery)
    "q_semi_join" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // Bloom-pruned semi join: lineitem (big) is filtered by a
    // deterministic md5-chunk Bloom filter built from the small orders
    // subset BEFORE the join — no false negatives, so the oracle is the
    // plain semi-join SQL
    "q_bloom_semi" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val small = Tables(s, dir, "orders").filter(col("o_orderkey") % 97 === 0)
      graft.operators.BloomJoin.semi(li, small, "l_orderkey", "o_orderkey")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"))
        .orderBy("l_orderkey")
    }),

    // ---- J1/J3: anti join (new-rows / delete detection)
    "q_anti_join" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1995-03-01 00:00:00").cast(TimestampType))
        .select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // ---- W1/W2: lag window + epoch-hours arithmetic (fraud report №3 core)
    "q_window_lag" -> ((s, dir) => {
      // both lags in ONE select — interleaved withColumn projections
      // would block CollapseWindow and leave two Window execs in the plan
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          ((unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
            .cast(DoubleType) / lit(3.6e9)).as("hours_since"))
        .orderBy("event_id")
    }),

    // ---- sliding ROWS frames + ntile + first_value: the moving-average
    // family. Values quantized to BIGINT (floor(v·1e6)) so the moving
    // sum is order-free-exact in both engines; one partition+order →
    // one Window exec for all four frames (CollapseWindow)
    "q_window_moving" -> ((s, dir) => {
      val vq = expr("CAST(floor(value * 1e6) AS BIGINT)")
      val base = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val w3 = base.rowsBetween(-2, 0)
      val wf = base.rowsBetween(Window.unboundedPreceding, 0)
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), vq.as("v_q"),
          count(lit(1)).over(w3).as("mov_cnt"),
          sum(vq).over(w3).as("mov_sum"),
          first(vq).over(wf).as("first_q"),
          ntile(4).over(base).cast(LongType).as("quartile"))
        .orderBy("event_id")
    }),

    // ---- time-RANGE frames: rolling 1-hour count/sum per user over
    // the event-time axis (the frame family ROWS can't express when
    // sampling is irregular). Values quantized to BIGINT so the moving
    // sum is order-free-exact; both frames share one Window exec
    "q_window_range" -> ((s, dir) => {
      val vq = expr("CAST(floor(value * 1e6) AS BIGINT)")
      val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0)
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(vq).over(w).as("sum_1h"))
        .orderBy("event_id")
    }),

    // ---- K4+K6+K7: the SCD1 merge itself, driven through graft.etl.Scd1.
    // dim = customer as-is; snapshot = customer with 10% of keys deleted,
    // every 7th balance changed, every 11th segment nulled (value→null
    // change detection), plus synthetic new keys (insert path).
    "q_scd1_merge" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val dim = c.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      val snapshot = c.filter(col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(100.0))
            .otherwise(col("c_acctbal")).as("c_acctbal"),
          when(col("c_custkey") % 11 === 0, lit(null).cast(StringType))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"))
        .unionAll(c.filter(col("c_custkey") % 13 === 0)
          .select(col("c_custkey") + lit(1000000L), col("c_name"),
            col("c_acctbal"), col("c_mktsegment")))
      Scd1.mergeTagged(dim, snapshot, Seq("c_custkey"),
          Seq("c_name", "c_acctbal", "c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // ---- SCD3 limited history: same snapshot recipe as the Type-1
    // merge, dim seeded with a planted prev on every 5th balance; each
    // tracked column's prev takes the outgoing value on change and
    // carries over otherwise
    "q_scd3_merge" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val dim = c.select(col("c_custkey"), col("c_acctbal"),
        col("c_mktsegment"),
        when(col("c_custkey") % 5 === 0, col("c_acctbal") - lit(50.0))
          .as("prev_c_acctbal"),
        lit(null).cast(StringType).as("prev_c_mktsegment"))
      val snapshot = c.filter(col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(100.0))
            .otherwise(col("c_acctbal")).as("c_acctbal"),
          when(col("c_custkey") % 11 === 0, lit(null).cast(StringType))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"))
        .unionAll(c.filter(col("c_custkey") % 13 === 0)
          .select(col("c_custkey") + lit(1000000L), col("c_acctbal"),
            col("c_mktsegment")))
      Scd3.merge(dim, snapshot, Seq("c_custkey"),
          Seq("c_acctbal", "c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // ---- SCD2 historization (Type-1 merge's natural extension): day-1
    // initial load (%13 keys held out as day-2 inserts), then a day-2
    // snapshot with the SCD1 mutation recipe (%10 deleted, %7 balance
    // bump, %11 segment nulled). History rows carry validity intervals.
    "q_scd2_merge" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val day1 = c.filter(col("c_custkey") % 13 =!= 0)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      val day2 = c.filter(col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(100.0))
            .otherwise(col("c_acctbal")).as("c_acctbal"),
          when(col("c_custkey") % 11 === 0, lit(null).cast(StringType))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"))
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
      val h1 = Scd2.initial(day1, Seq("c_custkey"),
        Seq("c_name", "c_acctbal", "c_mktsegment"), t1)
      Scd2.merge(h1, day2, Seq("c_custkey"),
          Seq("c_name", "c_acctbal", "c_mktsegment"), t2)
        .orderBy("c_custkey", "valid_from")
    }),

    // ---- SCD2 net-effect change feed: what changed between the two
    // load times, as insert/delete/update rows with before/after attrs
    "q_scd2_changes" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val day1 = c.filter(col("c_custkey") % 13 =!= 0)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      val day2 = c.filter(col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(100.0))
            .otherwise(col("c_acctbal")).as("c_acctbal"),
          when(col("c_custkey") % 11 === 0, lit(null).cast(StringType))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"))
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
      val hist = Scd2.merge(
        Scd2.initial(day1, Seq("c_custkey"),
          Seq("c_name", "c_acctbal", "c_mktsegment"), t1),
        day2, Seq("c_custkey"), Seq("c_name", "c_acctbal", "c_mktsegment"), t2)
      Scd2.changesBetween(hist, Seq("c_custkey"), t1, t2)
        .orderBy("c_custkey")
    }),

    // ---- SCD2 point-in-time enrichment: orders pick the customer
    // VERSION valid at o_orderdate from a two-load history (loads at
    // 1995-01-01 / 1996-01-01 inside the order-date range, so facts
    // land before the first load, between loads, and after deletes)
    "q_scd2_pit" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val day1 = c.filter(col("c_custkey") % 13 =!= 0)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      val day2 = c.filter(col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(100.0))
            .otherwise(col("c_acctbal")).as("c_acctbal"),
          when(col("c_custkey") % 11 === 0, lit(null).cast(StringType))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"))
      val t1 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
      val t2 = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
      val hist = Scd2.merge(
        Scd2.initial(day1, Seq("c_custkey"),
          Seq("c_name", "c_acctbal", "c_mktsegment"), t1),
        day2, Seq("c_custkey"), Seq("c_name", "c_acctbal", "c_mktsegment"), t2)
      val facts = Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
      Scd2.pointInTimeJoin(facts, hist, Seq("o_custkey"), Seq("c_custkey"),
          "o_orderdate")
        .select("o_orderkey", "o_custkey", "o_orderdate",
          "c_acctbal", "c_mktsegment", "valid_from", "is_current")
        .orderBy("o_orderkey")
    }),

    // ---- K8/J4: idempotent fact append (anti-join dedup)
    "q_fact_append" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val fact = o.filter(col("o_orderdate") < lit("1995-01-01 00:00:00").cast(TimestampType))
      val inc = o.filter(col("o_orderdate") < lit("1996-01-01 00:00:00").cast(TimestampType))
      val newRows = inc.join(fact.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      fact.unionAll(newRows)
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .orderBy("o_orderkey")
    }),

    // ---- A1/K9: watermark scalar — coalesce(max(update), max(create))
    "q_watermark" -> ((s, dir) => {
      Tables(s, dir, "events").agg(
        coalesce(max(when(lit(false), col("ts"))), max(col("ts"))).as("max_update_dt"),
        coalesce(max(when(lit(false), col("ts"))),
          lit("1900-01-01 00:00:00").cast(TimestampType)).as("seed_dt"))
    }),

    // ---- sort/limit: deterministic top-k
    "q_topk" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    }),

    // ---- set ops: INTERSECT / EXCEPT (deduplicating, per SQL semantics)
    "q_setops" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("k"))
      val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.intersect(sup).withColumn("op", lit("intersect"))
        .unionAll(c.except(sup).withColumn("op", lit("except")))
        .select("op", "k").orderBy("op", "k")
    }),

    // ---- distinct
    "q_distinct" -> ((s, dir) => {
      Tables(s, dir, "orders").select("o_orderstatus", "o_orderpriority")
        .distinct().orderBy("o_orderstatus", "o_orderpriority")
    }),

    // ---- scalar-function surface (SURVEY §2.8): trim / replace / concat
    // null-propagation (PG `||`) / date-truncate
    "q_scalar_funcs" -> ((s, dir) => {
      Tables(s, dir, "part").select(
        col("p_partkey"),
        trim(col("p_name")).as("name_trim"),
        regexp_replace(col("p_type"), " ", "").as("type_nospace"),
        upper(col("p_brand")).as("brand_up"),
        concat(col("p_brand"), lit(" "), nullif(col("p_type"), lit("STANDARD ANODIZED TIN")))
          .as("concat_nullprop"))
        .orderBy("p_partkey")
    }),

    // ---- skew handling: salted join must equal the plain join (the
    // oracle IS the plain join), while spreading hot keys across salt
    // partitions (graft.operators.SkewJoin)
    "q_salted_join" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey")
      val p = Tables(s, dir, "part").select("p_partkey", "p_brand")
        .withColumnRenamed("p_partkey", "l_partkey")
      graft.operators.SkewJoin.saltedJoin(l, p, Seq("l_partkey"), salt = 4,
          saltSource = Seq("l_orderkey", "l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "p_brand")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- fraud report №3 analog: value change within 1 hour, via lag
    "q_fraud_window" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          lag("event_type", 1).over(w).as("prev_type"),
          ((unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
            .cast(DoubleType) / lit(3.6e9)).as("hrs"))
        .filter(col("prev_type").isNotNull && col("event_type") =!= col("prev_type")
          && col("hrs") < 1.0)
        .orderBy("event_id")
    }))

  val oracles: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | count(*) AS n_rows,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_scan_prune" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_multihop" ->
      """SELECT r_name, count(*) AS n_rows,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |LEFT JOIN orders ON l_orderkey = o_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    // plain semi join: the engine's Bloom pre-filter has no false
    // negatives, so pruning is invisible in the result
    "q_bloom_semi" ->
      """SELECT l_orderkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate < TIMESTAMP '1995-03-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    // time-RANGE frame over the µs axis; same-timestamp ties land in
    // the same frame in both engines (RANGE semantics), so the rolling
    // aggregates are deterministic without a tie-break column
    "q_window_range" ->
      """SELECT event_id, user_id,
        | count(*) OVER w AS n_1h,
        | CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) OVER w AS BIGINT) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // epoch_ns//1000 floor-truncates ns→µs exactly like the Spark-side
    // read in graft.Tables (DuckDB keeps TIMESTAMP_NS from this parquet).
    "q_window_lag" ->
      """SELECT event_id, user_id, value,
        | lag(value) OVER w AS prev_value,
        | CAST(epoch_ns(ts)//1000 - lag(epoch_ns(ts)//1000) OVER w AS DOUBLE) / 3600000000.0 AS hours_since
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id)
        |ORDER BY event_id""".stripMargin,
    "q_window_moving" ->
      """SELECT event_id, user_id,
        | CAST(floor(value * 1e6) AS BIGINT) AS v_q,
        | count(*) OVER w3 AS mov_cnt,
        | CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) OVER w3 AS BIGINT) AS mov_sum,
        | first_value(CAST(floor(value * 1e6) AS BIGINT)) OVER wf AS first_q,
        | CAST(ntile(4) OVER wo AS BIGINT) AS quartile
        |FROM events
        |WINDOW
        | w3 AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id
        |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        | wf AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        | wo AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id)
        |ORDER BY event_id""".stripMargin,
    "q_scd1_merge" ->
      """WITH dim AS (
        | SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer),
        |snapshot AS (
        | SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
        | FROM customer WHERE c_custkey % 10 <> 0
        | UNION ALL
        | SELECT c_custkey + 1000000, c_name, c_acctbal, c_mktsegment
        | FROM customer WHERE c_custkey % 13 = 0)
        |SELECT s.c_custkey, s.c_name, s.c_acctbal, s.c_mktsegment,
        | CASE WHEN d.c_custkey IS NULL THEN 'insert'
        |      WHEN s.c_name IS DISTINCT FROM d.c_name
        |        OR s.c_acctbal IS DISTINCT FROM d.c_acctbal
        |        OR s.c_mktsegment IS DISTINCT FROM d.c_mktsegment THEN 'update'
        |      ELSE 'unchanged' END AS action
        |FROM snapshot s LEFT JOIN dim d ON s.c_custkey = d.c_custkey
        |ORDER BY s.c_custkey""".stripMargin,

    // Type-3 carry: prev_<col> = outgoing value on change, carried prev
    // otherwise, NULL on insert; deletes drop (snapshot semantics)
    "q_scd3_merge" ->
      """WITH dim AS (
        | SELECT c_custkey, c_acctbal, c_mktsegment,
        |  CASE WHEN c_custkey % 5 = 0 THEN c_acctbal - 50.0 END
        |    AS prev_c_acctbal,
        |  CAST(NULL AS VARCHAR) AS prev_c_mktsegment
        | FROM customer),
        |snapshot AS (
        | SELECT c_custkey,
        |  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
        |       ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_custkey % 11 = 0 THEN NULL
        |       ELSE c_mktsegment END AS c_mktsegment
        | FROM customer WHERE c_custkey % 10 <> 0
        | UNION ALL
        | SELECT c_custkey + 1000000, c_acctbal, c_mktsegment
        | FROM customer WHERE c_custkey % 13 = 0)
        |SELECT s.c_custkey, s.c_acctbal, s.c_mktsegment,
        | CASE WHEN d.c_custkey IS NULL THEN NULL
        |      WHEN s.c_acctbal IS DISTINCT FROM d.c_acctbal
        |        THEN d.c_acctbal
        |      ELSE d.prev_c_acctbal END AS prev_c_acctbal,
        | CASE WHEN d.c_custkey IS NULL THEN NULL
        |      WHEN s.c_mktsegment IS DISTINCT FROM d.c_mktsegment
        |        THEN d.c_mktsegment
        |      ELSE d.prev_c_mktsegment END AS prev_c_mktsegment,
        | CASE WHEN d.c_custkey IS NULL THEN 'insert'
        |      WHEN s.c_acctbal IS DISTINCT FROM d.c_acctbal
        |        OR s.c_mktsegment IS DISTINCT FROM d.c_mktsegment
        |        THEN 'update'
        |      ELSE 'unchanged' END AS action
        |FROM snapshot s LEFT JOIN dim d ON s.c_custkey = d.c_custkey
        |ORDER BY s.c_custkey""".stripMargin,

    "q_scd2_merge" ->
      """WITH day1 AS (
        | SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
        | WHERE c_custkey % 13 <> 0),
        |day2 AS (
        | SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
        | FROM customer WHERE c_custkey % 10 <> 0),
        |j AS (
        | SELECT coalesce(s.c_custkey, d.c_custkey) AS k,
        |  d.c_custkey IS NULL AS ins, s.c_custkey IS NULL AS del,
        |  (d.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL AND (
        |    s.c_name IS DISTINCT FROM d.c_name
        |    OR s.c_acctbal IS DISTINCT FROM d.c_acctbal
        |    OR s.c_mktsegment IS DISTINCT FROM d.c_mktsegment)) AS chg,
        |  s.c_name AS sn, s.c_acctbal AS sa, s.c_mktsegment AS sm,
        |  d.c_name AS dn, d.c_acctbal AS da, d.c_mktsegment AS dm
        | FROM day2 s FULL JOIN day1 d ON s.c_custkey = d.c_custkey)
        |SELECT k AS c_custkey, dn AS c_name, da AS c_acctbal, dm AS c_mktsegment,
        | TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
        | TIMESTAMP '2024-01-02 00:00:00' AS valid_to, false AS is_current
        |FROM j WHERE del OR chg
        |UNION ALL
        |SELECT k, dn, da, dm, TIMESTAMP '2024-01-01 00:00:00',
        | CAST(NULL AS TIMESTAMP), true
        |FROM j WHERE NOT ins AND NOT del AND NOT chg
        |UNION ALL
        |SELECT k, sn, sa, sm, TIMESTAMP '2024-01-02 00:00:00',
        | CAST(NULL AS TIMESTAMP), true
        |FROM j WHERE ins OR chg
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "q_scd2_changes" ->
      """WITH day1 AS (
        | SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
        | WHERE c_custkey % 13 <> 0),
        |day2 AS (
        | SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
        | FROM customer WHERE c_custkey % 10 <> 0),
        |j AS (
        | SELECT coalesce(s.c_custkey, d.c_custkey) AS k,
        |  d.c_custkey IS NULL AS ins, s.c_custkey IS NULL AS del,
        |  (d.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL AND (
        |    s.c_name IS DISTINCT FROM d.c_name
        |    OR s.c_acctbal IS DISTINCT FROM d.c_acctbal
        |    OR s.c_mktsegment IS DISTINCT FROM d.c_mktsegment)) AS chg,
        |  s.c_name AS sn, s.c_acctbal AS sa, s.c_mktsegment AS sm,
        |  d.c_name AS dn, d.c_acctbal AS da, d.c_mktsegment AS dm
        | FROM day2 s FULL JOIN day1 d ON s.c_custkey = d.c_custkey)
        |SELECT k AS c_custkey,
        | CASE WHEN ins THEN 'insert' WHEN del THEN 'delete'
        |      ELSE 'update' END AS op,
        | dn AS b_c_name, da AS b_c_acctbal, dm AS b_c_mktsegment,
        | sn AS a_c_name, sa AS a_c_acctbal, sm AS a_c_mktsegment
        |FROM j WHERE ins OR del OR chg
        |ORDER BY c_custkey""".stripMargin,
    "q_scd2_pit" ->
      """WITH day1 AS (
        | SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
        | WHERE c_custkey % 13 <> 0),
        |day2 AS (
        | SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
        | FROM customer WHERE c_custkey % 10 <> 0),
        |j AS (
        | SELECT coalesce(s.c_custkey, d.c_custkey) AS k,
        |  d.c_custkey IS NULL AS ins, s.c_custkey IS NULL AS del,
        |  (d.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL AND (
        |    s.c_name IS DISTINCT FROM d.c_name
        |    OR s.c_acctbal IS DISTINCT FROM d.c_acctbal
        |    OR s.c_mktsegment IS DISTINCT FROM d.c_mktsegment)) AS chg,
        |  s.c_acctbal AS sa, s.c_mktsegment AS sm,
        |  d.c_acctbal AS da, d.c_mktsegment AS dm
        | FROM day2 s FULL JOIN day1 d ON s.c_custkey = d.c_custkey),
        |hist AS (
        | SELECT k, da AS c_acctbal, dm AS c_mktsegment,
        |  TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
        |  TIMESTAMP '1996-01-01 00:00:00' AS valid_to, false AS is_current
        | FROM j WHERE del OR chg
        | UNION ALL
        | SELECT k, da, dm, TIMESTAMP '1995-01-01 00:00:00',
        |  CAST(NULL AS TIMESTAMP), true
        | FROM j WHERE NOT ins AND NOT del AND NOT chg
        | UNION ALL
        | SELECT k, sa, sm, TIMESTAMP '1996-01-01 00:00:00',
        |  CAST(NULL AS TIMESTAMP), true
        | FROM j WHERE ins OR chg)
        |SELECT f.o_orderkey, f.o_custkey, f.o_orderdate,
        | h.c_acctbal, h.c_mktsegment, h.valid_from, h.is_current
        |FROM orders f LEFT JOIN hist h
        | ON f.o_custkey = h.k AND h.valid_from <= f.o_orderdate
        | AND (h.valid_to IS NULL OR h.valid_to > f.o_orderdate)
        |ORDER BY f.o_orderkey""".stripMargin,
    "q_fact_append" ->
      """WITH fact AS (
        | SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00'),
        |inc AS (
        | SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |SELECT o_orderkey, o_custkey, o_orderdate FROM fact
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderdate FROM inc
        |WHERE NOT EXISTS (SELECT 1 FROM fact WHERE fact.o_orderkey = inc.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_watermark" ->
      """SELECT coalesce(max(CASE WHEN false THEN ts END), max(ts)) AS max_update_dt,
        | coalesce(max(CASE WHEN false THEN ts END), TIMESTAMP '1900-01-01 00:00:00') AS seed_dt
        |FROM events""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_setops" ->
      """WITH c AS (SELECT c_nationkey AS k FROM customer),
        |sup AS (SELECT s_nationkey AS k FROM supplier)
        |SELECT 'intersect' AS op, k FROM (SELECT k FROM c INTERSECT SELECT k FROM sup)
        |UNION ALL
        |SELECT 'except' AS op, k FROM (SELECT k FROM c EXCEPT SELECT k FROM sup)
        |ORDER BY op, k""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT p_partkey, trim(p_name) AS name_trim,
        | replace(p_type, ' ', '') AS type_nospace,
        | upper(p_brand) AS brand_up,
        | p_brand || ' ' || nullif(p_type, 'STANDARD ANODIZED TIN') AS concat_nullprop
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_salted_join" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, p_brand
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_fraud_window" ->
      """WITH pre AS (
        | SELECT event_id, user_id, event_type,
        |  lag(event_type) OVER w AS prev_type,
        |  CAST(epoch_ns(ts)//1000 - lag(epoch_ns(ts)//1000) OVER w AS DOUBLE) / 3600000000.0 AS hrs
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id))
        |SELECT event_id, user_id, event_type, prev_type, hrs FROM pre
        |WHERE prev_type IS NOT NULL AND event_type <> prev_type AND hrs < 1.0
        |ORDER BY event_id""".stripMargin)
}
