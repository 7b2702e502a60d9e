package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The refresh identity: for ANY split of the data into base ∪ delta,
  * refreshing the base-built view with the delta equals the full
  * rebuild — including groups present only in the delta and only in
  * the base, and a second chained refresh.
  */
class MaterializedAggSpec extends AnyFunSuite {
  import MaterializedAgg._
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val measures = Seq(
    Measure("n", lit(1), Count),
    Measure("s", col("v").cast("decimal(18,2)"), Sum),
    Measure("lo", col("v"), Min),
    Measure("hi", col("v"), Max))

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      Option(r.getDecimal(2)).map(_.toString),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet

  test("refresh(aggregate(base), delta) == aggregate(base ++ delta)") {
    val all = (1 to 200).map(i => (s"g${i % 7}", (i * 13 % 101).toDouble))
      .toDF("g", "v")
    for (cut <- Seq(0, 50, 200)) {  // empty base, mid split, empty delta
      val base = all.limit(cut)
      val delta = all.except(base).unionAll(
        // delta-only group + base-only groups preserved
        Seq(("gNew", 5.0)).toDF("g", "v"))
      val full = aggregate(all.unionAll(Seq(("gNew", 5.0)).toDF("g", "v")),
        Seq("g"), measures)
      val inc = refresh(aggregate(base, Seq("g"), measures), delta,
        Seq("g"), measures)
      assert(rows(inc) == rows(full), s"cut=$cut")
    }
  }

  test("HLL measure: estimates are merge-invariant across any split, exact at small cardinality") {
    val all = (1 to 300).map(i => (s"g${i % 5}", s"user${i % 83}")).toDF("g", "u")
    val ms = Seq(Measure("n", lit(1), Count),
      Measure("du", col("u"), ApproxDistinct))
    def est(df: DataFrame) = readView(df, Seq("g"), ms)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = aggregate(all, Seq("g"), ms)
    for (cut <- Seq(0, 100, 300)) {
      val base = all.limit(cut)
      val inc = refresh(aggregate(base, Seq("g"), ms), all.except(base),
        Seq("g"), ms)
      assert(est(inc) == est(full), s"cut=$cut")
    }
    // sparse-mode sketches are exact at these cardinalities: estimate ==
    // true distinct per group (the spec would catch a broken hash, not
    // just a broken merge)
    val exact = all.groupBy("g").agg(countDistinct(col("u")).as("du"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(est(full).map(t => (t._1, t._3)) == exact)
  }

  test("chained refreshes compose") {
    val d1 = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v")
    val d2 = Seq(("a", 3.0), ("c", 4.0)).toDF("g", "v")
    val d3 = Seq(("b", -1.0)).toDF("g", "v")
    val chained = refresh(refresh(aggregate(d1, Seq("g"), measures),
      d2, Seq("g"), measures), d3, Seq("g"), measures)
    val full = aggregate(d1.unionAll(d2).unionAll(d3), Seq("g"), measures)
    assert(rows(chained) == rows(full))
  }

  test("quantile view: refresh identity holds; readout matches a direct rank walk") {
    import org.apache.spark.sql.functions.{col, lit}
    // values 1..100 per group 'a' (uniform), 1..10 repeated for 'b'
    val base = ((1 to 60).map(i => ("a", i.toDouble)) ++
      (1 to 40).map(i => ("b", (i % 10 + 1).toDouble))).toDF("g", "v")
    val delta = ((61 to 100).map(i => ("a", i.toDouble))).toDF("g", "v")
    val width = 5L
    val cnt = Seq(Measure("n", lit(1), Count))

    val incremental = refresh(
      quantileView(base, Seq("g"), "v", width),
      delta.withColumn("bucket", bucketize(col("v"), width)),
      Seq("g", "bucket"), cnt)
    val full = quantileView(base.unionAll(delta), Seq("g"), "v", width)
    assert(rowsOf(incremental) == rowsOf(full), "histogram refresh identity")

    val q = readQuantiles(incremental, Seq("g"), Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // group a: values 1..100, width-5 buckets; rank(0.5)=50 -> value 50
    // -> bucket 50; rank(0.9)=90 -> bucket 90; rank(0.99)=99 -> bucket 95
    assert(q("a") == ((50L, 90L, 95L)))
    // group b: values 1..10 uniform x4, buckets 0/5/10:
    // counts: bucket 0 -> {1..4}=16, 5 -> {5..9}=20, 10 -> {10}=4
    // rank(0.5)=20 <= 36 cum at bucket 5; 0.9 -> 36 at bucket 5; 0.99 -> bucket 10
    assert(q("b") == ((5L, 5L, 10L)))
  }

  test("quantile rank and bucket edges are exact where doubles are not") {
    import MaterializedAgg._
    import org.apache.spark.sql.functions.col
    // ceil(0.07 * 100) is 8 in IEEE double (7.000000000000001); the
    // decimal rank arithmetic must return the true rank-7 bucket
    val base = (1L to 100L).map(v => ("k", v)).toDF("g", "v")
    val view = quantileView(base, Seq("g"), "v", width = 1L)
    val q = readQuantiles(view, Seq("g"), Seq(0.07)).collect().head
    assert(q.getLong(1) == 7L,
      s"rank ceil(0.07*100) must be 7, got bucket ${q.getLong(1)}")
    // epoch-nanos magnitude: 1.7e18 is far past double's 2^53 integer
    // range, where the old floor(v/w)*w-through-double path could shift
    // values across bucket edges
    val big = 1700000000000000003L
    val width = 1000000L
    val edges = Seq(big, big - 3L, big + (width - 4L)) // same bucket
      .map(v => ("k", v)).toDF("g", "v")
      .select(bucketize(col("v"), width).as("b"))
      .collect().map(_.getLong(0)).toSet
    assert(edges == Set((big / width) * width),
      s"integral bucketization must be exact above 2^53: $edges")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
}
