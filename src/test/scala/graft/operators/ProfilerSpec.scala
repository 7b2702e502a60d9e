package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ProfilerSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("profile: nulls counted, distinct exact, numeric min/max keep numeric order") {
    val df = Seq(
      (Some(10L), Some("b")), (Some(9L), Some("a")), (Some(10L), None),
      (None, Some("c")), (Some(2L), Some("a"))
    ).toDF("k", "s")
    val out = Profiler.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    // min is 2, not "10" — the numeric-before-stringify property
    assert(out("k") == ((5L, 1L, 3L, "2", "10")), s"got ${out("k")}")
    assert(out("s") == ((5L, 1L, 3L, "a", "c")), s"got ${out("s")}")
  }

  test("profileApprox: no Expand in the plan, distincts within HLL tolerance") {
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag")
    val approx = Profiler.profileApprox(df, cols, rsd = 0.02)
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "approx mode must not plan an Expand")
    val a = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val e = Profiler.profile(df, cols)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      assert(math.abs(a(c) - e(c)).toDouble / e(c) <= 0.10,
        s"$c: approx ${a(c)} vs exact ${e(c)}")
    }
    // everything except n_distinct is identical to the exact profile
    val aRest = approx.drop("n_distinct").collect().map(_.toString).sorted
    val eRest = Profiler.profile(df, cols).drop("n_distinct")
      .collect().map(_.toString).sorted
    assert(aRest.sameElements(eRest))
  }

  test("profile: single aggregation pass (one scan of the input)") {
    val df = (1L to 100L).toDF("k").withColumn("s",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("v"), $"k" % 7))
    val plan = Profiler.profile(df, Seq("k", "s"))
      .queryExecution.executedPlan.toString
    // multiple exact distincts plan via ONE Expand over one scan — not
    // one scan per column
    assert("Expand".r.findAllIn(plan).size == 1, plan.take(1500))
  }
}
