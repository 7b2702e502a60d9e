package graft.etl

import java.sql.Timestamp
import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 historization: a three-day scenario exercising every path —
  * insert, change (two versions), soft delete, re-insert after delete,
  * unchanged carry-over — plus the per-key interval invariants and the
  * point-in-time lookup.
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
  private val t3 = Timestamp.valueOf("2024-01-03 00:00:00")

  private def snap(rows: Seq[(String, Option[String], Option[Int])]): DataFrame =
    rows.toDF("k", "a", "b")

  private def run3Days(): DataFrame = {
    val day1 = snap(Seq(
      ("k1", Some("x"), Some(1)),    // unchanged throughout
      ("k2", Some("y"), Some(2)),    // changes day 2
      ("k3", Some("z"), Some(3)),    // deleted day 2, returns day 3
      ("k4", None, Some(4))))        // null -> value change day 2
    val day2 = snap(Seq(
      ("k1", Some("x"), Some(1)),
      ("k2", Some("y"), Some(20)),
      ("k4", Some("w"), Some(4)),
      ("k5", Some("new"), None)))    // inserted day 2
    val day3 = snap(Seq(
      ("k1", Some("x"), Some(1)),
      ("k2", Some("y"), Some(20)),
      ("k3", Some("z2"), Some(3)),   // re-insert with new attrs
      ("k4", Some("w"), Some(4)),
      ("k5", Some("new"), None)))
    val h1 = Scd2.initial(day1, Seq("k"), Seq("a", "b"), t1)
    val h2 = Scd2.merge(h1, day2, Seq("k"), Seq("a", "b"), t2)
    Scd2.merge(h2, day3, Seq("k"), Seq("a", "b"), t3)
  }

  private def rows(df: DataFrame): Set[(String, Option[String], Option[Int],
      Timestamp, Option[Timestamp], Boolean)] =
    df.collect().map(r => (r.getString(0), Option(r.getString(1)),
      if (r.isNullAt(2)) None else Some(r.getInt(2)),
      r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5))).toSet

  test("three-day history: every version with its exact interval") {
    val got = rows(run3Days())
    val expected = Set(
      ("k1", Some("x"), Some(1), t1, None, true),
      ("k2", Some("y"), Some(2), t1, Some(t2), false),
      ("k2", Some("y"), Some(20), t2, None, true),
      ("k3", Some("z"), Some(3), t1, Some(t2), false),   // soft delete
      ("k3", Some("z2"), Some(3), t3, None, true),       // re-insert
      ("k4", None, Some(4), t1, Some(t2), false),        // null -> value
      ("k4", Some("w"), Some(4), t2, None, true),
      ("k5", Some("new"), None, t2, None, true))
    assert(got == expected, s"got $got")
  }

  test("invariants: one current row per live key; valid_to IS NULL iff current") {
    val h = run3Days().cache()
    val perKeyCurrent = h.filter("is_current").groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perKeyCurrent.values.forall(_ == 1L), s"$perKeyCurrent")
    assert(h.filter("is_current <> (valid_to IS NULL)").count() == 0)
  }

  test("pointInTimeJoin: each fact picks the version valid at its event time") {
    val h = run3Days()
    val facts = Seq(
      (1L, "k2", Timestamp.valueOf("2024-01-01 06:00:00")),  // v1 of k2
      (2L, "k2", Timestamp.valueOf("2024-01-02 00:00:00")),  // boundary: v2
      (3L, "k3", Timestamp.valueOf("2024-01-02 12:00:00")),  // deleted window → null
      (4L, "k3", Timestamp.valueOf("2024-01-03 08:00:00")),  // re-inserted version
      (5L, "kX", Timestamp.valueOf("2024-01-02 00:00:00")),  // unknown key → null
      (6L, "k1", Timestamp.valueOf("2023-12-31 00:00:00")))  // before history → null
      .toDF("fid", "k", "ts")
    val out = Scd2.pointInTimeJoin(facts, h, Seq("k"), Seq("k"), "ts")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(3)), Option(r.getTimestamp(5)))).toMap
    assert(out == Map(
      1L -> (Some("y"), Some(t1)), 2L -> (Some("y"), Some(t2)),
      3L -> (None, None), 4L -> (Some("z2"), Some(t3)),
      5L -> (None, None), 6L -> (None, None)), s"$out")
    assert(out.size == 6)
  }

  test("duplicate snapshot keys are rejected loudly, not historized twice") {
    // two rows for k2 would fan the full-outer join out and open TWO
    // is_current versions — the invariant every asOf join depends on
    val h1 = Scd2.initial(snap(Seq(("k1", Some("x"), Some(1)))), Seq("k"), Seq("a", "b"), t1)
    val dup = snap(Seq(("k2", Some("y"), Some(2)), ("k2", Some("z"), Some(3))))
    // the guard rides the merge's own execution (no separate validation
    // job), so the failure surfaces from the ACTION, wrapped by Spark
    val ex = intercept[Exception] {
      Scd2.merge(h1, dup, Seq("k"), Seq("a", "b"), t2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("multiple rows")),
      s"expected the duplicate-key message in: ${messages(ex)}")
    assert(messages(ex).exists(_.contains("k2")),
      s"the offending key must be named: ${messages(ex)}")
  }

  test("unique-key guard adds no extra snapshot exchange (rides the merge shuffle)") {
    // the round-8 advice fix: validation used to be its own groupBy job
    // (a second full shuffle of the snapshot per load). Inline, the
    // window count partitions on the same keys the join shuffles on, so
    // the plan carries exactly ONE exchange per input side.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val h = Scd2.initial(snap(Seq(("k1", Some("x"), Some(1)))), Seq("k"), Seq("a", "b"), t1)
      val m = Scd2.merge(h, snap(Seq(("k1", Some("x"), Some(1)),
        ("k2", Some("y"), Some(2)))), Seq("k"), Seq("a", "b"), t2)
      val plan = m.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 2,
        s"guard must reuse the merge's shuffle, found $exchanges exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("asOf: point-in-time lookup uses half-open intervals") {
    val h = run3Days()
    // At t2 exactly: k2's old row (valid_to = t2) is already superseded.
    val at2 = rows(Scd2.asOf(h, t2))
    assert(at2.map(r => (r._1, r._2, r._3)) == Set(
      ("k1", Some("x"), Some(1)), ("k2", Some("y"), Some(20)),
      ("k4", Some("w"), Some(4)), ("k5", Some("new"), None)))
    // Between t1 and t2: the original image, k5 absent.
    val at15 = rows(Scd2.asOf(h, Timestamp.valueOf("2024-01-01 12:00:00")))
    assert(at15.map(_._1) == Set("k1", "k2", "k3", "k4"))
    assert(at15.forall(r => r._4 == t1))
  }
}
