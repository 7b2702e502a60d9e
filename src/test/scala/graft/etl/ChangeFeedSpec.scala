package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ChangeFeed.diff: Delta-CDF-style classification from one full-outer
  * key join — null-safe value compare, presence by marker (not
  * value-null), pre/post pair for updates, and the time-travel form
  * over committed warehouse versions.
  */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def img(rows: Seq[(Long, Option[String], Option[Double])]) =
    rows.toDF("k", "name", "bal")

  test("insert / delete / update classification, null-safe") {
    val old = img(Seq(
      (1L, Some("a"), Some(1.0)), // unchanged
      (2L, Some("b"), Some(2.0)), // deleted
      (3L, Some("c"), Some(3.0)), // value change
      (4L, None, Some(4.0)), // null -> value (change)
      (5L, Some("e"), None))) // all-null-to-same (unchanged)
    val nw = img(Seq(
      (1L, Some("a"), Some(1.0)),
      (3L, Some("c"), Some(3.5)),
      (4L, Some("d"), Some(4.0)),
      (5L, Some("e"), None),
      (6L, Some("f"), Some(6.0)))) // inserted
    val out = ChangeFeed.diff(old, nw, Seq("k"))
      .orderBy("k", "change_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // NB: "update_post" sorts before "update_pre" lexicographically
    assert(out == Seq(
      ("delete", 2L),
      ("update_post", 3L), ("update_pre", 3L),
      ("update_post", 4L), ("update_pre", 4L),
      ("insert", 6L)))
    // the update pair carries pre and post values respectively
    val u3 = ChangeFeed.diff(old, nw, Seq("k"))
      .filter($"k" === 3L).orderBy("change_type")
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    assert(u3.toSeq == Seq(("update_post", 3.5), ("update_pre", 3.0)))
  }

  test("a row whose every value column is null is present, not deleted") {
    val old = img(Seq((1L, None, None)))
    val nw = img(Seq((1L, None, None)))
    assert(ChangeFeed.diff(old, nw, Seq("k")).isEmpty)
  }

  test("mismatched schemas and bad keys are rejected") {
    val a = img(Seq((1L, Some("a"), Some(1.0))))
    intercept[IllegalArgumentException] {
      ChangeFeed.diff(a, a.withColumnRenamed("bal", "x"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      ChangeFeed.diff(a, a, Seq("nope"))
    }
  }

  test("tableChanges diffs two committed versions via time travel") {
    val base = img(Seq((1L, Some("a"), Some(1.0)), (2L, Some("b"), Some(2.0))))
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-cdfspec").toString,
      Map("t" -> base.schema), partitionSpec = Map.empty,
      bucketSpec = Map("t" -> ("k", 4)))
    val t0 = wh.begin(); t0.overwrite("t", base); t0.commit()
    val vA = wh.versions().last
    val t1 = wh.begin()
    t1.overwrite("t", img(Seq((1L, Some("a"), Some(9.0)), (3L, Some("c"), Some(3.0)))))
    t1.commit()
    val out = ChangeFeed.tableChanges(wh, "t", vA, wh.versions().last, Seq("k"))
      .orderBy("k", "change_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(
      ("update_post", 1L), ("update_pre", 1L),
      ("delete", 2L),
      ("insert", 3L)))
  }
}
