package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite {
  import DataQuality._
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def child = Seq(
    (1L, Option(10L), 5.0),    // clean
    (1L, Option(10L), 5.0),    // duplicate key
    (2L, None, 3.0),           // null FK (not an FK violation; a not-null one)
    (3L, Option(99L), -1.0),   // dangling FK + negative value
    (4L, Option(11L), 2.0)     // clean
  ).toDF("k", "fk", "v")

  private def parent = Seq(10L, 11L).toDF("pk")

  test("audit: every rule shape counts exactly its violations") {
    val out = audit(child, Seq(
        Unique("k_unique", Seq("k")),
        NotNull("fk_not_null", "fk"),
        Check("v_non_negative", col("v") >= 0),
        ForeignKey("fk_exists", Seq("fk"), parent, Seq("pk"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("k_unique" -> 1L, "fk_not_null" -> 1L,
      "v_non_negative" -> 1L, "fk_exists" -> 1L), s"$out")
  }

  test("audit on a clean table reports zero for every rule, no missing rows") {
    val clean = Seq((1L, Option(10L), 1.0), (2L, Option(11L), 2.0)).toDF("k", "fk", "v")
    val out = audit(clean, Seq(
        Unique("k_unique", Seq("k")),
        NotNull("fk_not_null", "fk"),
        Check("v_non_negative", col("v") >= 0),
        ForeignKey("fk_exists", Seq("fk"), parent, Seq("pk"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size == 4 && out.values.forall(_ == 0L), s"$out")
  }

  test("check with a null predicate result is a violation (null-hostile)") {
    val df = Seq((1L, Option.empty[Double]), (2L, Option(2.0d)))
      .toDF("k", "v")
    val out = audit(df, Seq(Check("v_pos", col("v") > 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("v_pos") == 1L)
  }

  test("quarantine tags each row with exactly the rules it fails") {
    val out = quarantine(child, Seq(
        NotNull("fk_not_null", "fk"),
        Check("v_non_negative", col("v") >= 0)))
      .select(col("k"), col("v"), col("failed_rules"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[String](2).toList)).toSet
    assert(out == Set(
      (1L, 5.0, Nil), (2L, 3.0, List("fk_not_null")),
      (3L, -1.0, List("v_non_negative")), (4L, 2.0, Nil)), s"$out")
  }
}
