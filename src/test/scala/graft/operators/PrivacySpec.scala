package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity / l-diversity: audit verdicts and suppression agree,
  * and the homogeneity hole (k-anonymous but sensitive-uniform) is
  * caught by l.
  */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (zip, age_band) QI; diagnosis sensitive
  private def df = Seq(
    // group A: 3 rows, 2 diagnoses -> k=3 ok, l=2 ok
    ("02138", 30L, "flu"), ("02138", 30L, "flu"), ("02138", 30L, "cold"),
    // group B: 3 rows, uniform diagnosis -> k ok, l FAILS (homogeneity)
    ("02139", 40L, "hiv"), ("02139", 40L, "hiv"), ("02139", 40L, "hiv"),
    // group C: singleton -> k fails
    ("02140", 50L, "flu"))
    .toDF("zip", "age", "diag")

  test("audit: sizes, distincts, both verdicts") {
    val a = Privacy.anonymityAudit(df, Seq("zip", "age"), "diag", k = 3, l = 2)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5))).toSet
    assert(a == Set(
      ("02138", 3L, 2L, true, true),
      ("02139", 3L, 1L, true, false),
      ("02140", 1L, 1L, false, false)))
  }

  test("anonymize: only the group meeting BOTH guarantees survives") {
    val kept = Privacy.anonymize(df, Seq("zip", "age"), "diag", k = 3, l = 2)
      .collect().map(_.getString(0))
    assert(kept.length == 3 && kept.forall(_ == "02138"))
    // audit and suppression agree: surviving groups == groups passing both
    val passing = Privacy.anonymityAudit(df, Seq("zip", "age"), "diag", 3, 2)
      .filter(col("k_anonymous") && col("l_diverse")).count()
    assert(passing == 1)
  }

  test("band is the order-preserving generalization lever") {
    val b = df.select(Privacy.band(col("age"), 25L).as("b"))
      .collect().map(_.getLong(0)).toSet
    assert(b == Set(25L, 50L)) // 30,40 -> 25; 50 -> 50
  }
}
