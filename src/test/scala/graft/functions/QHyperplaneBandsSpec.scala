package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QHyperplaneBandsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference model: the formula the DuckDB oracles implement. */
  private def model(q: Array[java.lang.Long], planes: Int, bandBits: Int): Seq[Long] = {
    val bands = new Array[Long](planes / bandBits)
    for (j <- 0 until planes) {
      var dot = 0L
      for (i <- q.indices if q(i) != null)
        dot += q(i) * ((2654435761L * (j * 1024L + i)) % 4294967296L % 65537L - 32768L)
      if (dot >= 0) bands(j / bandBits) |= 1L << (j % bandBits)
    }
    bands.toSeq
  }

  test("expression matches the relational formula, nulls contribute zero") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[Array[java.lang.Long]] = (0 until 50).map { r =>
      Array.tabulate[java.lang.Long](16) { i =>
        if (r % 7 == 3 && i % 5 == 0) null
        else java.lang.Long.valueOf(rnd.nextLong() % 1000000L)
      }
    } :+ Array.empty[java.lang.Long] // zero-length vector: dot 0 -> all bits set
    val df = rows.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "q")
    val got = df.select(col("id"),
        QHyperplaneBands.bands(col("q"), planes = 32, bandBits = 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.zipWithIndex.foreach { case (a, i) =>
      assert(got(i.toLong) == model(a, 32, 8), s"row $i diverged")
    }
    // null array -> null result
    val withNull = Seq((0L, null: Array[java.lang.Long])).toDF("id", "q")
    assert(withNull.select(QHyperplaneBands.bands(col("q"), 32, 8)).head().isNullAt(0))
  }

  test("vectors beyond dim 1024 fail loudly (hash slots would alias)") {
    val big = Seq((0L, Array.fill[java.lang.Long](1025)(java.lang.Long.valueOf(1L))))
      .toDF("id", "q")
    val e = intercept[Exception] {
      big.select(QHyperplaneBands.bands(col("q"), 32, 8)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null && c.getMessage.contains("dim <= 1024")),
      s"unexpected failure: $e")
    // dim exactly 1024 is fine
    val ok = Seq((0L, Array.fill[java.lang.Long](1024)(java.lang.Long.valueOf(1L))))
      .toDF("id", "q")
    assert(!ok.select(QHyperplaneBands.bands(col("q"), 32, 8)).head().isNullAt(0))
  }

  test("graft_hyperplane_bands is usable from SQL") {
    // same factory GraftExtensions injects at session build time
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hyperplane_bands",
      exprs => QHyperplaneBands(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "built-in")
    val out = spark.sql(
      "SELECT graft_hyperplane_bands(array(1000000L, -2000000L, 300000L), 16, 4) AS b")
      .head().getSeq[Long](0)
    val expected = model(Array[java.lang.Long](1000000L, -2000000L, 300000L), 16, 4)
    assert(out == expected)
  }
}
