package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("corrMatrix: exact ±1 on linear columns, 0 on an orthogonal one") {
    // y = 2x (corr +1), z = -x (corr -1), w alternates orthogonally to x
    val df = (1 to 40).map { i =>
      val x = i.toDouble
      (x, 2 * x, -x, if (i % 2 == 0) 1.0 else -1.0)
    }.toDF("x", "y", "z", "w")
    val out = Stats.corrMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("x", "y")) == 1.0 && out(("x", "z")) == -1.0 &&
      out(("y", "z")) == -1.0, s"$out")
    // alternating ±1 against 1..40: corr = small but defined; just
    // bounded — the exact-sums path must not NaN or blow up
    assert(math.abs(out(("x", "w"))) < 0.1, s"$out")
    assert(out.size == 6)
  }
}
