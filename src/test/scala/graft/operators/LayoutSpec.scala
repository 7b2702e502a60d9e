package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class LayoutSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (a even positions, b odd)") {
    // a=5 (101), b=3 (011): positions a0=1,b0=1,a1=0,b1=1,a2=1,b2=0 -> 0b011011
    val out = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 3).as("z")).head.getLong(0)
    assert(out == 27L, s"zValue(5,3) should be 27, was $out")
  }

  test("z-prefix cells bound BOTH dimensions' spans (a single-column sort cannot)") {
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val stats = Layout.zorderStats(grid, "a", "b", cellPow = 2, bits = 6).collect()
    assert(stats.length == 16, "4^2 populated cells on a full grid")
    stats.foreach { r =>
      assert(r.getAs[Long]("a_max") - r.getAs[Long]("a_min") == 15L,
        "each cell spans exactly 1/4 of a")
      assert(r.getAs[Long]("b_max") - r.getAs[Long]("b_min") == 15L,
        "each cell spans exactly 1/4 of b")
      assert(r.getAs[Long]("n_rows") == 256L, "uniform grid -> equal cells")
    }
  }

  test("rankBin is monotone and lands in [0, 2^bits)") {
    val df = (0L until 1000L).toDF("v")
      .select(col("v"), Layout.rankBin(col("v"), lit(1000.0), 9).as("bin"))
    val rows = df.orderBy("v").collect().map(_.getLong(1))
    assert(rows.head == 0L && rows.last == 511L)
    assert(rows.zip(rows.tail).forall { case (x, y) => x <= y }, "monotone")
  }

  test("writeZOrdered produces files whose footer rectangles prune on both columns") {
    val dir = Files.createTempDirectory("graft-zorder").toFile
    try {
      val n = 64
      val data = (for (a <- 0 until n; b <- 0 until n) yield (a.toLong, b.toLong))
        .toDF("a", "b")
      Layout.writeZOrdered(data, s"$dir/z", "a", "b", files = 16, bits = 6)
      data.orderBy("a").coalesce(1).write.mode("overwrite").parquet(s"$dir/naive")

      def fileSpans(path: String, column: String): Seq[Long] = {
        spark.read.parquet(path)
          .groupBy(input_file_name())
          .agg((max(col(column)) - min(col(column))).as("span"))
          .collect().map(_.getAs[Long]("span")).toSeq
      }
      // z-ordered: most files bound BOTH dims well below the global span
      val za = fileSpans(s"$dir/z", "a"); val zb = fileSpans(s"$dir/z", "b")
      assert(za.count(_ <= (n - 1) / 2) >= za.size / 2,
        s"a-spans not bounded: $za")
      assert(zb.count(_ <= (n - 1) / 2) >= zb.size / 2,
        s"b-spans not bounded: $zb")
      // the naive single-column sort leaves b unpruned: span == global
      val nb = fileSpans(s"$dir/naive", "b")
      assert(nb.forall(_ == (n - 1).toLong), "naive layout should not bound b")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }
}
