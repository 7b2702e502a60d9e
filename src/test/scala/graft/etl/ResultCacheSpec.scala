package graft.etl

import java.nio.file.Files
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Result cache: identical plans hit within a catalog version, any
  * commit invalidates, results always equal the direct evaluation.
  */
class ResultCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshWh() = new Warehouse(spark,
    Files.createTempDirectory("rescache").toString,
    Map("t" -> StructType(Seq(StructField("g", StringType),
      StructField("v", LongType)))),
    partitionSpec = Map.empty, bucketSpec = Map.empty)

  private def load(wh: Warehouse, rows: Seq[(String, Long)]): Unit = {
    val t = wh.begin(); t.append("t", rows.toDF("g", "v")); t.commit()
  }

  private def q(wh: Warehouse) =
    wh.read("t").groupBy("g").agg(sum(col("v")).as("s"))

  test("second identical query hits; results equal direct evaluation") {
    val wh = freshWh()
    load(wh, Seq(("a", 1L), ("a", 2L), ("b", 5L)))
    assert(!ResultCache.wouldHit(wh, q(wh)))
    val first = ResultCache.through(wh, q(wh))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(first == Set(("a", 3L), ("b", 5L)))
    assert(ResultCache.wouldHit(wh, q(wh)), "same plan should now hit")
    // an equivalent frame built independently hits too (canonical plan)
    val again = ResultCache.through(wh, q(wh))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == first)
    // a DIFFERENT query does not hit
    assert(!ResultCache.wouldHit(wh,
      wh.read("t").groupBy("g").agg(count(lit(1)).as("n"))))
  }

  test("any commit rolls the version and invalidates; prune reclaims") {
    val wh = freshWh()
    load(wh, Seq(("a", 1L)))
    ResultCache.through(wh, q(wh)).collect()
    assert(ResultCache.wouldHit(wh, q(wh)))
    load(wh, Seq(("a", 10L)))   // commit -> new version
    assert(!ResultCache.wouldHit(wh, q(wh)), "commit must invalidate")
    val fresh = ResultCache.through(wh, q(wh))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fresh == Set(("a", 11L)), "post-commit result reflects the new data")
    assert(ResultCache.prune(wh) == 1, "one superseded entry reclaimed")
    assert(ResultCache.wouldHit(wh, q(wh)), "current-version entry survives prune")
  }

  test("empty results cache and read back with schema intact") {
    val wh = freshWh()
    load(wh, Seq(("a", 1L)))
    val empty = wh.read("t").filter(col("v") > 100L)
    val out = ResultCache.through(wh, empty)
    assert(out.collect().isEmpty && out.schema.fieldNames.toSeq == Seq("g", "v"))
    assert(ResultCache.wouldHit(wh, wh.read("t").filter(col("v") > 100L)))
  }
}
