package graft.etl

import java.nio.file.{Files, Path, Paths}
import graft.TestSpark
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Generic MERGE INTO (`etl.Merge`): Delta-style clause semantics
  * (ordered WHEN MATCHED / NOT MATCHED / NOT MATCHED BY SOURCE with
  * conditions), ambiguous-source rejection, and the bucket-pruned
  * rewrite against the warehouse's bucketed layout.
  */
class MergeIntoSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val schema = new StructType()
    .add("id", "long").add("v", "string").add("n", "long")

  private def freshWh(prefix: String, buckets: Int = 4): Warehouse = {
    val wh = new Warehouse(spark, Files.createTempDirectory(prefix).toString,
      schemas = Map("t" -> schema), partitionSpec = Map.empty,
      bucketSpec = if (buckets > 0) Map("t" -> ("id", buckets)) else Map.empty)
    val t = wh.begin()
    t.overwrite("t", (1L to 12L).map(i => (i, s"v$i", i * 10)).toDF("id", "v", "n"))
    t.commit()
    wh
  }

  private def rows(wh: Warehouse): Map[Long, (String, Long)] =
    wh.read("t").collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("ordered clauses: conditional update, delete, insert, by-source delete") {
    val wh = freshWh("merge-sem", buckets = 0)
    // source: ids 10..15 — 10 gets n+=1 (first clause), 11 deleted
    // (cond n >= 110), 12 updated; 13..15 inserted with stamped v
    val src = (10L to 15L).map(i => (i, s"s$i", i)).toDF("id", "v", "n")
    val txn = wh.begin()
    val ret = Merge.into(txn, "t", src, Seq("id"),
      whenMatched = Seq(
        Merge.Update(Map("n" -> (col("t.n") + 1)),
          condition = Some(col("t.id") === 10L)),
        Merge.Delete(condition = Some(col("t.n") === 110L)),
        Merge.UpdateAll()),
      whenNotMatched = Seq(
        Merge.Insert(set = Map("v" -> concat(lit("new_"), col("s.v"))))),
      whenNotMatchedBySource = Seq(
        Merge.Delete(condition = Some(col("t.id") <= 2L))))
    txn.commit()
    assert(ret == -1, "BY SOURCE clause must force the full path")
    val got = rows(wh)
    assert(got(10L) == ("v10", 101L), "first matching clause wins")
    assert(!got.contains(11L), "conditional matched delete")
    assert(got(12L) == ("s12", 12L), "UpdateAll fallthrough")
    assert(got(13L) == ("new_s13", 13L) && got(15L) == ("new_s15", 15L),
      "insert with override")
    assert(!got.contains(1L) && !got.contains(2L), "by-source conditional delete")
    assert(got(3L) == ("v3", 30L), "by-source fallthrough keeps")
    assert(got.keySet == ((3L to 10L).toSet ++ Set(12L, 13L, 14L, 15L)))
  }

  test("matched rows with no firing condition keep their target values") {
    val wh = freshWh("merge-keep", buckets = 0)
    val src = Seq((5L, "s5", 5L)).toDF("id", "v", "n")
    val txn = wh.begin()
    Merge.into(txn, "t", src, Seq("id"),
      whenMatched = Seq(Merge.Delete(condition = Some(lit(false)))))
    txn.commit()
    assert(rows(wh)(5L) == ("v5", 50L))
    assert(rows(wh).size == 12)
  }

  test("bucket-pruned merge rewrites only source-key buckets; rest hard-link") {
    val wh = freshWh("merge-bkt")
    val oldDir = wh.catalog()("t").head
    def files(dir: String): Map[String, Path] =
      Files.list(Paths.get(dir)).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> p).toMap
    val oldFiles = files(oldDir)

    val src = Seq((7L, "x7", 700L), (100L, "x100", 1L)).toDF("id", "v", "n")
    val touchedBuckets = Seq(7L, 100L).map(i =>
      spark.range(1).select(pmod(hash(lit(i)), lit(4))).head.getInt(0)).toSet
    val txn = wh.begin()
    val ret = Merge.into(txn, "t", src, Seq("id"),
      whenMatched = Seq(Merge.UpdateAll()),
      whenNotMatched = Seq(Merge.Insert()))
    txn.commit()
    assert(ret == touchedBuckets.size, "return = touched bucket count")
    assert(rows(wh)(7L) == ("x7", 700L) && rows(wh)(100L) == ("x100", 1L))
    assert(rows(wh).size == 13)

    val newFiles = files(wh.catalog()("t").head)
    val bucketRe = """.*_(\d+)(?:\..*)?$""".r
    def bucketOf(name: String): Int = name match { case bucketRe(b) => b.toInt }
    val carried = newFiles.filter { case (name, _) => oldFiles.contains(name) }
    assert(carried.nonEmpty)
    carried.foreach { case (name, p) =>
      assert(!touchedBuckets.contains(bucketOf(name)))
      assert(Files.mismatch(p, oldFiles(name)) == -1L, s"$name not byte-identical")
    }
  }

  test("bucketed merge plans with zero target-side Exchange") {
    val wh = freshWh("merge-plan")
    val src = Seq((7L, "x7", 700L)).toDF("id", "v", "n")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = Merge(wh.read("t"), src, Seq("id"),
        schema.fieldNames.toIndexedSeq,
        Seq(Merge.UpdateAll()), Seq(Merge.Insert()), Nil)
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"target must stay a bucketed scan:\n$plan")
      assert("Exchange".r.findAllIn(plan).size == 1,
        s"expected ONE exchange (source side only):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ambiguous source and key-updating SET reject") {
    val wh = freshWh("merge-rej", buckets = 0)
    val txn = wh.begin()
    val dup = Seq((5L, "a", 1L), (5L, "b", 2L)).toDF("id", "v", "n")
    assertThrows[IllegalArgumentException] {
      Merge.into(txn, "t", dup, Seq("id"), whenMatched = Seq(Merge.UpdateAll()))
    }
    val src = Seq((5L, "a", 1L)).toDF("id", "v", "n")
    assertThrows[IllegalArgumentException] {
      Merge.into(txn, "t", src, Seq("id"),
        whenMatched = Seq(Merge.Update(Map("id" -> lit(99L)))))
    }
    // INSERT overriding the key is the same identity violation: the row
    // would land in a bucket the pruned rewrite never touched
    assertThrows[IllegalArgumentException] {
      Merge.into(txn, "t", src, Seq("id"),
        whenNotMatched = Seq(Merge.Insert(Map("id" -> lit(99L)))))
    }
  }

  test("bucket-pruned merge over outstanding deletion vectors keeps the delete") {
    val wh = freshWh("merge-dv")
    // pick a victim and an update key living in DIFFERENT buckets, so
    // the victim's tombstone must survive the hard-link remap
    def bucketOf(i: Long): Int =
      spark.range(1).select(pmod(hash(lit(i)), lit(4))).head.getInt(0)
    val victim = 3L
    val updated = (1L to 12L).find(i => i != victim && bucketOf(i) != bucketOf(victim)).get

    val t0 = wh.begin()
    assert(t0.deleteVectored("t", col("id") === victim) == 1L)
    t0.commit()

    val src = Seq((updated, "upd", 999L)).toDF("id", "v", "n")
    val t1 = wh.begin()
    val ret = Merge.into(t1, "t", src, Seq("id"),
      whenMatched = Seq(Merge.UpdateAll()))
    t1.commit()
    assert(ret == 1, "single-key merge must touch one bucket")
    val got = rows(wh)
    assert(!got.contains(victim), "vector-deleted row must stay deleted")
    assert(got(updated) == ("upd", 999L))
    assert(got.size == 11)
  }

  test("merge with tombstones in BOTH touched and untouched buckets: touched materialize, untouched remap") {
    val wh = freshWh("merge-dv2")
    def bucketOf(i: Long): Int =
      spark.range(1).select(pmod(hash(lit(i)), lit(4))).head.getInt(0)
    // updated key; touched-bucket victim shares its bucket (the rewrite
    // MATERIALIZES its tombstone); untouched-bucket victim lives
    // elsewhere (its tombstone survives via the hard-link REMAP)
    val updated = 5L
    val vTouched = (1L to 12L)
      .find(i => i != updated && bucketOf(i) == bucketOf(updated)).get
    val vUntouched = (1L to 12L).find(i => bucketOf(i) != bucketOf(updated)).get

    val t0 = wh.begin()
    assert(t0.deleteVectored("t",
      col("id") === vTouched || col("id") === vUntouched) == 2L)
    t0.commit()

    val t1 = wh.begin()
    val ret = Merge.into(t1, "t", Seq((updated, "upd", 999L)).toDF("id", "v", "n"),
      Seq("id"), whenMatched = Seq(Merge.UpdateAll()))
    t1.commit()
    assert(ret == 1)
    val got = rows(wh)
    assert(!got.contains(vTouched), "touched-bucket tombstone must materialize")
    assert(!got.contains(vUntouched), "untouched-bucket tombstone must survive the remap")
    assert(got(updated) == ("upd", 999L))
    assert(got.size == 10, s"12 keys - 2 deletes = 10, got ${got.size}")

    // and the NEXT merge over the remapped DV still holds the line
    val t2 = wh.begin()
    Merge.into(t2, "t", Seq((vUntouched, "back", 1L)).toDF("id", "v", "n"),
      Seq("id"),
      whenMatched = Seq(Merge.UpdateAll()),
      whenNotMatched = Seq(Merge.Insert()))
    t2.commit()
    val got2 = rows(wh)
    assert(got2(vUntouched) == ("back", 1L),
      "NOT MATCHED insert must resurrect the key explicitly (tombstone applied, then insert)")
    assert(got2.size == 11)
  }

  test("MERGE expresses SCD1: update-if-changed + insert + by-source delete") {
    val wh = freshWh("merge-scd1", buckets = 0)
    // snapshot: 1..10 minus 4, with 6 changed; 20 new
    val snap = ((1L to 10L).filter(_ != 4L).map(i =>
        (i, if (i == 6L) "CHANGED" else s"v$i", i * 10)) :+ (20L, "v20", 200L))
      .toDF("id", "v", "n")
    val expected = Scd1.merge(wh.read("t"), snap, Seq("id"), Seq("v", "n"))
      .collect().map(_.toSeq).toSet
    val txn = wh.begin()
    Merge.into(txn, "t", snap, Seq("id"),
      whenMatched = Seq(Merge.UpdateAll(
        condition = Some(!(col("t.v") <=> col("s.v")) || !(col("t.n") <=> col("s.n"))))),
      whenNotMatched = Seq(Merge.Insert()),
      whenNotMatchedBySource = Seq(Merge.Delete()))
    txn.commit()
    assert(wh.read("t").collect().map(_.toSeq).toSet == expected)
  }
}
