package graft.sources

import java.nio.file.Files
import graft.TestSpark
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file Bloom sidecar: point-lookup file skipping on layouts whose
  * min/max stats cannot prune. Soundness contract: the pruned read
  * equals the plain read for EVERY key (no false negatives by
  * construction); pruning strictly beats the stats-only index in the
  * hash-scattered regime.
  */
class BloomSkippingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** ODD keys 1..799 hash-scattered across 8 files: every file's key
    * range spans ~the whole domain (stats can't prune in-range
    * lookups), and any EVEN key is absent-but-in-range — only the
    * bloom can refute it. Nulls sprinkled in; a small mBits keeps the
    * sidecar tiny while fp stays low at 50 keys/file.
    */
  private def scatteredDir(): String = {
    val dir = Files.createTempDirectory("bloomskip").toString + "/t"
    (1 to 400).map(i => ((2L * i - 1), s"name${i % 37}",
        if (i % 19 == 0) Option.empty[Long] else Some(i.toLong * 3)))
      .toDF("k", "name", "v")
      .repartition(8, col("name"))
      .write.parquet(dir)
    DataSkipping.writeSidecar(spark, dir)
    DataSkipping.writeBloomSidecar(spark, dir, Seq("k", "name"),
      mBits = 1L << 12, k = 5)
    dir
  }

  private def plain(dir: String): DataFrame = spark.read.parquet(dir)

  private def rows(df: DataFrame): Set[(Long, String, Option[Long])] =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("no false negatives: every present key returns its row; absent keys prune hard") {
    val dir = scatteredDir()
    val (df, idx) = DataSkipping.readWithIndex(spark, plain(dir).schema, Seq(dir))
    // every 7th present (odd) key — 58 point lookups, each exactly one row
    (1 to 400 by 7).foreach { i =>
      val key = 2L * i - 1
      val got = rows(df.filter(col("k") === key))
      val exp = rows(plain(dir).filter(col("k") === key))
      assert(got == exp && got.size == 1, s"key $key: $got vs $exp")
    }
    // an absent-but-IN-RANGE key (every file's [min,max] contains it,
    // so stats keep everything — only the bloom refutes): empty result,
    // files pruned
    assert(rows(df.filter(col("k") === 222L)).isEmpty)
    assert(idx.lastSelected < idx.lastTotal,
      s"absent in-range key kept ${idx.lastSelected}/${idx.lastTotal} files")
  }

  test("bloom strictly beats stats-only on the scattered layout; IN mixes present+absent") {
    val dir = scatteredDir()
    val statsDir = Files.createTempDirectory("bloomskip-ctl").toString + "/t"
    plain(dir).repartition(8, col("name")).write.parquet(statsDir) // same layout
    DataSkipping.writeSidecar(spark, statsDir)
    val pred = col("k").isin(11L, 333L, 222L) // two present, one absent-in-range
    val (ctl, ctlIdx) = DataSkipping.readWithIndex(spark, plain(statsDir).schema, Seq(statsDir))
    val (df, idx) = DataSkipping.readWithIndex(spark, plain(dir).schema, Seq(dir))
    val got = rows(df.filter(pred))
    assert(got == rows(plain(dir).filter(pred)) && got.size == 2)
    rows(ctl.filter(pred)) // drive the control's listing
    assert(idx.lastSelected < ctlIdx.lastSelected,
      s"bloom ${idx.lastSelected} vs stats-only ${ctlIdx.lastSelected}")
  }

  test("string-column blooms prune equality on the scatter column's values") {
    val dir = scatteredDir()
    val (df, idx) = DataSkipping.readWithIndex(spark, plain(dir).schema, Seq(dir))
    val got = rows(df.filter(col("name") === "name5"))
    assert(got == rows(plain(dir).filter(col("name") === "name5")))
    // a value no file contains must prune (hash scatter puts each
    // present name in exactly one file, absent names in none)
    rows(df.filter(col("name") === "no-such-name"))
    assert(idx.lastSelected < idx.lastTotal)
  }

  test("null-matching and range shapes never consult the bloom; unsupported types refused") {
    val dir = scatteredDir()
    val (df, _) = DataSkipping.readWithIndex(spark, plain(dir).schema, Seq(dir))
    // IS NULL / <=> NULL / ranges: bloom has no opinion, results exact
    assert(rows(df.filter(col("v").isNull)) == rows(plain(dir).filter(col("v").isNull)))
    assert(rows(df.filter(col("k") <=> lit(null))) ==
      rows(plain(dir).filter(col("k") <=> lit(null))))
    assert(rows(df.filter(col("k") > 390L)) == rows(plain(dir).filter(col("k") > 390L)))
    // a double column cannot be bloom-indexed (cast rendering unsound)
    val dirD = Files.createTempDirectory("bloomskip-d").toString + "/t"
    (1 to 10).map(i => (i.toLong, i * 1.5)).toDF("k", "d").write.parquet(dirD)
    val e = intercept[IllegalArgumentException] {
      DataSkipping.writeBloomSidecar(spark, dirD, Seq("d"))
    }
    assert(e.getMessage.contains("integral/string"))
  }

  test("warehouse indexBloom: readSkipping point probes prune through the bloom") {
    import org.apache.spark.sql.types._
    val wh = new graft.etl.Warehouse(spark,
      Files.createTempDirectory("bloomskip-wh").toString,
      Map("lk" -> StructType(Seq(StructField("k", LongType),
        StructField("name", StringType)))),
      partitionSpec = Map.empty, bucketSpec = Map.empty)
    val t = wh.begin()
    t.overwrite("lk", spark.createDataFrame(
      (1 to 400).map(i => org.apache.spark.sql.Row(2L * i - 1, s"name${i % 37}")).asJava,
      wh.schemas("lk")).repartition(8, col("name")))
    t.commit()
    wh.indexBloom("lk", Seq("k"), mBits = 1L << 12)
    val (df, idxs) = wh.readSkipping("lk")
    assert(df.filter(col("k") === 333L).count() == 1)
    assert(df.filter(col("k") === 222L).count() == 0) // absent, in-range
    assert(idxs.map(_.lastSelected).sum < idxs.map(_.lastTotal).sum,
      "warehouse bloom probe pruned nothing")
  }

  test("partitioned dirs: blooms prune files inside partition subdirs") {
    val dir = Files.createTempDirectory("bloomskip-p").toString + "/t"
    // 2 partitions x 4 scattered files; odd keys only
    (1 to 400).map(i => (2L * i - 1, s"name${i % 37}", i % 2))
      .toDF("k", "name", "p")
      .repartition(4, col("name"))
      .write.partitionBy("p").parquet(dir)
    DataSkipping.writeSidecar(spark, dir)
    DataSkipping.writeBloomSidecar(spark, dir, Seq("k"), mBits = 1L << 12)
    val schema = spark.read.parquet(dir).schema
    val (df, idx) = DataSkipping.readWithIndex(spark,
      org.apache.spark.sql.types.StructType(schema.filter(_.name != "p")), Seq(dir))
    val exp = spark.read.parquet(dir).filter(col("k") === 333L)
      .select("k", "name", "p").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = df.filter(col("k") === 333L)
      .select("k", "name", "p").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == exp && got.nonEmpty)
    assert(idx.lastSelected < idx.lastTotal, "no pruning inside partition subdirs")
    // absent-but-in-range key prunes everywhere
    assert(df.filter(col("k") === 222L).count() == 0)
    assert(idx.lastSelected < idx.lastTotal)
  }

  test("absent sidecar is a clean no-op; sidecar bytes are deterministic") {
    val dir = Files.createTempDirectory("bloomskip-n").toString + "/t"
    (1 to 50).map(i => (i.toLong, s"x$i")).toDF("k", "name").write.parquet(dir)
    DataSkipping.writeSidecar(spark, dir)
    val (df, idx) = DataSkipping.readWithIndex(spark, plain(dir).schema, Seq(dir))
    assert(df.filter(col("k") === 7L).count() == 1)
    assert(idx.lastSelected >= 1) // stats may prune; bloom absence never drops files
    // rebuilt sidecar is byte-identical (md5 geometry, sorted lines)
    DataSkipping.writeBloomSidecar(spark, dir, Seq("k"))
    val p = java.nio.file.Paths.get(dir, "_graft_bloom.tsv")
    val first = Files.readAllBytes(p)
    DataSkipping.writeBloomSidecar(spark, dir, Seq("k"))
    assert(java.util.Arrays.equals(first, Files.readAllBytes(p)))
  }

  test("writeBloomSidecar merges per-column: a second call on other cols keeps the first's filters") {
    val dir = Files.createTempDirectory("bloomskip-m").toString + "/t"
    (1 to 200).map(i => (i.toLong, s"name${i % 37}")).toDF("k", "name")
      .repartition(4, col("name")).write.parquet(dir)
    DataSkipping.writeBloomSidecar(spark, dir, Seq("k"), mBits = 1L << 12)
    // second call on a DIFFERENT column must not drop k's filters
    DataSkipping.writeBloomSidecar(spark, dir, Seq("name"), mBits = 1L << 12)
    val blooms = DataSkipping.loadBlooms(spark, dir)
    assert(blooms.nonEmpty)
    assert(blooms.values.forall(m => m.contains("k") && m.contains("name")),
      s"merged sidecar lost a column: ${blooms.values.map(_.keySet)}")
    // and the merged result equals a single full-column-set build
    val merged = Files.readAllBytes(java.nio.file.Paths.get(dir, "_graft_bloom.tsv"))
    DataSkipping.writeBloomSidecar(spark, dir, Seq("k", "name"), mBits = 1L << 12)
    val full = Files.readAllBytes(java.nio.file.Paths.get(dir, "_graft_bloom.tsv"))
    assert(java.util.Arrays.equals(merged, full))
  }

  test("a torn sidecar line (crash mid-write) is dropped, not a permanent crash loop") {
    val dir = Files.createTempDirectory("bloomskip-t").toString + "/t"
    (1 to 100).map(i => (i.toLong, s"name${i % 37}")).toDF("k", "name")
      .repartition(2, col("name")).write.parquet(dir)
    DataSkipping.writeBloomSidecar(spark, dir, Seq("k"), mBits = 1L << 12)
    // simulate a truncated trailing line: no tab, not a 5-field record
    val sc = java.nio.file.Paths.get(dir, "_graft_bloom.tsv")
    Files.write(sc, "\npart-torn".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    // both the reader and the merging writer must survive it
    val before = DataSkipping.loadBlooms(spark, dir)
    assert(before.values.forall(_.contains("k")))
    DataSkipping.writeBloomSidecar(spark, dir, Seq("name"), mBits = 1L << 12)
    val after = DataSkipping.loadBlooms(spark, dir)
    assert(after.values.forall(m => m.contains("k") && m.contains("name")),
      "merge after a torn line lost a column's filters")
  }
}
