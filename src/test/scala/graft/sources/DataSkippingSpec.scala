package graft.sources

import java.nio.file.{Files, Paths}
import graft.TestSpark
import graft.operators.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-level data skipping: planning-time pruning through the custom
  * FileIndex equals the plain parquet read on every predicate shape,
  * while provably-non-matching files never become scan tasks.
  */
class DataSkippingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** k range-clustered into 4 files, then one appended file whose v is
    * entirely null (k 201..260) — known per-file bounds.
    */
  private def seededDir(): String = {
    val dir = Files.createTempDirectory("skip").toString + "/t"
    (1 to 200).map(i => (i.toLong, s"s${100 + i}", i * 1.5))
      .toDF("k", "name", "v")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.parquet(dir)
    (201 to 260).map(i => (i.toLong, s"s${100 + i}", Option.empty[Double]))
      .toDF("k", "name", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    dir
  }

  private def plain(dir: String): DataFrame = spark.read.parquet(dir)

  private def rows(df: DataFrame): Set[(Long, String, Option[Double])] =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

  test("skipping read equals plain read on every supported predicate; files prune") {
    val dir = seededDir()
    val (df, idx) = DataSkipping.readWithIndex(spark, plain(dir).schema, Seq(dir))

    def check(pred: org.apache.spark.sql.Column,
              expectPrune: Boolean): Unit = {
      val got = rows(df.filter(pred))
      val exp = rows(plain(dir).filter(pred))
      assert(got == exp, s"mismatch for $pred")
      assert(idx.lastTotal == 5, s"expected 5 files listed, got ${idx.lastTotal}")
      if (expectPrune)
        assert(idx.lastSelected < idx.lastTotal,
          s"$pred should prune: ${idx.lastSelected}/${idx.lastTotal}")
    }

    check(col("k") === 10L, expectPrune = true)        // one range file
    check(col("k") > 180L, expectPrune = true)         // top file + null file
    check(col("k") <= 40L, expectPrune = true)
    check(col("k").between(90L, 110L), expectPrune = true)
    check(col("k").isin(5L, 6L, 7L), expectPrune = true)
    check(col("name") === "s150", expectPrune = true)  // string byte-order bounds
    check(col("v").isNull, expectPrune = true)         // only the appended file has nulls
    check(col("v").isNotNull, expectPrune = false)     // null file also has non-null k (kept: v nulls live beside non-null rows? no — all-null v prunes)
    check(col("k") % 7 === 0, expectPrune = false)     // unsupported shape: correct, no prune
    check(col("k") === 999L, expectPrune = true)       // impossible: selects nothing
    assert(df.filter(col("k") === 999L).count() == 0)
    assert(idx.lastSelected == 0, "impossible predicate should select zero files")
  }

  test("all-null column file is pruned by IS NOT NULL, kept by IS NULL") {
    val dir = seededDir()
    val (df, idx) = DataSkipping.readWithIndex(spark, plain(dir).schema, Seq(dir))
    val nn = df.filter(col("v").isNotNull)
    assert(nn.count() == 200)
    assert(idx.lastSelected == 4, s"all-null-v file should drop: ${idx.lastSelected}")
    val nu = df.filter(col("v").isNull)
    assert(nu.count() == 60)
    assert(idx.lastSelected == 1, s"only the null file should survive: ${idx.lastSelected}")
  }

  test("sidecar path: stats persisted at write time drive the same pruning") {
    val dir = seededDir()
    DataSkipping.writeSidecar(spark, dir)
    assert(Files.exists(Paths.get(dir, "_graft_stats.tsv")))
    // sidecar round-trips the footer stats exactly
    val foot = DataSkipping.collectStats(spark, dir)
      .map(f => f.name -> f).toMap
    val side = DataSkipping.loadStats(spark, dir).map(f => f.name -> f).toMap
    assert(side.keySet == foot.keySet)
    side.foreach { case (n, s) =>
      assert(s.cols == foot(n).cols, s"sidecar stats differ for $n")
      assert(s.rows == foot(n).rows)
    }
    val (df, idx) = DataSkipping.readWithIndex(spark, plain(dir).schema, Seq(dir))
    assert(rows(df.filter(col("k") === 10L)) == rows(plain(dir).filter(col("k") === 10L)))
    assert(idx.lastSelected == 1 && idx.lastTotal == 5)
  }

  test("timestamp micros bounds prune date-range scans") {
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      val dir = Files.createTempDirectory("skipts").toString + "/t"
      (0 until 96).map(h => (h.toLong,
          java.sql.Timestamp.valueOf(f"2024-03-${1 + h / 24}%02d ${h % 24}%02d:00:00")))
        .toDF("id", "ts")
        .repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
        .write.parquet(dir)
      val (df, idx) = DataSkipping.readWithIndex(spark, spark.read.parquet(dir).schema, Seq(dir))
      val pred = col("ts") >= lit("2024-03-04 00:00:00").cast("timestamp")
      assert(df.filter(pred).count() ==
        spark.read.parquet(dir).filter(pred).count())
      assert(idx.lastSelected < idx.lastTotal,
        s"timestamp range should prune: ${idx.lastSelected}/${idx.lastTotal}")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  test("warehouse integration: commit-time sidecars, append-range pruning, replay-safe") {
    import org.apache.spark.sql.types._
    val schemas = Map("ledger" -> StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType))))
    val wh = new graft.etl.Warehouse(spark,
      Files.createTempDirectory("skipwh").toString, schemas,
      partitionSpec = Map.empty, bucketSpec = Map.empty)
    // three appends with disjoint id ranges — the natural shape of
    // sequence-keyed batches
    (0 until 3).foreach { b =>
      val t = wh.begin()
      t.append("ledger", (1 to 100).map(i => (b * 1000L + i, i * 1.0))
        .toDF("id", "amount").coalesce(1))
      t.commit()
    }
    // every data dir carries its sidecar
    wh.catalog()("ledger").foreach { d =>
      assert(Files.exists(Paths.get(d, "_graft_stats.tsv")), s"no sidecar in $d")
    }
    val (df, Seq(idx)) = wh.readSkipping("ledger")
    val hit = df.filter(col("id") === 2050L).collect()
    assert(hit.map(_.getLong(0)).toSeq == Seq(2050L))
    assert(idx.lastTotal == 3 && idx.lastSelected == 1,
      s"id probe should touch one append's file: ${idx.lastSelected}/${idx.lastTotal}")
    assert(df.count() == 300)
  }

  test("partitioned table: partition pruning drops subdirs, stats prune files inside") {
    import org.apache.spark.sql.types._
    val schemas = Map("fact" -> StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType),
      StructField("v", DoubleType))))
    val wh = new graft.etl.Warehouse(spark,
      Files.createTempDirectory("skippart").toString, schemas,
      partitionSpec = Map("fact" -> ("dt", to_date(col("ts")))),
      bucketSpec = Map.empty)
    // one append covering two days; ids range-clustered into 4 files per day
    val t = wh.begin()
    t.append("fact", (0 until 2000).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(s"2024-05-0${1 + i % 2} 10:00:00"), i * 0.5)
    }.toDF("id", "ts", "v").repartitionByRange(4, col("id"))
      .sortWithinPartitions("id"))
    t.commit()

    val (df, idxs) = wh.readSkipping("fact")
    assert(idxs.length == 1)
    val idx = idxs.head
    assert(df.columns.contains("dt"), "partition column rides along")

    // data-column probe: files prune via stats (each day dir has 4 files)
    val n = df.filter(col("id") between (100L, 120L)).count()
    assert(n == 21)
    assert(idx.lastSelected < idx.lastTotal,
      s"id range should prune files: ${idx.lastSelected}/${idx.lastTotal}")

    // partition-column predicate prunes whole subdirs BEFORE stats
    val oneDay = df.filter(col("dt") === lit("2024-05-02").cast("date"))
    assert(oneDay.count() == 1000)
    assert(idx.lastTotal < 8,
      s"partition pruning should hide day-1 files from listing: ${idx.lastTotal}")

    // combined: day + id range
    val combo = df.filter(col("dt") === lit("2024-05-02").cast("date") &&
      col("id") < 250L)
    assert(combo.count() ==
      wh.readRaw("fact").filter(col("dt") === lit("2024-05-02").cast("date") &&
        col("id") < 250L).count())
    assert(idx.lastSelected < idx.lastTotal)
  }

  test("OPTIMIZE ZORDER: compaction re-clusters a table so both dimensions prune") {
    import org.apache.spark.sql.types._
    val schemas = Map("m" -> StructType(Seq(
      StructField("a", LongType), StructField("b", LongType),
      StructField("payload", LongType))))
    val wh = new graft.etl.Warehouse(spark,
      Files.createTempDirectory("zopt").toString, schemas,
      partitionSpec = Map.empty, bucketSpec = Map.empty)
    // three appends in PAYLOAD order — a and b are scattered, so the
    // pre-compaction layout prunes neither dimension
    (0 until 3).foreach { batch =>
      val t = wh.begin()
      t.append("m", (0 until 8000).map { i =>
        val j = batch * 8000 + i
        ((j * 2654435761L % 1024), (j * 40503L % 1024), j.toLong)
      }.toDF("a", "b", "payload").coalesce(2))
      t.commit()
    }
    val before = wh.read("m").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    wh.compactZOrdered("m", "a", "b", files = 12, bits = 10)

    assert(wh.catalog()("m").length == 1, "compaction leaves one dir")
    val after = wh.read("m").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before, "compaction must not change the table image")

    val (df, Seq(idx)) = wh.readSkipping("m")
    def sel(pred: org.apache.spark.sql.Column): (Long, Int) = {
      val n = df.filter(pred).count(); (n, idx.lastSelected)
    }
    val (na, selA) = sel(col("a") < 100L)
    val (nb, selB) = sel(col("b") < 100L)
    assert(na == before.count(_._1 < 100) && nb == before.count(_._2 < 100))
    assert(selA < idx.lastTotal && selB < idx.lastTotal,
      s"both dimensions should prune post-compaction: a=$selA b=$selB of ${idx.lastTotal}")
  }

  test("z-order layout + skipping index: range predicates on either dimension prune files") {
    val dir = Files.createTempDirectory("skipz").toString + "/t"
    val n = 40000
    val df = (0 until n).map { i =>
      val a = (i * 2654435761L % 1024).toInt   // pseudo-random, full 10-bit range
      val b = (i * 40503L % 1024).toInt
      (a.toLong, b.toLong, i.toLong)
    }.toDF("a", "b", "payload")
    Layout.writeZOrdered(df, dir, "a", "b", files = 16, bits = 10)
    DataSkipping.writeSidecar(spark, dir)
    val (skip, idx) = DataSkipping.readWithIndex(spark, spark.read.parquet(dir).schema, Seq(dir))

    def checkDim(pred: org.apache.spark.sql.Column): Int = {
      val got = skip.filter(pred).agg(count(lit(1)), sum(col("payload"))).collect().head
      val exp = spark.read.parquet(dir).filter(pred)
        .agg(count(lit(1)), sum(col("payload"))).collect().head
      assert(got == exp, s"mismatch for $pred")
      assert(idx.lastSelected < idx.lastTotal,
        s"$pred should prune files: ${idx.lastSelected}/${idx.lastTotal}")
      idx.lastSelected
    }
    val selA = checkDim(col("a") < 128L)   // an eighth of a-space
    val selB = checkDim(col("b") < 128L)   // an eighth of b-space
    val selAB = checkDim(col("a") < 128L && col("b") < 128L)
    assert(selAB <= math.min(selA, selB),
      "conjunction should prune at least as hard as either dimension")
  }
}
