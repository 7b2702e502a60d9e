package graft.streaming

import java.nio.file.Files
import graft.TestSpark
import graft.etl.{ChangeFeed, Warehouse}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** r14: the ANN member of the maintained-census family — the stored
  * IVF-PQ index's per-list occupancy is maintained store-side by
  * [[StreamingOps.changeFeedAnnIndexCensus]] (the table is nlist-sized,
  * so the rebuild decision never aggregates the corpus-sized index).
  * Pins:
  *
  *  - after EVERY micro-batch (insert wave, delete wave, update wave)
  *    the maintained counts equal a cold
  *    [[Similarity.indexListCounts]] of the stored index, and the
  *    streamed index itself still equals the cold rebuild;
  *  - full redelivery (fresh checkpoint, whole log) leaves the counts
  *    unchanged — add/remove deltas cancel exactly;
  *  - [[Similarity.indexBalanceReport]] computes every derived column
  *    by the documented integer formulas (hand-computed fixture), and
  *    reads NULL bp columns on an empty occupancy relation (the ANSI
  *    division convention the oracles share).
  */
class AnnCensusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))
  private val lcSchema = StructType(Seq(
    StructField("co_id", LongType), StructField("cnt", LongType)))

  private def vec(seed: Long): Array[Float] =
    Array.tabulate(16)(d => ((seed * 31 + d * 7) % 13).toFloat - 6f)
  private def img(ids: Seq[Long], bump: Set[Long] = Set.empty): DataFrame = {
    val rows = ids.map(i => Row(i, if (bump(i)) vec(i + 500) else vec(i)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), embSchema)
  }

  test("maintained list counts track the stored index exactly per wave; " +
    "redelivery is a census no-op") {
    val coPred = col("vec_id") % 7 === 1
    val pqPred = col("vec_id") % 5 === 0 && col("vec_id") < 100
    val v1Ids = 0L to 20L
    val v2Ids = (0L to 24L).filterNot(_ == 9L)
    val v3Ids = (0L to 26L).filterNot(_ == 9L)
    val finalBump = Set(13L)

    val src = new Warehouse(spark,
      Files.createTempDirectory("acs-src").toString,
      Map("emb" -> embSchema), partitionSpec = Map.empty,
      bucketSpec = Map("emb" -> ("vec_id", 4)))
    locally { val t = src.begin(); t.overwrite("emb", img(Nil)); t.commit() }
    val idxSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("co_id", LongType),
      StructField("codes", ArrayType(LongType))))
    val idxWh = new Warehouse(spark,
      Files.createTempDirectory("acs-idx").toString,
      Map("annidx" -> idxSchema, "listcounts" -> lcSchema),
      partitionSpec = Map.empty,
      bucketSpec = Map("annidx" -> ("vec_id", 4)))
    locally {
      val t = idxWh.begin()
      Seq("annidx", "listcounts").foreach(tb =>
        t.overwrite(tb, idxWh.emptyDf(tb)))
      t.commit()
    }
    // seeds fixed for the index's lifetime — taken from the final
    // image, present unmutated from v1 on (the fixed-codebook contract)
    val seeds = img(v3Ids, finalBump).filter(coPred || pqPred)
    val logDir = Files.createTempDirectory("acs-log").toString
    val ckpt = Files.createTempDirectory("acs-ck").toString
    def drain(ck: String): Unit =
      StreamingOps.changeFeedAnnIndexCensus(spark, idxWh, "annidx",
        "listcounts", embSchema, seeds, coPred, pqPred, m = 4, logDir, ck)

    def assertCensusExact(tag: String): Unit = {
      val cold = Similarity.indexListCounts(idxWh.read("annidx"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val maintained = idxWh.read("listcounts")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(maintained == cold,
        s"$tag: counts diverged ($maintained vs $cold)")
    }

    Seq(("insert wave", img(v1Ids)), ("delete wave", img(v2Ids)),
        ("update wave", img(v3Ids, finalBump))).foreach { case (tag, d) =>
      val t = src.begin(); t.overwrite("emb", d); t.commit()
      ChangeFeed.materializeLog(src, "emb", Seq("vec_id"), logDir)
      drain(ckpt)
      assertCensusExact(tag)
    }
    // ... and the index itself still equals the cold rebuild
    val streamed = idxWh.read("annidx")
      .select(col("vec_id"), col("co_id"), array_join(col("codes"), ","))
      .collect().map(_.toString).sorted.toSeq
    val cold = Similarity.ivfpqIndex(img(v3Ids, finalBump), coPred, pqPred,
        m = 4)
      .select(col("vec_id"), col("co_id"), array_join(col("codes"), ","))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed == cold,
      "census consumer's index != cold rebuild")

    // full redelivery: fresh checkpoint, whole log, counts unchanged
    val before = idxWh.read("listcounts")
      .collect().map(_.toString).sorted.toSeq
    drain(Files.createTempDirectory("acs-ck2").toString)
    assertCensusExact("redelivery")
    val after = idxWh.read("listcounts")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "redelivery moved the census")
  }

  test("indexBalanceReport: hand-computed fixture and the empty-index " +
    "NULL convention") {
    val counts = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, 6L), Row(2L, 2L), Row(3L, 2L)), 2), lcSchema)
    val r = Similarity.indexBalanceReport(counts, nlist = 5L,
      imbalanceThresholdBp = 15000L).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("n_lists")) == 5L)
    assert(row.getLong(row.fieldIndex("n_lists_used")) == 3L)
    assert(row.getLong(row.fieldIndex("n_lists_empty")) == 2L)
    assert(row.getLong(row.fieldIndex("n_vectors")) == 10L)
    assert(row.getLong(row.fieldIndex("max_list")) == 6L)
    // 10000*6 div 10 = 6000; 10000*6*5 div 10 = 30000 > 15000
    assert(row.getLong(row.fieldIndex("max_frac_bp")) == 6000L)
    assert(row.getLong(row.fieldIndex("imbalance_bp")) == 30000L)
    assert(row.getBoolean(row.fieldIndex("rebuild_recommended")))

    // balanced occupancy stays under the threshold
    val even = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, 3L), Row(2L, 3L), Row(3L, 4L)), 2), lcSchema)
    val r2 = Similarity.indexBalanceReport(even, nlist = 3L,
      imbalanceThresholdBp = 15000L).collect().head
    // 10000*4*3 div 10 = 12000 <= 15000
    assert(r2.getLong(r2.fieldIndex("imbalance_bp")) == 12000L)
    assert(!r2.getBoolean(r2.fieldIndex("rebuild_recommended")))

    // empty occupancy: counts are zeros, bp columns NULL (ANSI //-by-0)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], lcSchema)
    val r3 = Similarity.indexBalanceReport(empty, nlist = 4L,
      imbalanceThresholdBp = 15000L).collect().head
    assert(r3.getLong(r3.fieldIndex("n_vectors")) == 0L)
    assert(r3.getLong(r3.fieldIndex("n_lists_empty")) == 4L)
    assert(r3.isNullAt(r3.fieldIndex("max_frac_bp")))
    assert(r3.isNullAt(r3.fieldIndex("imbalance_bp")))
    assert(r3.isNullAt(r3.fieldIndex("rebuild_recommended")))
  }
}
