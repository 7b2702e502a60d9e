package graft

import java.nio.file.{Files, Path, Paths}
import graft.etl.{ChangeFeed, Warehouse}
import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-batch WRITE BYTES of the CDC signature-store consumer, churn
  * wave vs store size (r13 verdict item 1: every consumer rewrote the
  * whole store per micro-batch — correct and invisible at sf0.1, write
  * bytes ∝ store at 100 TB). Two cells run the identical scenario —
  * seed the store with the full corpus, then apply a SMALL churn wave
  * (8 text updates) as its own micro-batch:
  *
  *  - `bucketed`: the store registers in `bucketSpec` (64 buckets, the
  *    production shape — a real deployment sizes bucket count to make
  *    one bucket ≈ a write-friendly file), so the churn batch rewrites
  *    only the ≤8 touched buckets and hard-links the rest;
  *  - `unbucketed`: the pre-r14 fallback, full-store rewrite.
  *
  * For each cell the probe reports the churn batch's NEW bytes (files
  * in the fresh dir whose filesystem fileKey is NOT carried from the
  * previous dir — hard links cost zero new bytes), the carried bytes,
  * and the seed-batch bytes (= store size on disk) as the denominator.
  * Expected shape: bucketed new-bytes ≈ touched/total of the store,
  * unbucketed new-bytes ≈ the whole store — and the gap WIDENS with
  * bucket count at fixed churn, i.e. write cost tracks churn, not
  * corpus.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ChurnWriteProbe
  */
object ChurnWriteProbe {
  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def fileKey(p: Path): AnyRef =
    Files.readAttributes(p, classOf[java.nio.file.attribute.BasicFileAttributes])
      .fileKey()

  private def dataFiles(dir: String): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("_"))
      .toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val docSchema = docs.schema
    val nDocs = docs.count()
    // churn wave: 8 updated texts — a fixed-size delta, the quantity
    // whose cost the write path must track
    val churnIds = (0 until 8).map(i => i * 97L + 5L)
    val v2 = docs.withColumn("text",
      when(col("doc_id").isin(churnIds: _*),
        concat(col("text"), lit(" churn wave edit"))).otherwise(col("text")))
    val storeSchema = StructType(StructField("doc_id", LongType) +:
      (0 until 8).map(j => StructField(s"m$j", LongType)))

    def cell(tag: String, buckets: Option[Int]): String = {
      val src = new Warehouse(spark,
        Files.createTempDirectory(s"cwp-$tag-src").toString,
        Map("docs" -> docSchema), partitionSpec = Map.empty,
        bucketSpec = Map("docs" -> ("doc_id", 8)))
      locally {
        val t = src.begin(); t.overwrite("docs", src.emptyDf("docs")); t.commit()
      }
      val storeWh = new Warehouse(spark,
        Files.createTempDirectory(s"cwp-$tag-idx").toString,
        Map("sigstore" -> storeSchema), partitionSpec = Map.empty,
        bucketSpec = buckets.fold(Map.empty[String, (String, Int)])(n =>
          Map("sigstore" -> ("doc_id", n))))
      locally {
        val t = storeWh.begin()
        t.overwrite("sigstore", storeWh.emptyDf("sigstore")); t.commit()
      }
      val logDir = Files.createTempDirectory(s"cwp-$tag-log").toString
      val ckpt = Files.createTempDirectory(s"cwp-$tag-ck").toString
      def drainAfter(img: DataFrame): Double = {
        val t = src.begin(); t.overwrite("docs", img); t.commit()
        ChangeFeed.materializeLog(src, "docs", Seq("doc_id"), logDir)
        time(StreamingOps.changeFeedSignatureStore(spark, storeWh, "sigstore",
          docSchema, n = 3, logDir, ckpt))._2
      }
      val tSeed = drainAfter(docs)  // batch 1: full corpus arrives
      val tChurn = drainAfter(v2)   // batch 2: the 8-doc churn wave
      val vs = storeWh.versions()
      require(vs.length == 3, s"expected seed+2 batches, got $vs")
      def dirOf(v: Long) = storeWh.catalogAsOf(v)("sigstore").head
      val seedBytes = dataFiles(dirOf(vs(1))).map(Files.size).sum
      val prevKeys = dataFiles(dirOf(vs(1))).map(fileKey).toSet
      val (carried, fresh) = dataFiles(dirOf(vs(2)))
        .partition(p => prevKeys.contains(fileKey(p)))
      f"""{"cell":"$tag","store_files":${dataFiles(dirOf(vs(2))).length},"store_bytes":$seedBytes,"churn_new_bytes":${fresh.map(Files.size).sum},"churn_linked_bytes":${carried.map(Files.size).sum},"churn_new_files":${fresh.length},"seed_secs":$tSeed%.2f,"churn_secs":$tChurn%.2f}"""
    }

    // r14: the same write-bytes question for the STREAMED MV refresher
    // (streamingMvRefresh) — seed a keyed view from lineitem (one row
    // per orderkey, a view-sized table), then refresh with a delta
    // touching 8 keys; bucketed views must pay key-spread bytes, the
    // unbucketed fallback pays the whole view.
    def mvCell(tag: String, buckets: Option[Int]): String = {
      import graft.operators.MaterializedAgg.{Count => MCount, Measure, Sum => MSum}
      val li = Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("v"))
      val srcSchema = li.schema
      val viewSchema = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("n", LongType),
        StructField("s", LongType)))
      val metaSchema = StructType(Seq(StructField("last_batch", LongType)))
      val measures = Seq(Measure("n", lit(1), MCount),
        Measure("s", col("v"), MSum))
      val wh = new Warehouse(spark,
        Files.createTempDirectory(s"cwp-$tag-wh").toString,
        Map("mv_view" -> viewSchema, "mv_meta" -> metaSchema),
        partitionSpec = Map.empty,
        bucketSpec = buckets.fold(Map.empty[String, (String, Int)])(n =>
          Map("mv_view" -> ("l_orderkey", n))))
      val srcDir = Files.createTempDirectory(s"cwp-$tag-srcdir").toString
      val ckpt = Files.createTempDirectory(s"cwp-$tag-ckpt").toString
      def drop(df: DataFrame, name: String): Unit = {
        val tmp = Files.createTempDirectory(s"cwp-$tag-stage").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, Paths.get(srcDir, s"$name.parquet"))
      }
      def run(): Double = time {
        StreamingOps.streamingMvRefresh(spark, wh, srcDir, srcSchema,
          "mv_view", "mv_meta", Seq("l_orderkey"), measures, ckpt)
          .awaitTermination()
      }._2
      drop(li, "b1")
      val tSeed = run()
      val churnKeys = (0 until 8).map(i => i * 193L + 7L)
      drop(li.filter(col("l_orderkey").isin(churnKeys: _*))
        .withColumn("v", col("v") + 1L), "b2")
      val tChurn = run()
      val vs = wh.versions()
      require(vs.length == 2, s"expected 2 view commits, got $vs")
      def dirOf(v: Long) = wh.catalogAsOf(v)("mv_view").head
      val seedBytes = dataFiles(dirOf(vs(0))).map(Files.size).sum
      val prevKeys = dataFiles(dirOf(vs(0))).map(fileKey).toSet
      val (carried, fresh) = dataFiles(dirOf(vs(1)))
        .partition(p => prevKeys.contains(fileKey(p)))
      f"""{"cell":"$tag","store_files":${dataFiles(dirOf(vs(1))).length},"store_bytes":$seedBytes,"churn_new_bytes":${fresh.map(Files.size).sum},"churn_linked_bytes":${carried.map(Files.size).sum},"churn_new_files":${fresh.length},"seed_secs":$tSeed%.2f,"churn_secs":$tChurn%.2f}"""
    }

    // untimed warmup first (r13 CapProbe lesson: the first cell in a
    // JVM pays JIT/codegen for the whole pipeline and reads inflated),
    // then the bucketed cells BEFORE the heavy full-rewrite one
    cell("warmup", Some(8))
    val cells = Seq(
      cell("bucketed64", Some(64)),
      cell("bucketed16", Some(16)),
      cell("unbucketed", None),
      mvCell("mv_bucketed64", Some(64)),
      mvCell("mv_unbucketed", None))
    println(s"""{"probe":"churn_write","sf":"$sfDir","n_docs":$nDocs,"churn_docs":${churnIds.length},"cells":[
${cells.mkString(",\n")}]}""")
    spark.stop()
  }
}
