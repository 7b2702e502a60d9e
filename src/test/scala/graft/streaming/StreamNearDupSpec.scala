package graft.streaming

import graft.{Tables, TestSpark}
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SimHash near-dup filter == the batch pair set, for any
  * micro-batch split of the corpus.
  */
class StreamNearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    // near-copies (one appended token) + exact copies, like the oracle
    // augment, so Hamming ≤ 3 pairs exist
    d.unionAll(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" tail")).as("text")))
      .unionAll(d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
  }

  test("streamed pair set equals batch simhashNearDups across a batch split") {
    val rows = corpus.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    // split so copies arrive in a LATER batch than their originals
    val (b1, b2) = rows.partition(_._1 < 100000)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamingOps.streamingNearDupFilter(
      mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("snd_out")
      .outputMode("append").start()
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("snd_out")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val batch = Dedup.simhashNearDups(corpus, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(batch.nonEmpty, "augmented corpus must contain near-dup pairs")
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}; " +
        s"only-streamed=${streamed.keySet -- batch.keySet}, " +
        s"only-batch=${batch.keySet -- streamed.keySet}")
  }

  test("ttl variant: dup within horizon flagged, dup after eviction is not") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(1614556800000L + min * 60000L)
    implicit val sqlCtx = spark.sqlContext

    def run(name: String, batches: Seq[Seq[(Long, String, Timestamp)]]): Set[(Long, Long)] = {
      val mem = MemoryStream[(Long, String, Timestamp)]
      val out = StreamingOps.streamingNearDupFilterTtl(
        mem.toDF().toDF("doc_id", "text", "ts"), ttlMs = 10L * 60000L)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => mem.addData(b.toIndexedSeq); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    val doc = "some reasonably long text for a simhash signature to chew on"
    // dup arrives 5 min after the original: inside the 10-min ttl
    val in1 = run("ttl_in", Seq(
      Seq((1L, doc, ts(0))),
      Seq((2L, doc, ts(5)))))
    assert(in1 == Set((1L, 2L)), s"in-horizon dup must flag: $in1")

    // watermark passes original+ttl (unrelated traffic advances it, the
    // bucket gets no data, its state times out) -> late dup not flagged
    val in2 = run("ttl_out", Seq(
      Seq((1L, doc, ts(0))),
      Seq((9L, "completely different words everywhere here", ts(30))),
      Seq((2L, doc, ts(31)))))
    assert(in2 == Set.empty, s"post-eviction dup must NOT flag: $in2")
  }

  test("RocksDB state store: same pair set as the default (HDFS-backed) provider") {
    // unbounded runs hold the bucket index in a RocksDB state store
    // (bounded executor heap, state spills to local disk + changelog) —
    // the operator itself is provider-agnostic, so the contract is
    // simply: identical output under either provider, across a split
    // that forces originals and copies into different micro-batches
    val rows = corpus.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = rows.partition(_._1 < 100000)
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String)]
      val out = StreamingOps.streamingNearDupFilter(
        mem.toDF().toDF("doc_id", "text"))
      val q = out.writeStream.format("memory").queryName("snd_rocks")
        .outputMode("append").start()
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
      q.stop()
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
    val streamed = spark.table("snd_rocks")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val batch = Dedup.simhashNearDups(corpus, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(batch.nonEmpty && streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}")
  }

  test("single-batch arrival gives the same result as the split") {
    val rows = corpus.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamingOps.streamingNearDupFilter(
      mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("snd_one")
      .outputMode("append").start()
    mem.addData(rows.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("snd_one")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.simhashNearDups(corpus, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }
}
