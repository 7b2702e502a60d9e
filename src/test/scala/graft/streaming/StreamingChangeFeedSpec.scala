package graft.streaming

import java.nio.file.Files
import graft.TestSpark
import graft.etl.{ChangeFeed, Warehouse}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming CDC chain: `ChangeFeed.materializeLog` (write side)
  * feeding `StreamingOps.changeFeedDeltas` (aggregate consumer) and
  * `StreamingOps.changeFeedReplica` (merge-applied replica). Pins:
  *
  *  - the log's rows per transition equal the batch `tableChanges`
  *    diff, stamped with the transition's target version;
  *  - catch-up is idempotent (a second `materializeLog` with no new
  *    commits appends nothing) and INCREMENTAL (only not-yet-logged
  *    transitions are appended);
  *  - a delta drain on a DURABLE checkpoint folds ONLY the new
  *    transitions into the checkpointed aggregation state — the
  *    re-emitted totals equal a direct recompute of the new image;
  *  - the replica equals the source image after each drain, and a
  *    FULL re-replay (fresh checkpoint, whole log) onto the
  *    already-current replica converges to the same image — the
  *    at-least-once-safe property the consumer's scaladoc claims.
  */
class StreamingChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("amount", LongType)))
  private val keys = Seq("id")

  private def img(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("id", "grp", "amount")

  private def mkWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("wh-cdf").toString,
      Map("t" -> schema), partitionSpec = Map.empty,
      bucketSpec = Map("t" -> ("id", 4)))

  private def commit(wh: Warehouse, df: DataFrame): Unit = {
    val t = wh.begin(); t.overwrite("t", df); t.commit()
  }

  private def logRows(logDir: String): DataFrame =
    spark.read.schema(ChangeFeed.logSchema(schema, keys))
      .parquet(ChangeFeed.logGlob(logDir))

  // base, then two transitions exercising every change type
  private val v1 = img((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
  private val v2 = img((1L, "a", 11L), (3L, "b", 30L), (4L, "b", 40L)) // upd 1, del 2, ins 4
  private val v3 = img((1L, "a", 11L), (4L, "c", 41L), (5L, "a", 50L)) // del 3, upd 4, ins 5

  test("materializeLog appends each transition's diff once, stamped with its version") {
    val wh = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    commit(wh, v1); commit(wh, v2)
    val first = ChangeFeed.materializeLog(wh, "t", keys, logDir)
    assert(first == Seq(wh.versions()(1)))

    // logged rows == the batch diff for that transition
    val expected = ChangeFeed.tableChanges(wh, "t", wh.versions()(0),
      wh.versions()(1), keys)
    assert(logRows(logDir).drop("_commit_version")
      .exceptAll(expected).isEmpty &&
      expected.exceptAll(logRows(logDir).drop("_commit_version")).isEmpty)

    // idempotent: nothing new to log, nothing appended
    assert(ChangeFeed.materializeLog(wh, "t", keys, logDir).isEmpty)
    assert(logRows(logDir).count() == expected.count())

    // incremental: a third commit logs ONLY the new transition
    commit(wh, v3)
    val second = ChangeFeed.materializeLog(wh, "t", keys, logDir)
    assert(second == Seq(wh.versions()(2)))
    val vs = wh.versions()
    assert(logRows(logDir).filter(col("_commit_version") === vs(2))
      .drop("_commit_version")
      .exceptAll(ChangeFeed.tableChanges(wh, "t", vs(1), vs(2), keys)).isEmpty)
  }

  test("delta drain folds only new transitions into checkpointed state") {
    val wh = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    commit(wh, v1); commit(wh, v2)
    ChangeFeed.materializeLog(wh, "t", keys, logDir)

    val sign = when(col("change_type").isin("insert", "update_post"),
      lit(1L)).otherwise(lit(-1L))
    def drain(): Map[String, (Long, Long)] =
      StreamingOps.changeFeedDeltas(spark, logDir,
        ChangeFeed.logSchema(schema, keys), Seq("grp"),
        Seq(sum(sign).as("dn"), sum(col("amount") * sign).as("da")), ckpt)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def applied(img0: DataFrame, deltas: Map[String, (Long, Long)],
                target: DataFrame): Unit = {
      val base = img0.groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("amount").as("a"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val merged = (base.keySet ++ deltas.keySet).map { g =>
        val (bn, ba) = base.getOrElse(g, (0L, 0L))
        val (dn, da) = deltas.getOrElse(g, (0L, 0L))
        g -> (bn + dn, ba + da)
      }.filter(_._2._1 != 0L).toMap
      val direct = target.groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("amount").as("a"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(merged == direct)
    }
    applied(v1, drain(), v2)

    // grow the log, drain the SAME checkpoint: only the new transition
    // streams, the checkpointed state carries the old sums forward
    commit(wh, v3)
    ChangeFeed.materializeLog(wh, "t", keys, logDir)
    applied(v1, drain(), v3)
  }

  test("replica tracks the source; full re-replay converges, not corrupts") {
    val src = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    commit(src, v1); commit(src, v2)
    ChangeFeed.materializeLog(src, "t", keys, logDir)

    val replica = mkWh()
    commit(replica, v1) // seed with the log's starting image
    def same(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    StreamingOps.changeFeedReplica(spark, replica, "t", keys, logDir, ckpt)
    assert(same(replica.read("t"), v2))

    commit(src, v3)
    ChangeFeed.materializeLog(src, "t", keys, logDir)
    StreamingOps.changeFeedReplica(spark, replica, "t", keys, logDir, ckpt)
    assert(same(replica.read("t"), v3))

    // checkpoint reset: the WHOLE log replays in one batch onto the
    // already-current replica — per-version convergent merges land on
    // the same final image (upsert-same-value / delete-absent no-op)
    StreamingOps.changeFeedReplica(spark, replica, "t", keys, logDir,
      Files.createTempDirectory("cdf-ckpt2").toString)
    assert(same(replica.read("t"), v3))
  }

  private val cmp = Seq("grp", "amount")
  private val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
  private val t3 = java.sql.Timestamp.valueOf("2024-01-03 00:00:00")

  private def sameMs(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("applyChanges equals the snapshot merge and is a fixpoint under redelivery") {
    import graft.etl.Scd2
    val h1 = Scd2.initial(v1, keys, cmp, t1)
    val d12 = ChangeFeed.diff(v1, v2, keys)
    val d23 = ChangeFeed.diff(v2, v3, keys)

    // the theorem the streamed consumer rides on: delta-apply of a
    // correct diff == full-snapshot merge, row for row
    val viaDelta2 = Scd2.applyChanges(h1, d12, keys, cmp, t2)
    val viaMerge2 = Scd2.merge(h1, v2, keys, cmp, t2)
    assert(sameMs(viaDelta2, viaMerge2))

    // redelivery: re-applying an ALREADY-APPLIED delta at the same
    // asOf changes nothing (upsert-unchanged keeps, delete-absent
    // drops to the empty array) — an applied history is a fixpoint
    assert(sameMs(Scd2.applyChanges(viaMerge2, d12, keys, cmp, t2), viaMerge2))

    // and it chains across transitions
    val viaDelta3 = Scd2.applyChanges(viaDelta2, d23, keys, cmp, t3)
    assert(sameMs(viaDelta3, Scd2.merge(viaMerge2, v3, keys, cmp, t3)))

    // split-batch healing (what changeFeedScd2's at-or-after-the-mark
    // guard leans on): a PARTIAL delta applied first, then the full
    // delta re-applied at the same asOf, lands on the full apply —
    // the already-applied rows degenerate to no-ops
    val part = d12.filter(col("id") <= 2)
    val healed = Scd2.applyChanges(
      Scd2.applyChanges(h1, part, keys, cmp, t2), d12, keys, cmp, t2)
    assert(sameMs(healed, viaMerge2))
  }

  test("changeFeedScd2 folds the log into a warehouse history; replays converge") {
    import graft.etl.Scd2
    val src = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    commit(src, v1); commit(src, v2)
    ChangeFeed.materializeLog(src, "t", keys, logDir)

    val curSchema = StructType(schema.fields :+
      StructField("valid_from", TimestampType))
    val cloSchema = StructType(curSchema.fields :+
      StructField("valid_to", TimestampType))
    val hist = new Warehouse(spark,
      Files.createTempDirectory("wh-scd2").toString,
      Map("cur" -> curSchema, "clo" -> cloSchema),
      partitionSpec = Map.empty, bucketSpec = Map("cur" -> ("id", 4)))
    val t0 = hist.begin()
    t0.overwrite("cur", v1.withColumn("valid_from", lit(t1)))
    t0.commit()
    // resolved at apply time, so it covers versions committed between
    // drains (the source's version ids are opaque; order is the map)
    val asOfFor = (v: Long) =>
      Seq(t1, t2, t3)(src.versions().sorted.indexOf(v))

    def drain(ck: String): Unit =
      StreamingOps.changeFeedScd2(spark, hist, "cur", "clo", schema,
        keys, cmp, logDir, asOfFor, ck)
    def history: DataFrame = Scd2.readHistory(hist, "cur", "clo")

    val ref2 = Scd2.merge(Scd2.initial(v1, keys, cmp, t1), v2, keys, cmp, t2)
    drain(ckpt)
    assert(sameMs(history, ref2))

    // incremental drain on the SAME checkpoint: only the new
    // transition applies
    commit(src, v3)
    ChangeFeed.materializeLog(src, "t", keys, logDir)
    val ref3 = Scd2.merge(ref2, v3, keys, cmp, t3)
    drain(ckpt)
    assert(sameMs(history, ref3))

    // checkpoint reset: the whole log redelivers in one batch — SCD2
    // apply is NOT convergent, so this is the high-water-mark guard's
    // test: every version's asOf is ≤ the history's own max stamp,
    // all skip, the history is untouched
    drain(Files.createTempDirectory("cdf-ckpt2").toString)
    assert(sameMs(history, ref3))
  }

  test("netChanges equals the direct two-image diff; round-trips vanish") {
    val wh = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    // v4 makes every fold class appear: vs v1 — key1 updated then
    // REVERTED (vanish), key2 deleted then REINSERTED with the same
    // value (vanish), key3 deleted (net delete), key4 inserted then
    // updated (net single insert with the final value), key5 inserted
    // then deleted (vanish)
    val v4 = img((1L, "a", 10L), (4L, "c", 41L), (2L, "a", 20L))
    Seq(v1, v2, v3, v4).foreach(commit(wh, _))
    ChangeFeed.materializeLog(wh, "t", keys, logDir)

    val net = ChangeFeed.netChanges(logRows(logDir), keys)
    val direct = ChangeFeed.diff(v1, v4, keys)
    assert(net.exceptAll(direct).isEmpty && direct.exceptAll(net).isEmpty)
    assert(net.count() == 2) // del 3 + ins 4 — the three round-trips left nothing
  }

  test("a replica bootstrapped from the compacted log converges to the source") {
    val src = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    Seq(v1, v2, v3).foreach(commit(src, _))
    ChangeFeed.materializeLog(src, "t", keys, logDir)

    // fold through the MIDDLE version: net(v1→v2) + verbatim v2→v3
    // tail — the bootstrap shape a new consumer reads
    val sch = ChangeFeed.logSchema(schema, keys)
    val compDir = Files.createTempDirectory("cdf-compact").toString + "/log"
    val vs = src.versions()
    ChangeFeed.compactLog(spark, logDir, compDir, sch, keys, vs(1))
    assert(spark.read.schema(sch).parquet(ChangeFeed.logGlob(compDir))
      .select("_commit_version").distinct().count() == 2)

    val replica = mkWh()
    commit(replica, v1)
    StreamingOps.changeFeedReplica(spark, replica, "t", keys, compDir,
      Files.createTempDirectory("cdf-ckpt").toString)
    assert(sameMs(replica.read("t"), v3))

    // the original log is untouched — existing checkpoints keep their
    // append-only contract
    assert(sameMs(ChangeFeed.netChanges(logRows(logDir), keys),
      ChangeFeed.diff(v1, v3, keys)))
  }

  test("changeFeedAnnIndex: streamed index == cold rebuild through inserts/updates/deletes; " +
    "full re-replay converges") {
    import graft.operators.Similarity
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def vec(seed: Long): Array[Float] =
      Array.tabulate(16)(d => ((seed * 31 + d * 7) % 13).toFloat - 6f)
    def img(ids: Seq[Long], bump: Set[Long] = Set.empty): DataFrame = {
      val rows = ids.map(i => Row(i,
        if (bump(i)) vec(i + 500) else vec(i)))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), embSchema)
    }
    val coPred = col("vec_id") % 7 === 1
    val pqPred = col("vec_id") % 5 === 0 && col("vec_id") < 100
    // seeds (ids ≤ 20 matching the predicates) present from v1 on and
    // never mutated — the fixed-codebook contract
    val v1Ids = (0L to 20L)
    val v2Ids = (0L to 24L).filterNot(_ == 9L) // ins 21-24, del 9
    val finalBump = Set(13L) // upd 13 (non-seed) in v3
    val v3Ids = (0L to 26L).filterNot(_ == 9L)
    val src = new Warehouse(spark,
      Files.createTempDirectory("sann-src").toString,
      Map("emb" -> embSchema), partitionSpec = Map.empty,
      bucketSpec = Map("emb" -> ("vec_id", 4)))
    def commitEmb(df: DataFrame): Unit = {
      val t = src.begin(); t.overwrite("emb", df); t.commit()
    }
    Seq(img(Nil), img(v1Ids), img(v2Ids), img(v3Ids, finalBump))
      .foreach(commitEmb)
    val logDir = Files.createTempDirectory("sann-log").toString
    ChangeFeed.materializeLog(src, "emb", Seq("vec_id"), logDir)
    val idxSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("co_id", LongType),
      StructField("codes", ArrayType(LongType))))
    val idxWh = new Warehouse(spark,
      Files.createTempDirectory("sann-idx").toString,
      Map("annidx" -> idxSchema), partitionSpec = Map.empty,
      bucketSpec = Map.empty)
    locally {
      val t = idxWh.begin()
      t.overwrite("annidx", idxWh.emptyDf("annidx")); t.commit()
    }
    val finalImg = img(v3Ids, finalBump)
    val seeds = finalImg.filter(coPred || pqPred)
    def drain(ckpt: String): Unit =
      StreamingOps.changeFeedAnnIndex(spark, idxWh, "annidx", embSchema,
        seeds, coPred, pqPred, m = 4, logDir, ckpt)
    drain(Files.createTempDirectory("sann-ck1").toString)
    def idxRows = idxWh.read("annidx")
      .select(col("vec_id"), col("co_id"), array_join(col("codes"), ","))
      .collect().map(_.toString).sorted.toSeq
    val cold = Similarity.ivfpqIndex(finalImg, coPred, pqPred, m = 4)
      .select(col("vec_id"), col("co_id"), array_join(col("codes"), ","))
      .collect().map(_.toString).sorted.toSeq
    val streamed = idxRows
    assert(streamed.nonEmpty && streamed == cold,
      s"streamed index != cold rebuild\n streamed=$streamed\n cold=$cold")
    assert(!streamed.exists(_.startsWith("[9,")), "deleted vec 9 still indexed")
    // the updated vector must carry codes for its NEW embedding (the
    // cold rebuild of the final image already proves it, but pin the
    // re-encode explicitly against a stale-v2 rebuild)
    val stale = Similarity.ivfpqIndex(img(v3Ids), coPred, pqPred, m = 4)
      .filter(col("vec_id") === 13L)
      .select(col("vec_id"), col("co_id"), array_join(col("codes"), ","))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.filter(_.startsWith("[13,")) != stale,
      "update did not re-encode (codes match the pre-update embedding)")
    // FULL redelivery (fresh checkpoint, whole log) onto the current
    // index: deletes drop absent keys, appends anti-join away,
    // updates drop-then-re-encode identically — the index converges
    drain(Files.createTempDirectory("sann-ck2").toString)
    assert(idxRows == streamed, "full re-replay did not converge")
  }

  test("vacuumLog: reclaims the applied prefix in place; guards frontier and high-water mark") {
    val wh = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    commit(wh, v1); commit(wh, v2); commit(wh, v3)
    ChangeFeed.materializeLog(wh, "t", keys, logDir)
    val vs = ChangeFeed.loggedVersions(logDir)
    assert(vs.size == 2) // two transitions (v1->v2, v2->v3)

    // a horizon beyond the slowest consumer's watermark is refused
    val ex = intercept[IllegalArgumentException](
      ChangeFeed.vacuumLog(logDir, vs.last, minConsumerApplied = vs.head))
    assert(ex.getMessage.contains("not yet folded"))

    // every consumer has applied everything: the prefix goes, the
    // high-water transition survives even though it is <= the horizon
    val deleted = ChangeFeed.vacuumLog(logDir, vs.last, minConsumerApplied = vs.last)
    assert(deleted == Seq(vs.head))
    assert(ChangeFeed.loggedVersions(logDir) == Seq(vs.last))
    assert(!Files.exists(java.nio.file.Paths.get(logDir, s"t${vs.head}")))

    // catch-up after a vacuum stays INCREMENTAL: a new commit appends
    // exactly one new transition (no full-history rewrite, no
    // double-logging of the surviving mark)
    commit(wh, img((1L, "a", 12L), (4L, "c", 41L), (5L, "a", 50L)))
    val newly = ChangeFeed.materializeLog(wh, "t", keys, logDir)
    assert(newly == Seq(wh.versions().max))
    assert(ChangeFeed.loggedVersions(logDir) == Seq(vs.last, wh.versions().max))

    // the surviving tail still drives a consumer: a replica seeded at
    // the vacuum horizon's image folds the tail to the live image
    val replica = mkWh()
    commit(replica, v3) // seed = snapshot at the horizon
    StreamingOps.changeFeedReplica(spark, replica, "t", keys, logDir,
      Files.createTempDirectory("cdf-ck").toString)
    val live = wh.read("t")
    assert(replica.read("t").exceptAll(live).isEmpty &&
      live.exceptAll(replica.read("t")).isEmpty)
  }

  test("changeFeedSignatureStore: streamed store == cold rebuild through " +
    "inserts/updates/deletes; full re-replay converges") {
    import graft.operators.Dedup
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def words(seed: Long, extra: String = ""): String =
      (0 until 8).map(i => s"w${(seed * 13 + i * 7) % 23}").mkString(" ") + extra
    def img(ids: Seq[Long], bump: Set[Long] = Set.empty): DataFrame = {
      val rows = ids.map(i => Row(i,
        if (bump(i)) words(i, " changed text here") else words(i)))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), docSchema)
    }
    val v1Ids = (0L to 20L)
    val v2Ids = (0L to 24L).filterNot(_ == 9L) // ins 21-24, del 9
    val finalBump = Set(13L)                   // upd 13 in v3
    val v3Ids = (0L to 26L).filterNot(_ == 9L)
    val src = new Warehouse(spark,
      Files.createTempDirectory("sdd-src").toString,
      Map("docs" -> docSchema), partitionSpec = Map.empty,
      bucketSpec = Map("docs" -> ("doc_id", 4)))
    Seq(img(Nil), img(v1Ids), img(v2Ids), img(v3Ids, finalBump)).foreach { d =>
      val t = src.begin(); t.overwrite("docs", d); t.commit()
    }
    val logDir = Files.createTempDirectory("sdd-log").toString
    ChangeFeed.materializeLog(src, "docs", Seq("doc_id"), logDir)
    val storeSchema = StructType(StructField("doc_id", LongType) +:
      (0 until 8).map(j => StructField(s"m$j", LongType)))
    val storeWh = new Warehouse(spark,
      Files.createTempDirectory("sdd-idx").toString,
      Map("sigstore" -> storeSchema), partitionSpec = Map.empty,
      bucketSpec = Map.empty)
    locally {
      val t = storeWh.begin()
      t.overwrite("sigstore", storeWh.emptyDf("sigstore")); t.commit()
    }
    def drain(ckpt: String): Unit =
      StreamingOps.changeFeedSignatureStore(spark, storeWh, "sigstore",
        docSchema, n = 3, logDir, ckpt)
    drain(Files.createTempDirectory("sdd-ck1").toString)
    def storeRows = storeWh.read("sigstore")
      .collect().map(_.toString).sorted.toSeq
    val cold = Dedup.signatureStore(img(v3Ids, finalBump), n = 3)
      .collect().map(_.toString).sorted.toSeq
    val streamed = storeRows
    assert(streamed.nonEmpty && streamed == cold,
      s"streamed store != cold rebuild\n streamed=$streamed\n cold=$cold")
    assert(!streamed.exists(_.startsWith("[9,")), "deleted doc 9 still in store")
    // the updated doc must carry the signature of its NEW text
    val stale = Dedup.signatureStore(img(v3Ids), n = 3)
      .filter(col("doc_id") === 13L).collect().map(_.toString).sorted.toSeq
    assert(streamed.filter(_.startsWith("[13,")) != stale,
      "update did not re-sign (signature matches the pre-update text)")
    // FULL redelivery onto the current store converges
    drain(Files.createTempDirectory("sdd-ck2").toString)
    assert(storeRows == streamed, "full re-replay did not converge")
  }

  test("changeFeedImageHashStore: streamed store == cold rebuild through " +
    "inserts/updates/deletes; wav excluded; full re-replay converges") {
    import graft.operators.Multimodal
    // media payloads derive deterministically from a SOURCE id, so an
    // UPDATE is modeled by re-sourcing a doc's payload from src = id+3
    // (≡ 0 mod 3: fmt stable, never wav)
    def media(ids: Seq[Long], resourced: Set[Long] = Set.empty): DataFrame = {
      val base = Multimodal.attachMediaPayload(
        ids.filterNot(resourced).toDF("doc_id"))
      if (resourced.isEmpty) base
      else base.unionByName(Multimodal.attachMediaPayload(
          resourced.toSeq.map(_ + 3).toDF("doc_id"))
        .select((col("doc_id") - 3).as("doc_id"), col("fmt"), col("payload")))
    }
    val mediaSchema = media(Seq(0L)).schema
    val v1Ids = (0L to 20L)                      // ids %3==1 are wav
    val v2Ids = (0L to 24L).filterNot(_ == 9L)   // ins 21-24, del 9
    val v3Ids = (0L to 26L).filterNot(_ == 9L)
    val bump = Set(12L)                          // payload update in v3
    val src = new Warehouse(spark,
      Files.createTempDirectory("smm-src").toString,
      Map("media" -> mediaSchema), partitionSpec = Map.empty,
      bucketSpec = Map("media" -> ("doc_id", 4)))
    Seq(media(Nil), media(v1Ids), media(v2Ids), media(v3Ids, bump))
      .foreach { d => val t = src.begin(); t.overwrite("media", d); t.commit() }
    val logDir = Files.createTempDirectory("smm-log").toString
    ChangeFeed.materializeLog(src, "media", Seq("doc_id"), logDir)
    val storeSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("fmt", StringType),
      StructField("width", LongType), StructField("height", LongType)) ++
      (0 until 4).map(j => StructField(s"b$j", LongType)))
    val storeWh = new Warehouse(spark,
      Files.createTempDirectory("smm-idx").toString,
      Map("hashstore" -> storeSchema), partitionSpec = Map.empty,
      bucketSpec = Map.empty)
    locally {
      val t = storeWh.begin()
      t.overwrite("hashstore", storeWh.emptyDf("hashstore")); t.commit()
    }
    def drain(ckpt: String): Unit =
      StreamingOps.changeFeedImageHashStore(spark, storeWh, "hashstore",
        mediaSchema, logDir, ckpt)
    drain(Files.createTempDirectory("smm-ck1").toString)
    def storeRows = storeWh.read("hashstore")
      .collect().map(_.toString).sorted.toSeq
    val cold = Multimodal.imageAHash(
        media(v3Ids, bump).filter(col("fmt") =!= "wav"))
      .collect().map(_.toString).sorted.toSeq
    val streamed = storeRows
    assert(streamed.nonEmpty && streamed == cold,
      s"streamed store != cold rebuild\n streamed=$streamed\n cold=$cold")
    assert(!streamed.exists(_.startsWith("[9,")), "deleted doc 9 still in store")
    assert(!streamed.exists(_.contains("wav")), "wav payload hashed")
    // the updated doc must carry the hash of its NEW pixels
    val stale = Multimodal.imageAHash(
        media(v3Ids).filter(col("doc_id") === 12L))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.filter(_.startsWith("[12,")) != stale,
      "update did not re-hash (aHash matches the pre-update payload)")
    // FULL redelivery onto the current store converges
    drain(Files.createTempDirectory("smm-ck2").toString)
    assert(storeRows == streamed, "full re-replay did not converge")
  }

  test("a zero-change transition commits an empty marked dir and advances the mark") {
    val wh = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    commit(wh, v1); commit(wh, v2); commit(wh, v2) // third commit changes nothing
    val vs = wh.versions()
    assert(ChangeFeed.materializeLog(wh, "t", keys, logDir) ==
      Seq(vs(1), vs(2)))
    // idempotent THROUGH the empty trailing transition: the marked-dir
    // high-water mark advanced, so nothing is re-reported or re-diffed
    assert(ChangeFeed.materializeLog(wh, "t", keys, logDir).isEmpty)
    assert(ChangeFeed.loggedVersions(logDir) == Seq(vs(1), vs(2)))
    assert(logRows(logDir).filter(col("_commit_version") === vs(2)).isEmpty)
  }

  test("materializeLog fails loudly when vacuum pruned the logged high-water version") {
    val wh = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    commit(wh, v1); commit(wh, v2)
    ChangeFeed.materializeLog(wh, "t", keys, logDir) // logged through v2
    commit(wh, v3); commit(wh, v1)
    wh.vacuum(retainVersions = 1, graceMs = 0) // retains only the last two
    assert(!wh.versions().contains(ChangeFeed.loggedVersions(logDir).max))
    // re-diffing a wider span would double-log rows already in the log
    // (corrupting every delta-folding consumer) — refuse instead
    val e = intercept[IllegalArgumentException] {
      ChangeFeed.materializeLog(wh, "t", keys, logDir)
    }
    assert(e.getMessage.contains("re-bootstrap"))
  }
}
