package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Containment-cap A/B at a scale factor: wall-clock + output size of
  * `Dedup.wordGramContainment` under (a) the BUDGETED cap (r12 —
  * `candidateBudgetPerDoc = 64`, derived from the corpus's own band
  * census), (b) the fixed 64 dial r11 measured by hand, and (c) the
  * historic fixed 256. The r12 claim under test: the auto cap lands at
  * (or near) the hand-measured dial's wall-clock on the template-dense
  * fixture, without anyone discovering the dial.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf3 runMain graft.CapProbe
  */
object CapProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
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
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    // the dedup_containment fixture at derived (collision-free) offsets
    val d = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val off = (d.agg(max("doc_id")).head.getLong(0) / 100000L + 1L) * 100000L
    val aug = d
      .unionAll(d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 3 * off).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " ", -1), 1, 12)).as("text")))
      .unionAll(d.filter(col("doc_id") % 23 === 0)
        .select((col("doc_id") + 2 * off).as("doc_id"), col("text")))
      .cache()
    val nDocs = aug.count()

    def run(tag: String)(mk: DataFrame => DataFrame): String = {
      spark.catalog.clearCache(); aug.cache(); aug.count()
      val (pairs, secs) = time(mk(aug).count())
      f"""{"cell":"$tag","n_docs":$nDocs,"pairs":$pairs,"secs":$secs%.2f}"""
    }
    // untimed warm-up at the tight dial: the first containment run in a
    // JVM pays JIT/codegen for the whole pipeline — without this the
    // first CELL carries it and the A/B reads as a cap effect
    run("warmup")(a => Dedup.wordGramContainment(a, 0.9, maxBucket = 64,
      candidateBudgetPerDoc = None))
    // `default` runs BEFORE the 70-second fixed256 cell: the r13 sf3
    // run measured the default cell 5 s slower than the identical
    // explicit-budget cell purely from same-JVM ordering (it ran last,
    // after fixed256's allocation churn)
    val cells = Seq(
      run("budget64perdoc")(a => Dedup.wordGramContainment(a, 0.9,
        candidateBudgetPerDoc = Some(64))),
      run("default")(a => Dedup.wordGramContainment(a, 0.9)),
      run("fixed64")(a => Dedup.wordGramContainment(a, 0.9, maxBucket = 64,
        candidateBudgetPerDoc = None)),
      run("fixed256")(a => Dedup.wordGramContainment(a, 0.9, maxBucket = 256,
        candidateBudgetPerDoc = None)))
    println(s"""{"probe":"containment_cap","sf":"$sfDir","cells":[
${cells.mkString(",\n")}]}""")
    spark.stop()
  }
}
