package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join returns exactly the plain join's rows on skewed data") {
    // 90% of fact rows hit one hot key
    val fact = (1 to 5000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), salt = 8,
        saltSource = Seq("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.sameElements(plain))
    assert(plain.length == 4500 + (1 to 5000).count(i => i % 10 == 0 && Seq(1, 3).contains(i % 7)))
  }

  test("AQE skew-join splits the same skewed join automatically when enabled") {
    // The runtime counterpart of saltedJoin: AQE detects an oversized
    // shuffle partition at the sort-merge join's read side and SPLITS
    // it (replicating the matching other-side partition) — no code
    // change, but only AFTER a shuffle materializes, only for
    // SMJ/SHJ, and never inside streaming (AQE is off there). Manual
    // salting remains the tool when the skew is KNOWN up front (plan
    // it away before the first shuffle), when the engine must not
    // rely on runtime re-planning, or in streaming joins. Thresholds
    // here are shrunk so bench-scale data trips the same machinery a
    // 100 TB hot key would.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val fact = (1 to 60000).map(i =>
        (if (i % 20 == 0) s"k${i % 7}" else "hot", i.toLong)).toDF("k", "v")
      val dim = (0 to 6).map(i => (s"k$i", s"N$i")).toDF("k", "name")
        .unionAll(Seq(("hot", "H")).toDF("k", "name"))
      val joined = fact.join(dim, Seq("k"))
      // execute THIS frame (count() would plan a separate query and the
      // final adaptive plan would stay unobserved on `joined`)
      val got = joined.collect().length
      assert(got == 60000, "skew split must not change the result")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ under AQE:\n$plan")
      assert(plan.toLowerCase.contains("skew"),
        s"AQE must mark the skewed join (isSkew/skewed in the final plan):\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("salt spreads the hot key across partitions") {
    val fact = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val salts = fact.select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash($"v"),
        org.apache.spark.sql.functions.lit(8)))
      .distinct().count()
    assert(salts == 8)
  }
}
