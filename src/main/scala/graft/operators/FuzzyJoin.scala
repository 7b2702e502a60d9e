package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Approximate string matching between two tables — the entity-
  * resolution primitive (vendor-name reconciliation, benchmark-title
  * matching, near-identical label merging) that exact equi joins can't
  * express and an all-pairs `levenshtein` cross join can't survive.
  *
  * Shape: character-TRIGRAM blocking, then the exact edit distance on
  * candidates only — the n-gram analogue of the MinHash band join in
  * [[Dedup]]. Each side explodes to its DISTINCT trigrams (map-side,
  * one row per (id, gram)), candidates are the pairs sharing ≥1 gram
  * (one hash join on the gram), and only candidates pay the O(|a|·|b|)
  * `levenshtein` (codegen'd Catalyst expression, no UDF).
  *
  * Recall: two strings within edit distance d share a trigram whenever
  * min-length ≥ 3(d+1) + 2 (each edit can destroy at most 3 grams —
  * pigeonhole), so for names ≥ 11 chars at d ≤ 2 the blocking is
  * lossless; shorter strings fall back to their whole text as the gram.
  * At 100 TB the known hazard is gram-frequency skew (a gram shared by
  * every row degenerates to a self-join): `maxGramDf` drops STOP-GRAMS
  * (grams above a document-frequency cap) from both sides — the same
  * cap-the-bucket trade as the LSH family. Candidates shrink from the
  * head of the gram-frequency distribution; a true pair is lost only
  * if EVERY shared gram is a stop-gram, and the pigeonhole bound
  * weakens by one destroyed-gram budget per dropped SHARED gram —
  * pairs sharing ≥ 1 sub-cap gram survive exactly (spec-asserted).
  */
object FuzzyJoin {

  private def grams(df: DataFrame, id: String, c: String): DataFrame =
    df.select(col(id), explode(array_distinct(expr(
      s"transform(sequence(1, greatest(length($c) - 2, 1)), i -> substring($c, i, 3))")))
      .as("g"))

  /** All (leftId, rightId, dist) pairs with edit distance ≤ `maxDist`
    * among trigram-sharing candidates. `maxGramDf` (None = exact
    * blocking) caps a gram's COMBINED document frequency across both
    * sides; over-cap grams generate no candidates.
    */
  def trigramBlocked(left: DataFrame, right: DataFrame,
                     leftId: String, leftCol: String,
                     rightId: String, rightCol: String,
                     maxDist: Int,
                     maxGramDf: Option[Int] = None): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(maxGramDf.forall(_ >= 1), "maxGramDf must be positive")
    val lg = grams(left.select(leftId, leftCol), leftId, leftCol)
    val rg = grams(right.select(rightId, rightCol), rightId, rightCol)
    val (lk, rk) = maxGramDf match {
      case None => (lg, rg)
      case Some(cap) =>
        // one tiny aggregate over the gram lists; the keep-set joins
        // back as a broadcast-sized filter (gram space ≪ corpus)
        val keep = lg.select(col("g")).unionAll(rg.select(col("g")))
          .groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("g")
        (lg.join(keep, Seq("g")), rg.join(keep, Seq("g")))
    }
    // The verify stage is CPU-bound (levenshtein per candidate), but its
    // rows are NARROW (two ids) — AQE's byte-based coalescing would pack
    // the whole candidate set into one or two post-shuffle partitions and
    // serialize minutes of edit-distance work onto one core (measured at
    // sf1: one 400 s task while 31 cores idled). The dedup exchange is
    // therefore a USER repartition pinned to the session's parallelism —
    // AQE never coalesces those — and dropDuplicates reuses its
    // partitioning, so the pin costs no extra shuffle vs distinct().
    val n = left.sparkSession.sparkContext.defaultParallelism
    val cand = lk.join(rk, Seq("g"))
      .repartition(n, col(leftId), col(rightId))
      .dropDuplicates(leftId, rightId)
      .select(col(leftId), col(rightId))
    cand
      .join(left.select(leftId, leftCol), Seq(leftId))
      .join(right.select(rightId, rightCol), Seq(rightId))
      // 3-arg banded levenshtein: with the threshold the kernel computes
      // only the |2·maxDist+1|-wide diagonal band and early-exits to -1
      // the moment the distance provably exceeds it — O(len·maxDist)
      // instead of O(len²) per candidate pair.
      .withColumn("dist",
        levenshtein(col(leftCol), col(rightCol), maxDist).cast(LongType))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col(leftId), col(rightId), col("dist"))
  }
}
