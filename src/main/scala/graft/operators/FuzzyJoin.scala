package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Approximate string matching between two tables — the entity-
  * resolution primitive (vendor-name reconciliation, benchmark-title
  * matching, near-identical label merging) that exact equi joins can't
  * express and an all-pairs `levenshtein` cross join can't survive.
  *
  * Shape: character-TRIGRAM blocking with PREFIX FILTERING, then the
  * exact edit distance on candidates only — the n-gram analogue of the
  * MinHash band join in [[Dedup]]. Each side explodes to its DISTINCT
  * trigrams (map-side, one row per (id, gram)), each string indexes
  * only its 3·maxDist+1 rarest grams (global df order — the AllPairs/
  * Ed-Join prefix principle, lossless for edit distance), candidates
  * are the pairs colliding on an indexed gram (one hash join), and
  * only candidates pay the banded `levenshtein` (codegen'd Catalyst
  * expression, no UDF).
  *
  * Recall: two strings within edit distance d share a q-gram whenever
  * min-length ≥ q(d+1) + q−1 (each edit can destroy at most q grams —
  * pigeonhole; 11 chars at q=3, d ≤ 2), so for long-enough strings the
  * blocking is lossless; shorter strings fall back to their whole text
  * as the gram. At 100 TB the known hazard is gram-frequency skew (a
  * gram shared by every row degenerates to a self-join): `maxGramDf`
  * drops STOP-GRAMS (grams above a document-frequency cap) from both
  * sides — the same cap-the-bucket trade as the LSH family. Candidates
  * shrink from the head of the gram-frequency distribution; a true
  * pair is lost only if EVERY shared gram is a stop-gram, and the
  * pigeonhole bound weakens by one destroyed-gram budget per dropped
  * SHARED gram — pairs sharing ≥ 1 sub-cap gram survive exactly
  * (spec-asserted).
  *
  * `gramLen` is the OTHER scale lever: on low-entropy keys the gram
  * ALPHABET itself saturates — digit tails yield only 10^q distinct
  * digit q-grams, so with n strings each gram's df grows ~n/10^q and
  * CANDIDATES grow ~n²/10^q regardless of blocking discipline; raising
  * q decimal-decimates candidate density at the cost of a
  * proportionally longer min-length for the lossless bound (q grows
  * with log n, exactly like the LSH family's bandBits). It only pays
  * when candidates ≫ matches, though: measured at sf1 (10k suppliers,
  * zero-padded tails) the workload is MATCH-bound — near-consecutive
  * ids genuinely sit within edit distance 2, so the true output is
  * 3.9M pairs (×19.6 vs sf0.1) and runtime 21.5 s (×16.3, SUB-linear
  * per match — the shuffle-∝-matches design holding), while q=4 runs
  * ~1.6× SLOWER than q=3 because each surviving pair re-verifies once
  * per shared indexed gram and the q·d+1 prefix indexes 9 grams
  * instead of 7. Identical match sets q=3 vs q=4 are spec-asserted.
  */
object FuzzyJoin {

  /** (id, string, gram) rows — the string RIDES ALONG so the verify can
    * run map-side inside the gram-join stage with no join-back of the
    * base tables (gram rows are short-string-wide; the carried column
    * costs ~20 bytes and saves two candidate-volume joins).
    */
  private def grams(df: DataFrame, id: String, c: String, q: Int): DataFrame =
    df.select(col(id), col(c), explode(array_distinct(expr(
      s"transform(sequence(1, greatest(length($c) - ${q - 1}, 1)), i -> substring($c, i, $q))")))
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
                     maxGramDf: Option[Int] = None,
                     gramLen: Int = 3): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(maxGramDf.forall(_ >= 1), "maxGramDf must be positive")
    require(gramLen >= 2, "gramLen must be at least 2")
    val lg = grams(left.select(leftId, leftCol), leftId, leftCol, gramLen)
    val rg = grams(right.select(rightId, rightCol), rightId, rightCol, gramLen)
    val (lk, rk) = maxGramDf match {
      case None =>
        // PREFIX FILTERING (AllPairs/Ed-Join): index only each string's
        // 3·maxDist+1 RAREST grams under a global (df, gram) order.
        // Edit distance ≤ d destroys at most 3 gram types per edit, so
        // |G(a)∩G(b)| ≥ max(|G(a)|,|G(b)|) − 3d — and by the prefix
        // principle two sets with that overlap must collide inside
        // their (3d+1)-prefixes. Exactness-preserving, and it is what
        // keeps the uncapped path alive under LOW-ENTROPY keys: names
        // sharing a hot constant prefix ("Supplier#000…") degenerate to
        // an all-pairs join when ANY shared gram blocks (measured at
        // sf1: 10⁸ candidates, 272 s), but their rarest grams are the
        // distinguishing digit tails, so candidates collapse to the
        // near-duplicates. The capped path below stays gram-complete
        // instead: its contract ("pairs sharing ≥1 sub-cap gram survive
        // exactly") is strictly wider than the prefix guarantee.
        val gramDf = lg.select(col("g")).unionAll(rg.select(col("g")))
          .groupBy("g").agg(count(lit(1)).as("df"))
        def pfx(side: DataFrame, id: String, c: String): DataFrame =
          side.join(gramDf, Seq("g"))
            .withColumn("rk", row_number().over(
              Window.partitionBy(col(id)).orderBy(col("df"), col("g"))))
            .filter(col("rk") <= gramLen * maxDist + 1)
            .select(col(id), col(c), col("g"))
        (pfx(lg, leftId, leftCol), pfx(rg, rightId, rightCol))
      case Some(cap) =>
        // one tiny aggregate over the gram lists; the keep-set joins
        // back as a broadcast-sized filter (gram space ≪ corpus)
        val keep = lg.select(col("g")).unionAll(rg.select(col("g")))
          .groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("g")
        (lg.join(keep, Seq("g")), rg.join(keep, Seq("g")))
    }
    // SHUFFLE ∝ INPUTS + MATCHES, NEVER ∝ CANDIDATES. Deduplicating the
    // candidate pairs before the verify would shuffle the full candidate
    // volume (measured at sf1: ~10⁸ narrow rows — and AQE's byte-based
    // coalescing then packed them into one partition, serializing
    // minutes of edit distance onto one core while 31 idled). Instead
    // the verify runs MAP-SIDE inside the gram-join stage: the strings
    // ride the gram rows, the banded levenshtein evaluates on each
    // collision as it is produced (a pair re-verifies once per shared
    // indexed gram — bounded by the 3d+1 prefix — trading ≤7 cheap
    // banded evaluations for a candidate-volume exchange), and only the
    // MATCHES cross the dedup shuffle. The probe side is repartitioned
    // ROUND-ROBIN up-front: a USER repartition (never AQE-coalesced)
    // that spreads the verify across every core — the parent is often a
    // single parquet file — at gram-row cost only. Deliberately NOT
    // keyed on g: a hot gram hashed to one partition would serialize
    // its whole collision block; round-robin + a broadcast build side
    // spreads a hot gram's probes evenly, and when the build side
    // outgrows broadcast the sort-merge fallback's g-skew is AQE
    // skew-join territory (OptimizeSkewedJoin splits the partition).
    // BOTH sides carry the pin: the planner is free to broadcast either
    // side, and the verify's parallelism is the STREAM side's partition
    // count — pinning only one side leaves a 1-partition stream when
    // the planner happens to broadcast the pinned one (measured: the
    // whole verify serialized onto one core that way).
    val n = left.sparkSession.sparkContext.defaultParallelism
    lk.repartition(n).join(rk.repartition(n), Seq("g"))
      // 3-arg banded levenshtein: with the threshold the kernel computes
      // only the |2·maxDist+1|-wide diagonal band and early-exits to -1
      // the moment the distance provably exceeds it — O(len·maxDist)
      // instead of O(len²) per candidate pair.
      .withColumn("dist",
        levenshtein(col(leftCol), col(rightCol), maxDist).cast(LongType))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col(leftId), col(rightId), col("dist"))
      .dropDuplicates(leftId, rightId)
  }
}
