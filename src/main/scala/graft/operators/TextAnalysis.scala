package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, n-gram/stopword language ID, and content
  * fingerprinting. All built-ins (codegen'd), all integer-count + single
  * division arithmetic → bit-portable against a DuckDB oracle.
  */
object TextAnalysis {

  /** Lower-cased whitespace tokens as an array column. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  /** Canonical text normalization (the pre-dedup / pre-tokenize stage):
    * lower-case, non-alphanumerics to spaces, whitespace collapsed,
    * trimmed. Pure regexp — codegen'd, and identical under Java regex
    * and RE2.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Whitespace token count plus a BPE-ish subword estimate: words are
    * further split at letter/digit boundaries and every 4 chars of a run
    * count as one subword token (a cheap, deterministic proxy for BPE
    * vocab behavior).
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val pieces = filter(split(lower(col(textCol)), "[^a-z0-9]+"), p => p =!= "")
    docs.select(col("doc_id"),
      size(t).as("n_tokens"),
      aggregate(transform(pieces, p => (length(p) + lit(3)).cast("long") / lit(4)),
        lit(0L), (acc, x) => acc + x.cast("long")).as("n_subwords"),
      length(col(textCol)).as("n_chars"))
  }

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopDe = Seq("der", "die", "das", "und", "nicht", "ist")
  private val stopEs = Seq("el", "los", "las", "una", "y", "es")
  private val stopFr = Seq("le", "les", "et", "est", "une", "dans")

  private def stopCount(t: Column, stops: Seq[String]): Column =
    size(filter(t, w => w.isin(stops.map(lit): _*)))

  /** Quality scoring: length, punctuation/digit/stopword ratios, mean
    * word length — the standard cheap heuristics used to filter web text.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t).cast("double")
    val nChars = length(col(textCol)).cast("double")
    val punct = length(col(textCol)) - length(regexp_replace(col(textCol), "[.,!?;:]", ""))
    val digits = length(col(textCol)) - length(regexp_replace(col(textCol), "[0-9]", ""))
    val stopRatio = stopCount(t, stopEn).cast("double") / nTok
    val wordLen = aggregate(transform(t, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double") / nTok
    docs.select(col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      (punct.cast("double") / nChars).as("punct_ratio"),
      (digits.cast("double") / nChars).as("digit_ratio"),
      stopRatio.as("stopword_ratio"),
      wordLen.as("mean_word_len"))
  }

  /** Percentile-cutoff quality filter: keep (at least) the top
    * `keepFrac` fraction of documents by a composite quality score,
    * with the cutoff computed EXACTLY — no sampled quantile, no global
    * row sort. The score is pure BIGINT fixed point (denominators
    * cleared by integer floor division): stopword density up,
    * punctuation and digit density down — higher reads as cleaner
    * prose. Zero-token docs are dropped (no score).
    *
    * Scale shape: scoring is map-side; the only corpus-sized exchange
    * is a partial-combining `groupBy(score_q)` histogram whose key
    * space is HARD-BOUNDED at ~3M values (each term lives in
    * [0, 1e6]), independent of corpus size — so the cumulative-count
    * window that finds the cutoff runs on a bounded tiny frame, and
    * the cutoff broadcasts back into a map-side filter. Ties at the
    * cutoff are all kept ("at least" semantics): deterministic in any
    * engine, unlike a row-ranked cut under score ties. At 100 TB an
    * `approx_percentile` single-pass variant trades this exactness for
    * one fewer aggregation; the exact histogram is cheap enough that
    * the trade is rarely worth it.
    */
  /** (doc_id, n_tokens, score_q): the shared fixed-point quality score —
    * stopword density up, punctuation/digit density down, denominators
    * cleared by nonnegative integer floor division (where Spark's
    * truncate-toward-zero `div` and DuckDB's floor `//` agree).
    * Zero-token docs are dropped.
    */
  private def scoredQ(docs: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(col("doc_id"),
        size(t).cast("long").as("n_tokens"),
        length(col(textCol)).cast("long").as("n_chars"),
        (length(col(textCol)) -
          length(regexp_replace(col(textCol), "[.,!?;:]", ""))).cast("long").as("punct_c"),
        (length(col(textCol)) -
          length(regexp_replace(col(textCol), "[0-9]", ""))).cast("long").as("digit_c"),
        stopCount(t, stopEn).cast("long").as("stop_c"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        expr("stop_c * 1000000 div n_tokens - punct_c * 1000000 div n_chars" +
          " - digit_c * 1000000 div n_chars").as("score_q"))
  }

  def qualityPercentileFilter(docs: DataFrame, keepFrac: Double,
                              textCol: String = "text"): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, "keepFrac must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val ppm = math.round(keepFrac * 1e6) // driver-side exact constant
    val scored = scoredQ(docs, textCol)
    val hist = scored.groupBy("score_q").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("score_q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // n_total as a full-frame window over the SAME tiny histogram, not
    // a second hist.agg crossJoin — that second reference re-ran the
    // whole scoring scan (scoredQ has no exchange to reuse), so the
    // corpus paid the regex-heavy pass three times instead of twice
    val wAll = Window.orderBy(col("score_q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // cum >= ceil(nTotal·keepFrac) ⟺ cum·1e6 >= nTotal·ppm (integers)
    val cutoff = hist.withColumn("cum", sum("cnt").over(w))
      .withColumn("n_total", sum("cnt").over(wAll))
      .filter(col("cum") * lit(1000000L) >= col("n_total") * lit(ppm))
      .agg(max("score_q").as("cutoff"))
    scored.crossJoin(broadcast(cutoff))
      .filter(col("score_q") >= col("cutoff"))
      .select(col("doc_id"), col("score_q"))
  }

  /** TOKEN-BUDGET corpus selection: keep the highest-quality documents
    * until their token sum reaches `budgetTokens` — "fill the training
    * run's budget with the best data first", the selection rule behind
    * quality-ranked pretraining mixes. Same exact-histogram machinery
    * as [[qualityPercentileFilter]] (same bounded score key space, same
    * broadcast cutoff, ties-kept semantics — so the result slightly
    * overshoots the budget rather than making a nondeterministic
    * within-tie pick); the histogram aggregates SUM(n_tokens) instead
    * of doc counts. A corpus whose total falls short of the budget is
    * kept whole. Output: (doc_id, n_tokens, score_q) of survivors.
    */
  def tokenBudgetSelect(docs: DataFrame, budgetTokens: Long,
                        textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val scored = scoredQ(docs, textCol)
    val hist = scored.groupBy("score_q").agg(sum("n_tokens").as("tok"))
    val w = Window.orderBy(col("score_q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // max score whose desc-cumulative token sum crosses the budget;
    // no crossing (total < budget) -> keep everything
    val cutoff = hist.withColumn("cum", sum("tok").over(w))
      .filter(col("cum") >= budgetTokens)
      .agg(coalesce(max("score_q"), lit(Long.MinValue)).as("cutoff"))
    scored.crossJoin(broadcast(cutoff))
      .filter(col("score_q") >= col("cutoff"))
      .select(col("doc_id"), col("n_tokens"), col("score_q"))
  }

  /** Corpus length statistics — doc count, token total, mean, min/max,
    * and EXACT p50/p90/p99 of tokens-per-doc — via the same bounded
    * histogram: the corpus pays one map pass and one partial-combining
    * `groupBy(n_tokens)`; every percentile then reads off the tiny
    * cumulative frame (percentile p = smallest length whose ascending
    * cumulative count reaches ceil(p·N/100) — `quantile_disc`
    * semantics, deterministic in any engine, no global row sort).
    * Output: (metric, value) rows.
    */
  def lengthStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = docs.select(size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .groupBy("n_tokens").agg(count(lit(1)).as("cnt"))
    val totals = hist.agg(sum("cnt").as("n_docs"),
      sum(col("n_tokens") * col("cnt")).as("tok_total"),
      min("n_tokens").as("mn"), max("n_tokens").as("mx"))
    val w = Window.orderBy(col("n_tokens").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pcts = hist.withColumn("cum", sum("cnt").over(w))
      .crossJoin(broadcast(totals))
      .select(col("n_tokens"), col("cum"), col("n_docs"),
        explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
      .filter(col("cum") * 100 >= col("n_docs") * col("p"))
      .groupBy("p").agg(min("n_tokens").as("v"))
      .select(concat(lit("p"), col("p")).as("metric"),
        col("v").cast("double").as("value"))
    totals.select(explode(map(
        lit("n_docs"), col("n_docs").cast("double"),
        lit("tok_total"), col("tok_total").cast("double"),
        lit("mean"), col("tok_total").cast("double") / col("n_docs").cast("double"),
        lit("min"), col("mn").cast("double"),
        lit("max"), col("mx").cast("double"))).as(Seq("metric", "value")))
      .unionAll(pcts)
  }

  /** DOCUMENT CHUNKING into fixed token windows with overlap — the
    * docs→model-context step before packing/training: chunk `i` covers
    * tokens `[i·stride, i·stride + chunkTokens)` with
    * `stride = chunkTokens - overlap`, the last chunk simply shorter
    * (no padding — that's the packer's job). Output one row per chunk:
    * (doc_id, chunk_id, n_chunk_tokens, chunk_hash), the hash (md5 of
    * the space-joined window) standing in for the chunk text so
    * downstream equality/dedup is cheap and the oracle compare robust.
    *
    * Purely map-side: `sequence` + `posexplode` + `slice` inside one
    * projection — the output is chunk-sized by contract (≈ n/stride
    * rows per doc), and nothing shuffles. Zero-token docs produce no
    * chunks.
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 64, overlap: Int = 16,
                textCol: String = "text"): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      "need chunkTokens > overlap >= 0")
    val stride = chunkTokens - overlap
    docs.select(col("doc_id"), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L),
          expr(s"CAST((size(t) - 1) div $stride AS BIGINT)"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("t"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkTokens)).as("ck"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ck")).cast("long").as("n_chunk_tokens"),
        md5(array_join(col("ck"), " ").cast("binary")).as("chunk_hash"))
  }

  /** THRESHOLD SWEEP over the quality score — the calibration report
    * read before picking a filter cutoff: for each candidate τ, how
    * many documents and tokens survive `score_q ≥ τ`, as counts and
    * ppm rates. Runs entirely off the bounded score histogram (one
    * corpus aggregation; the sweep itself touches only the tiny
    * frame × |thresholds|). Rates are exact integer-scaled divisions.
    * A threshold no document reaches is absent from the output (its
    * survivor set is empty), matching the relational oracle exactly.
    */
  def thresholdSweep(docs: DataFrame, thresholds: Seq[Long],
                     textCol: String = "text"): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val scored = scoredQ(docs, textCol)
    val hist = scored.groupBy("score_q")
      .agg(count(lit(1)).as("cnt"), sum("n_tokens").as("tok"))
    val totals = hist.agg(sum("cnt").as("n_docs"), sum("tok").as("n_tokens"))
    hist.crossJoin(broadcast(totals))
      .select(col("score_q"), col("cnt"), col("tok"), col("n_docs"),
        col("n_tokens"),
        explode(array(thresholds.map(lit(_)): _*)).as("tau"))
      .filter(col("score_q") >= col("tau"))
      .groupBy("tau")
      .agg(sum("cnt").as("keep_docs"), sum("tok").as("keep_tokens"),
        max("n_docs").as("n_docs"), max("n_tokens").as("n_tokens"))
      .select(col("tau"), col("keep_docs"), col("keep_tokens"),
        expr("keep_docs * 1000000 div n_docs").as("doc_rate_ppm"),
        expr("keep_tokens * 1000000 div n_tokens").as("token_rate_ppm"))
  }

  /** MIXTURE REBALANCING to a target distribution: each group (language,
    * source, domain…) is downsampled to `share_ppm · totalOut / 1e6`
    * documents — "mix the corpus to spec", the step that turns a crawl's
    * accidental distribution into the training mix the run was designed
    * for. Groups absent from `sharesPpm` get share 0 (dropped); a group
    * with fewer documents than its quota contributes everything it has
    * (no upsampling — duplication is the dedup pipeline's enemy).
    *
    * Selection within a group is by salted-md5 rank — the same fixed
    * pseudo-random permutation as [[samplePerKey]], so the choice is
    * engine/partitioning-stable and, crucially, MONOTONE in the quota: a
    * larger target keeps a superset of a smaller one (caches and
    * incremental runs stay consistent as the mix is retuned). Shape: the
    * quota table is driver-side constants joined broadcast; one window
    * shuffle on the group key, same as any per-key rank. Output:
    * (doc_id, grp, rb_rank).
    */
  def rebalanceMixture(docs: DataFrame, groupCol: Column,
                       sharesPpm: Seq[(String, Long)], totalOut: Long,
                       idCol: String = "doc_id"): DataFrame = {
    require(totalOut > 0 && sharesPpm.nonEmpty, "need a target size and shares")
    import org.apache.spark.sql.expressions.Window
    val sp = docs.sparkSession
    import sp.implicits._
    val quota = sharesPpm.toDF("grp", "ppm")
      .select(col("grp"), expr(s"ppm * $totalOut div 1000000").as("quota"))
    val w = Window.partitionBy("grp").orderBy(col("rb_h"), col(idCol))
    docs.withColumn("grp", groupCol)
      .join(broadcast(quota), Seq("grp"))
      .withColumn("rb_h", expr(s"md5(CAST($idCol AS STRING) || ':rebal')"))
      .withColumn("rb_rank", row_number().over(w))
      .filter(col("rb_rank") <= col("quota"))
      .select(col(idCol), col("grp"), col("rb_rank"))
  }

  /** Stopword-profile language ID: count membership against per-language
    * stopword lists; argmax wins (ties broken by language code order,
    * zero evidence → 'und'). An n-gram heuristic in the
    * fastText/langdetect tradition, reduced to portable set counting.
    */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val scores = Seq(
      "de" -> stopCount(t, stopDe), "en" -> stopCount(t, stopEn),
      "es" -> stopCount(t, stopEs), "fr" -> stopCount(t, stopFr))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in code order) achieving the max — deterministic
    val lang = scores.foldRight(lit("und")) { case ((code, s), acc) =>
      when(s === best && best > 0, lit(code)).otherwise(acc)
    }
    docs.select(col("doc_id"),
      scores.head._2.as("s_de"), scores(1)._2.as("s_en"),
      scores(2)._2.as("s_es"), scores(3)._2.as("s_fr"),
      lang.as("lang_pred"))
  }

  /** Deterministic train/val/test assignment: the id hashes into one of
    * 100 md5 buckets, and percentage cut-points map buckets to splits.
    * No RNG state — the split is a pure function of the id, so it is
    * stable across runs, engines, partitionings and re-shards, which is
    * exactly what a reproducible training pipeline needs (and what
    * `rand(seed)`-based sampling does NOT give across repartitions).
    */
  def assignSplit(df: DataFrame, idCol: String = "doc_id",
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct <= 100, "train+val must leave room for test")
    val bucket =
      expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100")
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Top-k characteristic terms per document by TF-IDF-style weighting.
    * The IDF factor is the LINEAR rarity weight `(N+1)/(df+1)` rather
    * than its logarithm: `ln` differs by 1 ulp across libm
    * implementations and would poison a bit-exact oracle, while the
    * pure-division form is IEEE-deterministic; per-document RANKING
    * under a fixed tf is identical either way (both are monotone
    * decreasing in df). Shuffles: one tf aggregation on (doc, term),
    * one df aggregation on term, a broadcastable df join, one ranking
    * window per doc. The corpus size N rides along as a broadcast
    * single-row crossJoin (the SQL `CROSS JOIN (SELECT count(*))`
    * idiom) — the operator stays LAZY and single-job, with no hidden
    * count() action at plan-construction time.
    */
  def topTerms(docs: DataFrame, k: Int = 3, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = words.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nn = docs.select(col(idCol)).distinct().agg(count(lit(1)).as("nn"))
    val score = (col("tf") * (col("nn") + lit(1.0)) / (col("df") + lit(1).cast("double")))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nn))
      .withColumn("score", score)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rnk"))
  }

  /** GPT-style sequence packing: documents are concatenated in `idCol`
    * order within each shard and split at `capacity`-token boundaries —
    * the concat-and-chunk layout LLM pretraining actually feeds (docs
    * may straddle a boundary; `offset_in_bin` says where each starts).
    * `bin = floor(tokens_before / capacity)` over a running-sum window.
    *
    * Sharding is what makes this 100 TB-viable: a single global ordering
    * would funnel the corpus through one window partition, so packing
    * runs per md5-shard of the id (deterministic, balanced), one window
    * partition each — global order is neither needed nor meaningful for
    * a shuffled training corpus.
    */
  def packSequences(docs: DataFrame, capacity: Long = 2048, shards: Int = 16,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard =
      expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 8), 16, 10) AS BIGINT) % $shards")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tokens"),
        shard.as("shard"))
      .withColumn("tokens_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("n_tokens"),
        // integral `div`, not `/`+cast: fractional division would round
        // trip through DOUBLE where Spark truncates but DuckDB rounds
        expr(s"tokens_before div $capacity").as("bin"),
        pmod(col("tokens_before"), lit(capacity)).as("offset_in_bin"))
  }

  /** PII detection + redaction: emails, international-format phone
    * numbers, and IPv4 addresses, counted and replaced with typed
    * placeholders. The patterns are deliberately in the common subset of
    * Java regex and RE2 (no backrefs, no lookarounds) so engine and
    * oracle agree byte for byte; redaction order is fixed
    * (email → ip → phone).
    */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phoneRe = "\\+[0-9]{7,15}"

  def piiScan(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = lower(col(textCol))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(t, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")
    docs.select(col("doc_id"),
      regexp_count(t, lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(ipv4Re)).cast("long").as("n_ips"),
      regexp_count(t, lit(phoneRe)).cast("long").as("n_phones"),
      md5(redacted.cast("binary")).as("redacted_hash"))
  }

  /** Deterministic stratified sampling: a row survives iff its id's md5
    * bucket (0..9999) falls under the class's rate in basis points.
    * Like [[assignSplit]] this is a pure function of the id — stable
    * across runs, engines and repartitions — and a pure FILTER: no
    * shuffle, no RNG state, safe to push to the scan. The ':strat' salt
    * decorrelates it from the split assignment's buckets.
    */
  def stratifiedSample(df: DataFrame, rateBp: Column,
                       idCol: String = "doc_id"): DataFrame =
    df.withColumn("sample_bucket",
        expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING) || ':strat'), 1, 8), 16, 10) AS BIGINT) % 10000"))
      .filter(col("sample_bucket") < rateBp)

  /** Deterministic per-key uniform sample: rows rank within each key by
    * the salted md5 of their id — a fixed random permutation — and the
    * first `n` survive. Balanced per-class subsampling (the class-cap
    * step of dataset curation) with no RNG state: stable across runs,
    * engines and repartitions. One window shuffle on the key.
    */
  def samplePerKey(df: DataFrame, keyCol: Column, n: Int,
                   idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("smp_key").orderBy(col("smp_h"), col(idCol))
    df.withColumn("smp_key", keyCol)
      .withColumn("smp_h", expr(s"md5(CAST($idCol AS STRING) || ':perkey')"))
      .withColumn("smp_rank", row_number().over(w))
      .filter(col("smp_rank") <= n)
  }

  /** Content fingerprint: md5 of the sorted distinct token set — the
    * "bag-of-words digest" used for near-exact clustering; plus the raw
    * md5 of the normalized text.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(col("doc_id"),
      md5(array_join(array_sort(array_distinct(t)), " ").cast("binary")).as("bag_fingerprint"),
      md5(trim(lower(col(textCol))).cast("binary")).as("text_fingerprint"))
  }

  /** Benchmark decontamination: flag training documents sharing any word
    * `n`-gram with an evaluation set — the overlap check every serious
    * pretraining pipeline runs before training (the GPT-3 appendix's
    * 8/13-gram collision scan).
    *
    * Output per corpus doc: `n_grams` (n-gram OCCURRENCES — computed
    * map-side from the token count, deliberately not a corpus-wide
    * distinct), `n_overlap` (DISTINCT grams also present in the
    * benchmark), `contaminated`.
    *
    * Scale shape: the benchmark's gram-hash set is small (eval sets are
    * thousands of docs) → built once, deduped, BROADCAST. The corpus side
    * streams its gram occurrences map-only into the broadcast hash join;
    * only MATCHED rows — a vanishing fraction — reach the distinct +
    * per-doc count. No corpus-sized shuffle anywhere: cost tracks the
    * contamination density, not the corpus size.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, n: Int = 8,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val benchHashes = Dedup.shingleHashes(Dedup.shingles(bench, n, textCol, idCol), idCol)
      .select("h").distinct()
    val docHashes = Dedup.shingleHashes(Dedup.shingles(corpus, n, textCol, idCol), idCol)
    val overlap = docHashes.join(broadcast(benchHashes), Seq("h"))
      .select(idCol, "h").distinct()
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    corpus
      .select(col(idCol),
        greatest(lit(0L), (size(tokens(col(textCol))) - (n - 1)).cast("long")).as("n_grams"))
      .join(overlap, Seq(idCol), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** Hashed linear model scoring — the fasttext-style learned quality
    * filter applied at scan speed: every token hashes into one of `dim`
    * feature buckets, the bucket's weight is accumulated, and the raw
    * logit decides keep/drop. The weight table here is a PURE FUNCTION
    * of the bucket (Knuth multiplicative hash → integer in [-500, 500)),
    * which stands in for broadcast learned weights with identical
    * plumbing and keeps the oracle exact: integer accumulation, one
    * final division. Shape: explode + one partial-combining (doc)
    * aggregation — weights never shuffle, scores stream map-side.
    */
  def hashedModelScore(docs: DataFrame, dim: Int = 1024,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(dim > 0, "dim must be positive")
    val bucket =
      expr(s"CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) % $dim")
    val weight = (col("__b") * 2654435761L % 1000L) - 500L
    Dedup.tokenize(docs, textCol, idCol)
      .withColumn("__b", bucket)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum(weight).as("logit_milli"))
      .withColumn("logit", col("logit_milli").cast("double") / lit(1000.0))
      .withColumn("keep", col("logit") >= 0)
  }

  /** Corpus mixture report: per-(source, language) document/token/char
    * totals and shares — the "what is my training mix" accounting that
    * drives domain reweighting decisions. One partial-combining
    * aggregation over the corpus (shuffle volume = group count), then
    * shares via an unpartitioned window over the few group rows.
    * Shares are single int/int divisions (exact-portable).
    */
  def mixtureReport(docs: DataFrame, keys: Seq[String] = Seq("source", "lang"),
                    textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    docs.groupBy(keys.map(col): _*).agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol))).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"))
      .select(keys.map(col) ++ Seq(
        col("n_docs"), col("n_tokens"), col("n_chars"),
        (col("n_docs").cast("double") / sum("n_docs").over(w).cast("double"))
          .as("doc_share"),
        (col("n_tokens").cast("double") / sum("n_tokens").over(w).cast("double"))
          .as("token_share")): _*)
  }

  /** Cross-document duplicated spans: fixed-length character windows
    * that appear verbatim in ≥ `minDocs` distinct documents — the
    * exact-substring duplication signal behind suffix-array
    * training-data dedup (Lee et al. 2022), approximated by
    * CONTENT-DEFINED sampling: spans start only at CDC anchors
    * (positions where the [[graft.functions.QCdcAnchors]] rolling-
    * window hash ≡ 0 mod `freq`). Anchors move with the content, so
    * two documents sharing a region anchor it at the same in-region
    * offsets regardless of where the region sits in each document —
    * the property a fixed-stride sample lacks (offset-shifted copies
    * would sample different phase and never collide). Expected sample
    * density 1/freq; a shared region is missed only if it contains no
    * anchor, probability (1−1/freq)^length — the standard CDC trade.
    *
    * Scale shape: the anchor scan is one native pass per doc; the
    * explode emits ~len/freq rows; one span aggregation with map-side
    * combine. Only spans anchored in ≥ minDocs docs survive. Output:
    * (span, n_docs, n_occurrences, first_doc_id).
    */
  def duplicatedSpans(docs: DataFrame, spanLen: Int = 32, freq: Int = 16,
                      anchorWindow: Int = 8, minDocs: Int = 2,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(spanLen > 0 && freq > 0 && minDocs >= 2, "bad span parameters")
    docs.select(col(idCol), lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= spanLen)
      .select(col(idCol), col("t"),
        explode(graft.functions.QCharGrams.anchorsCol(col("t"), anchorWindow, freq)).as("i"))
      .filter(col("i") <= length(col("t")) - (spanLen - 1))
      .select(col(idCol), col("t").substr(col("i").cast("int"), lit(spanLen)).as("span"))
      .groupBy("span")
      .agg(count_distinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col(idCol)).as("first_doc_id"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Gopher-style repetition metrics: the "excessive repetition" quality
    * filters of dataset curation (Rae et al. 2021 §A1.1) — fraction of
    * word-bigram occurrences in duplicated bigrams, top-bigram coverage,
    * and the same at the unigram level. High values mark boilerplate,
    * keyword stuffing and templated spam.
    *
    * Two (doc, gram) partial-combining aggregations — the map-side
    * combine absorbs the repetition itself, so shuffle volume is the
    * DISTINCT gram count. Fractions are single int/int divisions (raw
    * doubles — exact-portable); docs with no bigrams report nulls.
    */
  def repetitionScore(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val gc = Dedup.shingles(docs, 2, textCol, idCol)
      .groupBy(idCol, "shingle").agg(count(lit(1)).as("cnt"))
    val ga = gc.groupBy(idCol).agg(
      sum("cnt").as("n_grams2"), max("cnt").as("top2_cnt"),
      sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup2_cnt"))
    val wc = Dedup.tokenize(docs, textCol, idCol)
      .groupBy(idCol, "w").agg(count(lit(1)).as("cnt"))
    val wa = wc.groupBy(idCol).agg(
      sum("cnt").as("n_words"), max("cnt").as("topw_cnt"))
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double"))
    docs.select(col(idCol))
      .join(wa, Seq(idCol), "left")
      .join(ga, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        frac(col("topw_cnt"), col("n_words")).as("top_word_frac"),
        coalesce(col("n_grams2"), lit(0L)).as("n_grams2"),
        frac(col("top2_cnt"), col("n_grams2")).as("top_bigram_frac"),
        frac(col("dup2_cnt"), col("n_grams2")).as("dup_bigram_frac"))
  }

  /** C4-style boilerplate filter: per-document LINE heuristics (the
    * web-scrape cleanup pass that runs before any dedup) — line count,
    * mean words per line, fraction of lines ending in terminal
    * punctuation, code/markup braces, and a boilerplate phrase list
    * (javascript/cookie/privacy-policy/terms-of-use). `keep` is the
    * C4 rule: no braces, no boilerplate phrase, lines averaging at
    * least `minMeanWordsPerLine` words.
    *
    * Entirely map-side — one row in, one row out, runs at scan speed at
    * any corpus size. Portability: line split is a literal '\n' split
    * (trailing empties kept in both engines), fractions are single
    * int/int double divisions, the phrase test is lower-cased
    * substring containment (no regex dialect in play).
    */
  def boilerplateFilter(docs: DataFrame, minMeanWordsPerLine: Double = 4.0,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val lines = split(col(textCol), "\n", -1)
    val lowered = lower(col(textCol))
    val phrases = Seq("javascript", "cookie", "privacy policy", "terms of use")
    val nWords = size(filter(split(col(textCol), "\\s+", -1), w => w =!= ""))
    docs.select(col(idCol),
        size(lines).cast("long").as("n_lines"),
        nWords.cast("long").as("n_words"),
        size(filter(lines, l =>
          l.substr(length(l), lit(1)).isin(".", "!", "?"))).cast("long")
          .as("n_punct_lines"),
        (col(textCol).contains("{") || col(textCol).contains("}")).as("has_brace"),
        phrases.map(p => lowered.contains(p)).reduce(_ || _).as("has_boilerplate"))
      .withColumn("mean_words_per_line",
        col("n_words").cast("double") / col("n_lines").cast("double"))
      .withColumn("frac_punct_lines",
        col("n_punct_lines").cast("double") / col("n_lines").cast("double"))
      .withColumn("keep",
        !col("has_brace") && !col("has_boilerplate") &&
          col("mean_words_per_line") >= minMeanWordsPerLine)
  }

  /** Temperature-based mixture resampling: domains are re-weighted to
    * `(n_d)^(1/2)` (temperature α = 0.5 — the multilingual-pretraining
    * up/down-sampling rule) and each document survives a deterministic
    * md5 gate at its domain's resulting rate, targeting `targetFrac` of
    * the corpus overall. Head domains downsample toward the flattened
    * share; tail domains keep (capped at) 100 % of their rows.
    *
    * Shape at scale: one partial-combining count per domain (rows
    * crossing the exchange = domain count), a single-row broadcast for
    * the totals, then a map-side filter over the corpus — the corpus is
    * never shuffled. Portability: α = 0.5 is computed as `sqrt` (IEEE
    * correctly-rounded everywhere, unlike `pow`), the per-domain weight
    * is quantized to BIGINT before the cross-domain sum (float sums
    * depend on aggregation order; integer sums don't), and the rate is
    * a fixed parenthesized sequence of double ops both engines replay
    * bit for bit.
    *
    * NULL domains: documents whose `domainCol` is NULL are DROPPED (the
    * rate join is not null-safe) — coalesce to a sentinel domain or
    * filter upstream if they should participate.
    */
  def temperatureResample(docs: DataFrame, domainCol: Column,
                          targetFrac: Double = 0.5,
                          idCol: String = "doc_id"): DataFrame = {
    val counts = docs.groupBy(domainCol.as("domain"))
      .agg(count(lit(1)).as("n_domain"))
      .withColumn("s_d", floor(sqrt(col("n_domain").cast("double")) * lit(1000000.0))
        .cast("long"))
    val totals = counts.agg(sum("s_d").as("s_tot"), sum("n_domain").as("n_tot"))
    val rate = least(lit(10000L),
      floor(col("s_d").cast("double") / col("s_tot").cast("double")
        * lit(targetFrac) * col("n_tot").cast("double")
        / col("n_domain").cast("double") * lit(10000.0)).cast("long"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col("domain"), col("n_domain"), rate.as("rate_bp"))
    docs.select(col(idCol), domainCol.as("domain"))
      .withColumn("bucket",
        expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING) || ':temp'), 1, 8), 16, 10) AS BIGINT) % 10000"))
      .join(broadcast(rates), Seq("domain"))
      .filter(col("bucket") < col("rate_bp"))
      .select(col(idCol), col("domain"), col("n_domain"), col("rate_bp"))
  }

  /** Deterministic global corpus shuffle + sharding — the "shuffle the
    * corpus before training" step, without a global sort. Each document
    * hashes to a shard (`md5(id) % nShards`) and gets a position within
    * its shard by ranking on the remaining hash bits (id as the
    * final tiebreak): reading shards `0..n-1` sequentially replays one
    * fixed pseudo-random permutation of the corpus, stable across runs,
    * engines, and input partitionings — `rand(seed)` sampling gives none
    * of that across repartitions.
    *
    * Shape at scale: one hash-shuffle on the shard key, then one window
    * per shard — each window partition holds ~corpus/nShards rows, so
    * parallelism is chosen by the caller (nShards), not capped by data
    * skew; no stage ever sees a global ordering. This is the layout step
    * feeding [[packSequences]], which packs each shard independently.
    */
  def corpusShard(df: DataFrame, nShards: Int = 64,
                  idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = expr(
      s"CAST(conv(substring(md5(CAST($idCol AS STRING) || ':shard'), 1, 12), 16, 10) AS BIGINT)")
    val w = Window.partitionBy("shard").orderBy(col("h"), col(idCol))
    df.select(col(idCol), h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** BM25-style keyword search over the corpus: score every document
    * against a bag of query terms, return the global top-`k`. The tf
    * saturation and length normalization are exactly BM25's
    * (k1 = 1.2, b = 0.75); the idf factor is the LINEAR rarity weight
    * `(N - df + ½)/(df + ½)` rather than its logarithm — same
    * monotone per-term ordering, and log-free arithmetic is what lets
    * the whole score live in exact BIGINT domain (the [[topTerms]]
    * libm-ulp lesson). With avgdl = S/N (S = corpus token count), each
    * (doc, term) contribution clears denominators to
    * `scale·22·S·tf·(2N−2df+1)  div  (2df+1)·(10·S·tf + 3·S + 9·dl·N)`
    * — all-integer, order-free to sum, bit-identical in any engine.
    * Fits in BIGINT through bench scales (documented envelope
    * ~1e17 at sf0.1); a 100 TB deployment flips the same formula to
    * doubles and keeps the ranking.
    *
    * Shape at scale: tokens are filtered to the query terms BEFORE any
    * aggregation (the term list is a literal `isin` — a scan-level
    * prune), so the tf aggregation carries query-term occurrences only,
    * not the corpus vocabulary. Doc lengths ride the same single pass
    * over the token arrays (map-side, no explode for non-query rows);
    * df and the corpus totals are broadcast single-row/short frames.
    * Final top-k is a global `orderBy(...).limit(k)` — Spark's
    * TakeOrderedAndProject, a per-partition heap + driver merge of k
    * rows, not a global sort.
    */
  def bm25Search(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val t = tokens(col(textCol))
    // one pass: per-doc length + per-doc tf of each query term
    val base = docs.select(col(idCol), size(t).cast("long").as("dl"),
      t.as("toks")).filter(col("dl") > 0)
    val totals = base.agg(sum("dl").as("s_tot"),
      count(lit(1)).as("n_docs"))
    val tf = base
      .select(col(idCol), col("dl"),
        explode(filter(col("toks"), w => w.isin(queryTerms.map(lit): _*)))
          .as("term"))
      .groupBy(idCol, "dl", "term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df_), Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("num", lit(10000L) * lit(22L) * col("s_tot") * col("tf")
        * (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L)))
      .withColumn("den", (lit(2L) * col("df") + lit(1L))
        * (lit(10L) * col("s_tot") * col("tf") + lit(3L) * col("s_tot")
          + lit(9L) * col("dl") * col("n_docs")))
      // exact BIGINT floor division — the numerator tops 2^53, so a
      // double `/` + floor would round before flooring
      .withColumn("q", expr("num div den"))
      .groupBy(idCol).agg(sum("q").as("score_q"),
        count(lit(1)).as("n_terms_hit"))
      .withColumn("score", col("score_q").cast("double") / lit(10000.0))
      .orderBy(col("score_q").desc, col(idCol))
      .limit(k)
  }

  /** EXPORT step: the curated corpus written as TRAINING SHARDS — the
    * terminal stage of the pipeline ([[corpusShard]]'s deterministic
    * permutation + [[packSequences]]'s concat-and-chunk layout, fused
    * into one plan and one partitioned write). Shard `k`'s directory
    * read top-to-bottom replays position order: documents land in their
    * permuted order with `(bin, offset_in_bin)` saying exactly where
    * each starts in the fixed-`capacity` token stream — what a
    * dataloader needs to build batches with zero further shuffling.
    *
    * One plan: a single hash exchange on the shard key, ONE Window exec
    * (rank + running token sum share partitioning and ordering), then a
    * `partitionBy(shard)` write whose files are sorted by position.
    * Packing here runs in PERMUTED order — shuffle-then-pack, the
    * training layout — where [[packSequences]] alone packs in id order.
    */
  def exportTrainingShards(docs: DataFrame, outDir: String, nShards: Int = 16,
                           capacity: Long = 2048, textCol: String = "text",
                           idCol: String = "doc_id"): Unit = {
    import org.apache.spark.sql.expressions.Window
    val h = expr(
      s"CAST(conv(substring(md5(CAST($idCol AS STRING) || ':shard'), 1, 12), 16, 10) AS BIGINT)")
    val w = Window.partitionBy("shard").orderBy(col("h"), col(idCol))
    docs.select(col(idCol), col(textCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"), h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("tokens_before",
        coalesce(sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("bin", expr(s"tokens_before div $capacity"))
      .withColumn("offset_in_bin", pmod(col("tokens_before"), lit(capacity)))
      .select(col(idCol), col(textCol), col("n_tokens"), col("shard"),
        col("pos"), col("bin"), col("offset_in_bin"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** Vocabulary-coverage (OOV) scoring: the vocabulary is the corpus
    * words with document frequency ≥ `minDf` (the deterministic stand-in
    * for a broadcast tokenizer vocab — identical plumbing), and each
    * document reports how many of its token OCCURRENCES fall outside
    * it. High OOV rate flags encoding damage, boilerplate alphabets,
    * and out-of-domain text — a standard curation gate next to
    * [[languageId]] and [[qualityScore]].
    *
    * Shape at scale: one (word, df) aggregation (vocabulary-bounded
    * output, partial combine collapses the Zipf head), then one join of
    * exploded tokens against the IN-vocab word set and a per-doc
    * partial-combining count. The rate is a single int/int double
    * division.
    */
  def oovScore(docs: DataFrame, minDf: Long = 3, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(col(idCol), tokens(col(textCol)).as("toks"))
    val words = base.select(col(idCol), explode(col("toks")).as("w"))
    val vocab = words.select(col("w"), col(idCol)).distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("w")
    words.join(vocab.withColumn("in_vocab", lit(1L)), Seq("w"), "left_outer")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Bigram language-model scoring — the CCNet-style "how surprising is
    * this document under a corpus LM" quality signal. The LM is add-one-
    * smoothed bigram counts over the corpus itself (in production: over
    * a trusted reference corpus — same plumbing, different `model`
    * input); each document is scored by its mean inverse bigram
    * probability `(c(w1)+V)/(c(w1,w2)+1)` — low = fluent under the
    * model, high = anomalous — which is perplexity's ranking without its
    * logarithm. Portability: each per-bigram inverse probability is
    * quantized to BIGINT (`·1e6, floor` — exact integer arithmetic)
    * before the per-doc sum, so the aggregate is order-free; the final
    * mean is one fixed-shape double division.
    *
    * Shape at scale: bigrams are built map-side from each doc's token
    * array (`transform` over indices — no self-join, no window); the
    * model is one partial-combining count per distinct bigram (Zipf:
    * output is vocabulary², but partial aggregation collapses the heavy
    * head before the exchange) pre-joined with its prefix unigram
    * count; scoring is one join of doc bigrams against the model (AQE
    * broadcasts it when the vocabulary is small) and one partial-
    * combining per-doc aggregation.
    */
  def bigramLmScore(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val toBigrams = (ts: Column) =>
      transform(sequence(lit(1), size(ts) - 1),
        i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1)))
    val base = docs.select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
    val docBigrams = base.select(col(idCol),
      explode(toBigrams(col("toks"))).as("bg"))
    val words = base.select(explode(col("toks")).as("w"))
    val uni = words.groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    // model: bigram count + prefix unigram count, keyed by the bigram
    val model = docBigrams.groupBy("bg").agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .select(col("bg"), col("c12"), col("c1"))
    docBigrams.join(model, Seq("bg"))
      .crossJoin(broadcast(vocab))
      .withColumn("invp_q", expr("(1000000 * (c1 + v)) div (c12 + 1)"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("invp_q").as("sum_q"))
      .withColumn("lm_score",
        col("sum_q").cast("double") / col("n_bigrams").cast("double")
          / lit(1000000.0))
  }

  /** One round of BPE vocabulary learning: corpus-weighted adjacent
    * character-pair counts over the normalized word vocabulary, top-k.
    * The tokenizer-training primitive (Sennrich et al. 2016 — the merge
    * choice IS argmax of this table; iterating it with re-segmentation
    * is the full trainer, each round the same shape).
    *
    * Scale shape: the only corpus-sized stage is the word-frequency
    * aggregation (partial-combining); pair explosion runs over the
    * DISTINCT vocabulary — ~√corpus in practice — weighted by stored
    * frequency, and the top-k is a TakeOrdered heap, never a global
    * sort.
    */
  def bpePairCounts(docs: DataFrame, textCol: String = "text",
                    k: Int = 50): DataFrame = {
    val pieces = filter(split(lower(col(textCol)), "[^a-z0-9]+"), p => p =!= "")
    val vocab = docs.select(explode(pieces).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(length(col("w")) >= 2)
    vocab
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"), col("freq"))
      .groupBy("pair").agg(sum("freq").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }
}
