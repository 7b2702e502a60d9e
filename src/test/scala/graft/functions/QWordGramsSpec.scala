package graft.functions

import graft.TestSpark
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class QWordGramsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic synthetic corpus with exact dups, near dups, and noise
  private def corpus = {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docs = (0 until 120).map { i =>
      val toks = (0 until 12).map(k => words((i * 7 + k * (1 + i % 3)) % words.length))
      (i.toLong, toks.mkString(" "))
    }
    val dups = docs.filter(_._1 % 9 == 0).map { case (id, t) => (id + 1000, t) }
    val near = docs.filter(_._1 % 13 == 0).map { case (id, t) => (id + 2000, t + " omega") }
    (docs ++ dups ++ near).toDF("doc_id", "text")
  }

  test("native signature equals the composed md5 minhash signature") {
    val base = corpus.select(col("doc_id"), lower(col("text")).as("t"))
    val composed = Dedup.minhashSignature(
        Dedup.shingleHashes(Dedup.shingles(corpus, 3)))
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    val native = base
      .filter(size(filter(split(col("t"), "\\s+"), w => w =!= "")) >= 3)
      .select(col("doc_id"), QWordGrams.sigCol(col("t"), 3).as("ms"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native.keySet == composed.keySet)
    for ((id, sig) <- composed) assert(native(id) == sig, s"doc $id")
  }

  test("native pipeline output is bit-identical to the composed pipeline") {
    val a = Dedup.minhashNearDups(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.catalog.clearCache()
    val b = Dedup.wordGramNearDups(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
    assert(a.nonEmpty, "vacuous corpus: no near-dup pairs")
    spark.catalog.clearCache()
  }

  test("tokenization matches split-regex semantics incl. leading/odd whitespace") {
    for (s <- Seq("  leading space", "tab\tand\nnewline mix", "one",
        "a  b   c", "")) {
      val viaExpr = QWordGrams.distinctHashes(UTF8String.fromString(s), 1)
      val toks = s.split("\\s+").filter(_.nonEmpty)
      assert(viaExpr.numElements() == toks.distinct.length, s"'$s'")
    }
  }

  test("distinct hash u64 parse matches the hex-string prefix") {
    val d = QWordGrams.distinctHashes(UTF8String.fromString("hello"), 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("hello".getBytes).take(8)
      .map(b => f"${b & 0xff}%02x").mkString
    assert(d.numElements() == 1)
    assert(f"${d.getLong(0)}%016x" == hex)
  }

  test("native QSimHash equals the composed simhash signature") {
    val composed = Dedup.simhashSignature(corpus)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val native = corpus
      .filter(size(filter(split(lower(col("text")), "\\s+"), w => w =!= "")) > 0)
      .select(col("doc_id"), QSimHash.sigCol(lower(col("text"))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native == composed)
  }

  test("QSimHash excludes all-whitespace docs like the composed form") {
    val d = Seq((1L, "real words here"), (2L, "   \t  ")).toDF("doc_id", "text")
    val ids = Dedup.simhashNearDups(d).columns // plan builds fine
    val sigRows = d
      .filter(size(filter(split(lower(col("text")), "\\s+"), w => w =!= "")) > 0)
      .count()
    assert(sigRows == 1L)
  }

  test("the gram/simhash family is usable from SQL (GraftExtensions factories)") {
    val reg = spark.sessionState.functionRegistry
    def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.eval().asInstanceOf[Number].intValue()
    reg.createOrReplaceTempFunction("graft_chargram_minhash",
      exprs => QCharGramMinHash(exprs.head, intArg(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_wordgram_minhash",
      exprs => QWordGramSignature(exprs.head, intArg(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      exprs => QSimHashSignature(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_sorted_intersect",
      exprs => QSortedIntersectCount(exprs.head, exprs(1)), "built-in")
    val r = spark.sql(
      """SELECT graft_chargram_minhash('abcdef', 5) AS cg,
        |       graft_wordgram_minhash('a b c d', 3) AS wg,
        |       graft_simhash('a b c') AS sh,
        |       graft_sorted_intersect(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS si
        |""".stripMargin).head()
    assert(r.getSeq[Long](0).length == 8)
    assert(r.getSeq[String](1).length == 8)
    assert(r.getString(2).length == 64 && r.getString(2).forall(c => c == '0' || c == '1'))
    assert(r.getLong(3) == 2L)
  }
}
