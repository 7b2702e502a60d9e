package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the BM25 and bigram-LM operators against INDEPENDENT
  * in-memory reference models (plain Scala maps and loops — no shared
  * code with the operators) on random corpora.
  */
class SearchModelPropertySpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val vocabPool = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def randomCorpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to nDocs).map { i =>
      val len = 3 + rnd.nextInt(12)
      (i.toLong, Seq.fill(len)(vocabPool(rnd.nextInt(vocabPool.size))).mkString(" "))
    }
  }

  test("bm25Search matches a naive integer-arithmetic reference on random corpora") {
    val terms = Seq("alpha", "theta")
    for (seed <- 1L to 5L) {
      val corpus = randomCorpus(seed, 25)
      // reference model: plain loops over token lists
      val toks = corpus.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq
      }.filter(_._2.nonEmpty)
      val s = toks.map(_._2.size.toLong).sum
      val nd = toks.size.toLong
      val df = terms.map(q => q -> toks.count(_._2.contains(q)).toLong).toMap
      val expected = toks.flatMap { case (id, ts) =>
        val qs = terms.flatMap { q =>
          val tf = ts.count(_ == q).toLong
          if (tf == 0 || df(q) == 0) None
          else {
            val dl = ts.size.toLong
            val num = BigInt(10000L) * 22L * s * tf * (2 * nd - 2 * df(q) + 1)
            val den = BigInt(2 * df(q) + 1) * (10 * s * tf + 3 * s + 9 * dl * nd)
            Some((num / den).toLong)
          }
        }
        if (qs.isEmpty) None else Some(id -> qs.sum)
      }.toMap
      val got = TextAnalysis.bm25Search(corpus.toDF("doc_id", "text"), terms, k = 100)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_q")).toMap
      assert(got == expected, s"seed $seed: got $got expected $expected")
    }
  }

  test("bigramLmScore matches a naive reference on random corpora") {
    for (seed <- 10L to 13L) {
      val corpus = randomCorpus(seed, 20)
      val toks = corpus.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq
      }.filter(_._2.size >= 2)
      val bigrams = toks.flatMap(_._2.sliding(2).map(_.mkString(" ")))
      val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val v = c1.size.toLong
      val expected = toks.map { case (id, ts) =>
        val qs = ts.sliding(2).map(_.mkString(" ")).map { bg =>
          val w1 = bg.split(" ")(0)
          (1000000L * (c1(w1) + v)) / (c12(bg) + 1)
        }.toSeq
        id -> (qs.size.toLong, qs.sum)
      }.toMap
      val got = TextAnalysis.bigramLmScore(corpus.toDF("doc_id", "text"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_q"))).toMap
      assert(got == expected, s"seed $seed")
    }
  }
}
