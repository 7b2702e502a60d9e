package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trigram blocking finds edits <= maxDist, rejects the rest") {
    val left = Seq(
      (1L, "warehouse-north-17"),   // 1 deletion from right 10
      (2L, "warehose-north-17"),    // same base, 1 deletion
      (3L, "completely different"), // no match
      (4L, "ab")                    // short-string fallback path
    ).toDF("l_id", "l_name")
    val right = Seq(
      (10L, "warehouse-north-17"),
      (11L, "warehouse-south-17"),  // north→south = 2 substitutions: in at maxDist 2
      (12L, "ab")
    ).toDF("r_id", "r_name")
    val out = FuzzyJoin.trigramBlocked(left, right,
        "l_id", "l_name", "r_id", "r_name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out((1L, 10L, 0L)) && out((2L, 10L, 1L)) && out((4L, 12L, 0L)), s"$out")
    assert(!out.exists(_._1 == 3L), s"no match for the unrelated name: $out")
    assert(out.forall(_._3 <= 2L), s"$out")
    assert(out((1L, 11L, 2L)), s"boundary dist == maxDist kept: $out")
    // the deletion variant is 3 edits from the south name: filtered out
    assert(!out.exists(p => p._1 == 2L && p._2 == 11L), s"$out")
  }

  test("stop-gram cap: pairs sharing a sub-cap gram survive; hot-gram-only candidates go") {
    // every row shares the hot prefix "corp-shared-prefix-" (stop-grams
    // at any reasonable cap); each row also carries a UNIQUE letter
    // tail, so a true (original, variant) pair shares sub-cap tail
    // grams while unrelated rows share ONLY the hot prefix
    def tail(i: Long): String =
      (0 until 8).map(k => ('a' + ((i * 131 + k * 29 + i * k * 7) % 26)).toChar).mkString
    val base = (1L to 30L).map(i => (i, s"corp-shared-prefix-${tail(i)}"))
    val typo = base.filter(_._1 % 2 == 0)
      .map { case (i, n) => (i + 1000L, n.patch(21, "", 1)) }
    val left = (base ++ typo).toDF("l_id", "l_name")
    val right = base.toDF("r_id", "r_name")
    val truePairs = typo.map(t => (t._1, t._1 - 1000L)).toSet

    val exact = FuzzyJoin.trigramBlocked(left, right,
        "l_id", "l_name", "r_id", "r_name", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val capped = FuzzyJoin.trigramBlocked(left, right,
        "l_id", "l_name", "r_id", "r_name", maxDist = 1, maxGramDf = Some(6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the cap never invents pairs, and every true pair — which shares
    // its sub-cap tail grams — survives it
    assert(capped.subsetOf(exact))
    assert(truePairs.forall(p => capped.exists(c => c._1 == p._1 && c._2 == p._2)),
      s"variant pairs must survive the cap: ${truePairs.filterNot(p => capped.exists(c => c._1 == p._1 && c._2 == p._2))}")
    assert((1L to 30L).forall(i => capped.contains((i, i, 0L))),
      "identity matches survive on their tails")
    // an aggressive cap of 1 starves even the tails (every shared gram
    // has df >= 2): no candidates at all — the stop-gram mechanism is
    // really dropping candidate generation, not post-filtering
    val starved = FuzzyJoin.trigramBlocked(left, right,
        "l_id", "l_name", "r_id", "r_name", maxDist = 1, maxGramDf = Some(1))
      .collect().length
    assert(starved == 0, s"cap=1 should starve all candidates, got $starved")
  }

  test("gramLen=4 reproduces the trigram matches on long keys (the fixed-alphabet lever)") {
    // the q_fuzzy_join geometry: zero-padded numeric tails (a 10-symbol
    // gram alphabet) with a deterministic one-char deletion on %3 keys.
    // Names are 18 chars — past the q=4 lossless bound q(d+1)+q−1 = 15
    // — so the 4-gram blocking must find the IDENTICAL match set while
    // decimating per-gram df tenfold at scale.
    val names = (1L to 120L).map(i => (i, f"Supplier#$i%09d"))
    val left = names.map { case (i, n) =>
      (i, if (i % 3 == 0) n.patch((i % 10).toInt, "", 1) else n)
    }.toDF("l_id", "l_name")
    val right = names.toDF("r_id", "r_name")
    def run(q: Int) = FuzzyJoin.trigramBlocked(left, right,
        "l_id", "l_name", "r_id", "r_name", maxDist = 2, gramLen = q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val g3 = run(3)
    val g4 = run(4)
    assert(g3 == g4, s"4-gram blocking must match trigram results; only in g3: ${g3 -- g4}, only in g4: ${g4 -- g3}")
    assert((1L to 120L).forall(i => g4.exists(p => p._1 == i && p._2 == i)),
      "every typo'd name still matches its original")
  }

  test("pigeonhole recall: every single-char deletion of a long name is found") {
    val base = "supplier-depot-nine-42"
    val left = (0 until base.length)
      .map(i => (i.toLong, base.substring(0, i) + base.substring(i + 1)))
      .toDF("l_id", "l_name")
    val right = Seq((100L, base)).toDF("r_id", "r_name")
    val out = FuzzyJoin.trigramBlocked(left, right,
        "l_id", "l_name", "r_id", "r_name", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.size == base.length && out.values.forall(_ == 1L), s"$out")
  }
}
