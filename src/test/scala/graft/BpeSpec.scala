package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges reproduces the hand-computed merge sequence") {
    // pairs: (a,b) freq 8 wins round 1; then (ab,c) freq 3 wins round 2
    val words = Seq(("ab", 5L), ("abc", 3L)).toDF("w", "wc")
    val merges = Bpe.learnMerges(words, "w", "wc", nMerges = 2)
    assert(merges == Seq(("a", "b"), ("ab", "c")))
  }

  test("greedy left-to-right merge: 'aaa' + (a,a) -> [aa, a]") {
    val df = Seq("aaa").toDF("w")
    val out = Bpe.encode(df, "w", Seq(("a", "a"))).select("tokens").as[Seq[String]].head()
    assert(out == Seq("aa", "a"))
  }

  test("learnMerges stops early when no pairs remain and encode round-trips") {
    val words = Seq(("ab", 2L)).toDF("w", "wc")
    val merges = Bpe.learnMerges(words, "w", "wc", nMerges = 10)
    assert(merges == Seq(("a", "b"))) // after merging, single symbols only
    val enc = Bpe.encode(Seq("abab", "ba").toDF("w"), "w", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(enc("abab") == List("ab", "ab"))
    assert(enc("ba") == List("b", "a"))
    // concatenating tokens always reconstructs the word
    assert(enc.forall { case (w, ts) => ts.mkString == w })
  }

  test("frequency-weighted argmax with deterministic tiebreak on the classic corpus") {
    // Sennrich-style toy: low x5, lower x2, newest x6, widest x3
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)).toDF("w", "wc")
    val merges = Bpe.learnMerges(words, "w", "wc", nMerges = 3)
    // e-s (9) wins round 1, then es-t (9), then lexicographic among 7s: (l,o)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }
}
