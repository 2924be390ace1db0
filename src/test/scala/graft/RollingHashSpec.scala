package graft

import graft.operators.TextAnalysis
import org.scalacheck.Gen

/** The O(1) rolling update must equal direct per-window recomputation. */
class RollingHashSpec extends SparkSpec {

  private def direct(tokens: Array[String], w: Int): Seq[Long] = {
    val (b, p) = (TextAnalysis.B, TextAnalysis.P)
    val t = tokens.map(TextAnalysis.tokenHash)
    (0 to tokens.length - w).map { i =>
      var h = 0L
      (i until i + w).foreach(j => h = (h * b + t(j)) % p)
      h
    }
  }

  test("rolling equals direct on random token streams") {
    val gen = Gen.listOfN(40, Gen.oneOf("a", "bb", "ccc", "data", "spark", "x1"))
    (1 to 50).foreach { seed =>
      val tokens = gen(Gen.Parameters.default.withSize(40),
        org.scalacheck.rng.Seed(seed)).get.toArray
      assert(TextAnalysis.rollingHashes(tokens, 8) == direct(tokens, 8))
    }
  }

  test("short streams produce no windows; window-length stream produces one") {
    assert(TextAnalysis.rollingHashes(Array("a", "b"), 8).isEmpty)
    val exact = Array.fill(8)("tok")
    assert(TextAnalysis.rollingHashes(exact, 8).size == 1)
  }

  test("shared passage ⇒ shared window hash across documents") {
    val passage = Array("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
    val doc1 = Array("alpha", "beta") ++ passage ++ Array("gamma")
    val doc2 = Array("unrelated", "prefix", "words", "here") ++ passage
    val h1 = TextAnalysis.rollingHashes(doc1, 8).toSet
    val h2 = TextAnalysis.rollingHashes(doc2, 8).toSet
    assert(h1.intersect(h2).nonEmpty) // the copied passage is detected
  }

  test("catalog entry emits one row per window position") {
    val out = Catalog.queries("n25_rolling_fingerprint")(spark, sf0001)
    // expected count uses the SAME tokenizer as the operator
    // (split-keep-empties, matching SQL string_split)
    val expected = Tables(spark, sf0001).documents
      .select("text").collect()
      .map(_.getString(0).split(" ", -1).length)
      .map(n => math.max(n - (TextAnalysis.RollingWindow - 1), 0).toLong)
      .sum
    assert(out.count() == expected)
  }
}
