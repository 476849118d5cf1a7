package graft

import org.apache.spark.sql.Row

/** Behavioral checks of the MinHash/LSH dedup pipeline against an
  * independent plain-Scala model of the same arithmetic (char fold →
  * shingle combine → per-seed min), plus end-to-end duplicate
  * detection on a hand-built corpus.
  */
class MinhashSpec extends SparkSpec {

  private val P = 1000003L
  private val C1 = 1009L
  private val NSig = 8

  /** Plain-Scala twin of LlmText's tid fold. */
  private def tidS(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)

  /** Plain-Scala twin of the signature pipeline. */
  private def sigsS(text: String): Seq[Long] = {
    val toks = text.split(" ", -1).toSeq
    val tids =
      if (toks.size >= 3) {
        val t = toks.map(tidS)
        (0 to toks.size - 3).map(i => ((t(i) * C1 + t(i + 1)) % P * C1 + t(i + 2)) % P)
      } else Seq(tidS(text))
    (0 until NSig).map(i => tids.map(h => (h * (2 * i + 3) + (5 * i + 7)) % P).min)
  }

  private lazy val dir = {
    val d = Fixtures.tempDir()
    Fixtures.documents(spark, d, Seq(
      "the quick brown fox jumps over the lazy dog",   // doc 0
      "the quick brown fox jumps over the lazy dog",   // doc 1: exact dup of 0
      "pack my box with five dozen liquor jugs today", // doc 2: unrelated
      "ab cd",                                         // doc 3: shorter than one shingle
    ))
    d
  }

  test("signatures match the independent scala model") {
    val got = SparkEntry.queries("dedup_minhash_sig")(spark, dir).collect()
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs today",
      "ab cd")
    assert(got.length === 4)
    got.zipWithIndex.foreach { case (row, i) =>
      assert(row.getLong(0) === i.toLong)
      val expect = sigsS(texts(i))
      (0 until NSig).foreach { j =>
        assert(row.getLong(1 + j) === expect(j), s"doc $i sig$j")
      }
    }
  }

  test("exact duplicates collide in all bands; unrelated docs do not pair") {
    val pairs = SparkEntry.queries("dedup_near_minhash")(spark, dir).collect()
    assert(pairs.contains(Row(0L, 1L, 4L)), s"dup pair missing from ${pairs.toSeq}")
    assert(pairs.forall(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      s"unrelated docs paired: ${pairs.toSeq}")
  }

  test("short-doc fallback uses whole text as one shingle") {
    val expect = sigsS("ab cd")
    val row = SparkEntry.queries("dedup_minhash_sig")(spark, dir)
      .filter("doc_id = 3").collect().head
    (0 until NSig).foreach(j => assert(row.getLong(1 + j) === expect(j)))
  }

  test("components propagate the min label across a transitive chain") {
    val d2 = Fixtures.tempDir()
    Fixtures.documents(spark, d2, Seq(
      "the quick brown fox jumps over the lazy dog", // 0
      "the quick brown fox jumps over the lazy dog", // 1: exact dup of 0
      "pack my box with five dozen liquor jugs today", // 2: singleton
      "x y z w", // 3
      "x y z q", // 4: jaccard(3,4)=0.5 → edge
      "q r z q"  // 5: jaccard(4,5)=0.2 → edge; no 3–5 edge (chain!)
    ))
    val got = SparkEntry.queries("dedup_components")(spark, d2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 5 reaches 3 only transitively through 4 — needs ≥2 rounds.
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("adversarial corpus: degenerate bucket takes the grid-salted path exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // 200 docs share ONE band signature (the uncapped-collect_list OOM
    // shape), 5 more sit in a small bucket, and 3 singletons pair with
    // nothing. bucketPairs must return exactly the full C(n,2)
    // enumeration per bucket while no task ever collects the whole
    // degenerate bucket into one array.
    val banded =
      (0L until 200L).map(id => (id, 0, 42L)) ++       // degenerate bucket
        (1000L until 1005L).map(id => (id, 1, 7L)) ++  // small bucket
        Seq((2000L, 2, 1L), (2001L, 2, 2L), (2002L, 3, 3L))
    val df = banded.toDF("doc_id", "band", "bsig")
    val got = operators.LlmText.bucketPairs(df)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val expect =
      (for { a <- 0L until 200L; b <- a + 1 until 200L } yield (a, b)).toSet ++
        (for { a <- 1000L until 1005L; b <- a + 1 until 1005L } yield (a, b)).toSet
    assert(got === expect, s"pair set mismatch: got ${got.size}, expect ${expect.size}")
    // pairs are unique — no double counting across salt cells
    val cnt = operators.LlmText.bucketPairs(df)
      .groupBy(col("a_id"), col("b_id")).count()
      .filter(col("count") > lit(1)).count()
    assert(cnt === 0L, "a pair was enumerated more than once")
  }
}
