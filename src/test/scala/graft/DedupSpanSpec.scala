package graft

/** dedup_span_extend on a hand-built partial-copy corpus: every span
  * boundary, mass, and canonical holder below is computed by hand from
  * the w=3 shingle anchoring rules (see the operator's scaladoc in
  * LlmText), including the two subtle cases — two distinct copied
  * spans in one doc staying separate, and two anchor runs separated by
  * ONE non-duplicated anchor merging through their shared token
  * coverage into a single maximal span.
  */
class DedupSpanSpec extends SparkSpec {

  test("span extraction finds exact maximal duplicated spans") {
    val d = Fixtures.tempDir()
    Fixtures.documents(spark, d, Seq(
      /* 0 */ "a b c d e f g h i j",            // source: spans copied by 1 and 3
      /* 1 */ "x1 x2 a b c d e y1 y2 y3",       // copies tokens a..e from doc 0
      /* 2 */ "z1 z2 z3 z4 z5 z6 z7 z8",        // fully unique — must NOT appear
      /* 3 */ "a b c q r s h i j t",            // copies "a b c" AND "h i j" → 2 spans
      /* 4 */ "m1 m2 m3 m4 m5",                 // shares 1st+3rd shingle with doc 5:
      /* 5 */ "m1 m2 m3 u9 m3 m4 m5"))          //   anchor gap of 1 merges via coverage
    val rows = SparkEntry.queries("dedup_span_extend")(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6), r.getLong(7)))
      .toMap

    // (n_tokens, n_spans, dup_tokens, max_span_len, dup_frac, canonical_id)
    assert(rows(0L) === ((10L, 2L, 8L, 5L, 0.8, 0L)))      // [a..e] + [h i j]
    assert(rows(1L) === ((10L, 1L, 5L, 5L, 0.5, 0L)))      // one copied run a..e
    assert(!rows.contains(2L))                             // no duplicated shingles
    assert(rows(3L) === ((10L, 2L, 6L, 3L, 0.6, 0L)))      // two 3-token spans
    // doc 4: dup anchors at pos 0 and 2 only — their token coverages
    // {0,1,2} and {2,3,4} overlap, so ONE maximal span of all 5 tokens.
    assert(rows(4L) === ((5L, 1L, 5L, 5L, 1.0, 4L)))
    // doc 5: anchors at 0 and 4 → coverages {0,1,2} and {4,5,6} stay apart.
    assert(rows(5L) === ((7L, 2L, 6L, 3L, 0.8571, 4L)))
  }

  test("span scrub drops copied spans everywhere except the canonical holder") {
    val d = Fixtures.tempDir()
    Fixtures.documents(spark, d, Seq(
      /* 0 */ "a b c d e f g h i j",
      /* 1 */ "x1 x2 a b c d e y1 y2 y3",
      /* 2 */ "z1 z2 z3 z4 z5 z6 z7 z8",
      /* 3 */ "a b c q r s h i j t",
      /* 4 */ "m1 m2 m3 m4 m5",
      /* 5 */ "m1 m2 m3 u9 m3 m4 m5"))
    val rows = SparkEntry.queries("dedup_span_scrub")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getString(5)))).toMap

    // (n_kept, n_dropped, scrubbed_text)
    assert(rows(0L) === ((10L, 0L, "a b c d e f g h i j")))  // canonical: untouched
    assert(rows(1L) === ((5L, 5L, "x1 x2 y1 y2 y3")))        // copied a..e removed
    assert(rows(2L) === ((8L, 0L, "z1 z2 z3 z4 z5 z6 z7 z8")))
    assert(rows(3L) === ((4L, 6L, "q r s t")))               // both copied spans removed
    assert(rows(4L) === ((5L, 0L, "m1 m2 m3 m4 m5")))        // canonical: untouched
    assert(rows(5L) === ((1L, 6L, "u9")))                    // only the novel token survives
  }
}
