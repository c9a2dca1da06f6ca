package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions.col

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the cat sat on the mat."),
    (1L, "mat. the on sat cat the"),  // same word set, reordered
    (2L, "le chat est sur le tapis et la table des les"),
    (3L, "word")
  ).toDF("id", "text")

  test("tokenCount counts whitespace tokens") {
    val n = docs.select(col("id"), tokenCount(col("text"))).as[(Long, Int)].collect().toMap
    assert(n(0L) == 6 && n(3L) == 1)
  }

  test("bigrams emits adjacent token pairs; short docs yield empty arrays") {
    val bg = docs.select(col("id"), bigrams(col("text"))).as[(Long, Seq[String])]
      .collect().toMap
    assert(bg(0L) == Seq("the cat", "cat sat", "sat on", "on the", "the mat."))
    assert(bg(3L) == Seq.empty)
    val empty = Seq((9L, "")).toDF("id", "text")
      .select(col("id"), bigrams(col("text"))).as[(Long, Seq[String])].collect().head._2
    assert(empty == Seq.empty)
  }

  test("punctCount counts punctuation chars only") {
    val n = docs.select(col("id"), punctCount(col("text"))).as[(Long, Int)].collect().toMap
    assert(n(0L) == 1 && n(3L) == 0)
  }

  test("stopwordCount and ratio reflect the stopword list") {
    val n = docs.select(col("id"), stopwordCount(col("text"))).as[(Long, Int)].collect().toMap
    assert(n(0L) == 2) // two bare "the" ("mat." has punctuation attached)
  }

  test("langId picks the language with most marker hits") {
    val p = docs.select(col("id"), langId(col("text"))).as[(Long, String)].collect().toMap
    assert(p(0L) == "en")
    assert(p(2L) == "fr")
    assert(p(3L) == "und")
  }

  test("fingerprint is invariant under word reordering") {
    val fp = docs.select(col("id"), fingerprint(col("text"))).as[(Long, String)].collect().toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(2L))
  }

  test("bpeTokenEstimate is ceil(chars/4)") {
    val n = docs.select(col("id"), bpeTokenEstimate(col("text"))).as[(Long, Long)].collect().toMap
    assert(n(3L) == 1L)
    assert(n(0L) == math.ceil(23 / 4.0).toLong)
  }

  test("wordChunks windows every word with the requested overlap, clipping the tail") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = graft.operators.Chunking.wordChunks(
        Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text",
        chunkSize = 4, overlap = 1)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_words")
      .as[(Long, String, Long)].collect().toSeq
    // starts every 3 words: 0,3,6 — a start at 9 would contribute only the
    // already-covered w10 (tail <= overlap), so it is not emitted
    assert(out == Seq(
      (0L, "w1 w2 w3 w4", 4L),
      (1L, "w4 w5 w6 w7", 4L),
      (2L, "w7 w8 w9 w10", 4L)))
    // every word appears in some chunk; consecutive chunks share `overlap`
    assert((1 to 10).forall(i => out.exists(_._2.split(" ").contains(s"w$i"))))
    for (Seq(a, b) <- out.map(_._2.split(" ").toSeq).sliding(2))
      assert(a.takeRight(1) == b.take(1))
    // a doc shorter than the overlap still yields its (single) chunk
    val tiny = graft.operators.Chunking.wordChunks(
        Seq((1L, "only")).toDF("doc_id", "text"), "doc_id", "text", 4, overlap = 1)
      .select("chunk_text", "n_words").as[(String, Long)].collect().toSeq
    assert(tiny == Seq(("only", 1L)))
    // blank docs yield no chunks; overlap >= chunkSize is refused
    assert(graft.operators.Chunking.wordChunks(
      Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text", 4).count() == 0L)
    intercept[IllegalArgumentException] {
      graft.operators.Chunking.wordChunks(
        Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text", 4, overlap = 4)
    }
  }

  test("packChunks fills fixed-budget sequences per shard, start-based") {
    // chunks of 4 words each, budget 10, single shard: running totals
    // 0,4,8,12,... -> seq = floor(before/10) = 0,0,0,1,1,2 for 6 chunks
    val chunks = (0 until 6).map(i => (1L, i.toLong, 4L))
      .toDF("doc_id", "chunk_idx", "n_words")
    val out = graft.operators.Chunking.packChunks(
        chunks, "doc_id", "chunk_idx", "n_words", budget = 10, shards = 1)
      .orderBy("chunk_idx").select("seq_id").as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 0L, 1L, 1L, 2L))
    // shards partition by id mod shards; packing is independent per shard
    val multi = (1L to 4L).flatMap(id => (0 until 3).map(i => (id, i.toLong, 4L)))
      .toDF("doc_id", "chunk_idx", "n_words")
    val byShard = graft.operators.Chunking.packChunks(
        multi, "doc_id", "chunk_idx", "n_words", budget = 8, shards = 2)
      .select("doc_id", "shard", "seq_id").as[(Long, Long, Long)].collect()
    assert(byShard.forall { case (id, s, _) => s == id % 2 })
    // each shard holds 2 docs x 3 chunks = 24 words -> seqs 0,0,1,1,2,2
    for (s <- 0L to 1L)
      assert(byShard.filter(_._2 == s).map(_._3).sorted.toSeq ==
        Seq(0L, 0L, 1L, 1L, 2L, 2L), s"shard $s packing broken")
  }

  test("oovStats counts tokens outside the deterministic top-k vocabulary") {
    // frequencies: aa=4, bb=3, cc=2, dd=2, zz=1 — at k=3 the cc/dd tie at
    // the cut breaks by token, so vocab = {aa, bb, cc}
    val corpus = Seq(
      (1L, "aa bb cc"),
      (2L, "aa bb dd"),
      (3L, "aa bb cc dd"),
      (4L, "aa zz"),
      (5L, "")).toDF("doc_id", "text")
    val got = graft.operators.Vocabulary.oovStats(corpus, "doc_id", "text", k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 0L), // all in vocab
      (2L, 3L, 1L), // dd lost the tie-break
      (3L, 4L, 1L),
      (4L, 2L, 1L), // zz below the cut
      (5L, 0L, 0L))) // empty doc still reported
    val vocab = graft.operators.Vocabulary.topVocabulary(corpus, "text", 3)
      .select("w").as[String].collect().toSet
    assert(vocab == Set("aa", "bb", "cc"))
  }

  test("packChunks sequences stay within the budget-overrun bounds") {
    // start-based assignment bounds (chunks of at most chunkSize words):
    // every sequence holds < budget + chunkSize words, and every sequence
    // except the shard's LAST holds > budget - chunkSize words
    val chunkSize = 7; val budget = 20
    // adversarial fixture: chunk lengths sweep 1..chunkSize in a pattern
    // decorrelated from doc/shard boundaries, docs of uneven chunk counts
    val chunks = (1L to 40L).flatMap { id =>
      (0 until (id % 5 + 3).toInt).map { i =>
        (id, i.toLong, ((id * 31 + i * 17) % chunkSize + 1))
      }
    }.toDF("doc_id", "chunk_idx", "n_words")
    val seqs = graft.operators.Chunking.packChunks(
        chunks, "doc_id", "chunk_idx", "n_words", budget, shards = 4)
      .groupBy("shard", "seq_id")
      .agg(org.apache.spark.sql.functions.sum("n_words").as("w"))
      .as[(Long, Long, Long)].collect()
    assert(seqs.length > 12, "fixture too small to exercise the bounds")
    for ((shard, inShard) <- seqs.groupBy(_._1)) {
      val last = inShard.map(_._2).max
      for ((_, seq, w) <- inShard) {
        assert(w <= budget + chunkSize - 1,
          s"shard $shard seq $seq overran the budget: $w words")
        if (seq != last) assert(w >= budget - chunkSize + 1,
          s"shard $shard non-last seq $seq underfull: $w words")
      }
      // with every chunk <= budget, assigned seq ids are dense per shard
      assert(inShard.map(_._2).sorted.toSeq == (0L to last).toSeq,
        s"shard $shard skipped a sequence id")
    }
  }

  test("piiCounts detects each category; clean text counts zero") {
    val df = Seq(
      (1L, "contact bob.smith+x@example.co.uk or call +1 (555) 123-4567 now"),
      (2L, "ssn 123-45-6789 leaked from host 10.0.255.3 twice: 123-45-6789"),
      (3L, "a perfectly clean sentence with no identifiers at all")
    ).toDF("id", "text")
    val out = df.select($"id", piiCounts($"text").as("pii"))
      .select("id", "pii.email", "pii.ssn", "pii.ipv4", "pii.phone")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((1L, 0L, 0L, 1L)))
    // the SSNs are phone-shaped too: categories count independently
    assert(out(2L) == ((0L, 2L, 1L, 2L)))
    assert(out(3L) == ((0L, 0L, 0L, 0L)))
  }

  test("redactPii replaces matches with category tags, emails before phones") {
    val df = Seq((1L, "mail a9@ex.com, ip 10.0.0.1, ssn 123-45-6789, tel 555 123 4567"))
      .toDF("id", "text")
    val red = df.select(redactPii($"text")).as[String].head()
    assert(red == "mail <EMAIL>, ip <IPV4>, ssn <SSN>, tel <PHONE>")
    // idempotent on already-clean text
    val clean = "no identifiers here at all"
    assert(Seq(Tuple1(clean)).toDF("text")
      .select(redactPii($"text")).as[String].head() == clean)
  }

  test("gopherSignals: each rule flips exactly at its integer boundary") {
    // base doc: 50 four-letter words with both list stopwords spliced in —
    // passes every rule
    val base = (Seq("the", "a") ++ Seq.fill(48)("word")).mkString(" ")
    val cases = Seq(
      ("pass", base, Seq(true, true, true, true, true)),
      // 49 words → word-count rule fails, everything else holds
      ("count49", (Seq("the", "a") ++ Seq.fill(47)("word")).mkString(" "),
        Seq(false, true, true, true, true)),
      // mean word length below 3: fifty 2-char words (the+a pull it down)
      ("short", (Seq("the", "a") ++ Seq.fill(48)("ab")).mkString(" "),
        Seq(true, false, true, true, true)),
      // mean word length above 10: 11-char words
      ("long", (Seq("the", "a") ++ Seq.fill(48)("abcdefghijk")).mkString(" "),
        Seq(true, false, true, true, true)),
      // 5 '#' in 50 words: symbol rule needs 5*10 < 50 → fails AT exactly
      // 10%; alpha stays ok (45/50 = 90% ≥ 80%)
      ("symbols", (Seq("the", "a") ++ Seq.fill(5)("#") ++
        Seq.fill(43)("word")).mkString(" "), Seq(true, true, false, true, true)),
      // 11 digit-only words of 50 → alpha fraction 39/50 < 80%
      ("digits", (Seq("the", "a") ++ Seq.fill(11)("1234") ++
        Seq.fill(37)("word")).mkString(" "), Seq(true, true, true, false, true)),
      // only one distinct stopword
      ("onestop", (Seq("the") ++ Seq.fill(49)("word")).mkString(" "),
        Seq(true, true, true, true, false)))
    val got = cases.map { case (id, t, _) => (id, t) }.toDF("id", "text")
      .select($"id", gopherSignals($"text").as("g"))
      .select($"id", $"g.ok_word_count", $"g.ok_mean_word_len",
        $"g.ok_symbol_ratio", $"g.ok_alpha_words", $"g.ok_stopwords", $"g.keep")
      .as[(String, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    cases.foreach { case (id, _, exp) =>
      val r = got(id)
      assert(Seq(r._2, r._3, r._4, r._5, r._6) == exp, s"case $id: $r")
      assert(r._7 == exp.forall(identity), s"case $id keep: $r")
    }
  }

  test("jsDivergence: identity slice is 0, disjoint equal slices hit the hand value") {
    import graft.operators.Vocabulary
    // one slice = the corpus: p = q everywhere, JS = 0 exactly
    val one = Seq((1L, "en", "x y x"), (2L, "en", "y z"))
      .toDF("doc_id", "lang", "text")
    val r0 = Vocabulary.jsDivergence(one, "lang", "text")
      .select("js_div").as[Double].head()
    assert(r0 == 0.0)
    // two disjoint equal-mass slices: per-term p = 1, q = 1/2 →
    // JS = ln2/2 + (ln(4/3) + ln(2/3)/2 − ln2/2)/2 ≈ 0.2158 for both
    val two = Seq((1L, "en", "aa aa"), (2L, "fr", "bb bb"))
      .toDF("doc_id", "lang", "text")
    val r = Vocabulary.jsDivergence(two, "lang", "text")
      .select("lang", "js_div").as[(String, Double)].collect().toMap
    assert(r == Map("en" -> 0.2158, "fr" -> 0.2158))
  }

  test("bigramEntropy: uniform bigrams hit log2(types); repetition hits 0") {
    import graft.operators.Vocabulary
    // rep: "a a a a a" → 4 × bigram (a,a) → H = 0 exactly.
    // div: "a b c a" → bigrams ab, bc, ca each once → H = log2 3.
    // mix: "x y x y x" → xy ×2, yx ×2 → uniform over 2 → H = 1 bit.
    // one-token and empty docs contribute no bigrams and no group row.
    val docs = Seq(
      (1L, "rep", "a a a a a"), (2L, "div", "a b c a"),
      (3L, "mix", "x y x y x"), (4L, "mix", ""), (5L, "mix", "solo")
    ).toDF("doc_id", "source", "text")
    val got = Vocabulary.bigramEntropy(docs, "source", "text")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("rep") == ((4L, 1L, 0.0)))
    assert(got("div") == ((3L, 3L, math.rint(math.log(3) / math.log(2) * 1e4) / 1e4)))
    assert(got("mix") == ((4L, 2L, 1.0)))
  }

  test("rakeKeywords: hand deg/freq scores, run splitting, length caps, " +
    "count filter") {
    import graft.operators.Vocabulary
    val docs = Seq(
      (1L, "big data the big data pipeline a fast scan"),
      (2L, "big data a fast scan")).toDF("doc_id", "text")
    // kept candidates: "big data" x2, "big data pipeline" x1,
    // "fast scan" x2. Stats: big/data freq 3 deg 7; pipeline 1/3;
    // fast/scan 2/4. Scores: 14/3, 14/3 + 3, 2 + 2.
    val all = Vocabulary.rakeKeywords(docs, "doc_id", "text",
      Seq("a", "the"), minCount = 1L)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(all("big data") == ((2L, 2L, r6(14.0 / 3))))
    assert(all("big data pipeline") == ((1L, 1L, r6(14.0 / 3 + 3.0))))
    assert(all("fast scan") == ((2L, 2L, 4.0)))
    // minCount = 2 drops the singleton phrase
    val freq = Vocabulary.rakeKeywords(docs, "doc_id", "text",
      Seq("a", "the"), minCount = 2L).collect().map(_.getString(0)).toSet
    assert(freq == Set("big data", "fast scan"))
    // a 5-word run exceeds maxWords = 4 and produces no candidate
    val long = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    assert(Vocabulary.rakeKeywords(long, "doc_id", "text", Seq("a"),
      minCount = 1L).collect().isEmpty)
  }

  test("msttr: complete-segment TTRs, incomplete tail dropped, per-source " +
    "mean") {
    import graft.operators.Vocabulary
    // segments of 3: [a b a]=2 types, [c c b]=2, [x] incomplete → 4/6
    val docs = Seq((1L, "a b a c c b x", "s1"),
      (2L, "q q q", "s2")) // one segment, 1 type → 1/3
      .toDF("doc_id", "text", "source")
    val got = Vocabulary.msttr(docs, "doc_id", "text", "source", segment = 3)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("s1", 2L, 0.666667), ("s2", 1L, 0.333333)))
    // a doc shorter than one segment contributes nothing
    assert(Vocabulary.msttr(Seq((1L, "a b", "s")).toDF("doc_id", "text",
      "source"), "doc_id", "text", "source", segment = 3).count() == 0)
  }
}
