package graft

import graft.llm.Dedup
import graft.operators.CorpusOps
import org.apache.spark.sql.functions._

/** Round-4 operator properties: PassJoin recall (the blocked plan finds
  * every true edit-distance pair), entropy on known distributions,
  * priority-sample determinism under repartitioning, snapshot-diff
  * classification. */
class CorpusOpsSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    val sq = spark
    import sq.implicits._
    rows.toDF("doc_id", "text")
  }

  test("editDistancePairs equals unblocked ground truth, incl. first-segment edits") {
    // 32-char-ish strings; pair (1,2) differs ONLY inside the first
    // segment (the case naive prefix blocking drops), (3,4) differs by
    // one char per segment region (3 edits), (5,6) is 4 edits — excluded.
    val d = docsOf(
      1L -> "aaaaaaaabbbbbbbbccccccccdddddddd",
      2L -> "aaaxxaaabbbbbbbbccccccccdddddddd",
      3L -> "eeeeeeeeffffffffgggggggghhhhhhhh",
      4L -> "eeeeeeeXffffffXfgggggggXhhhhhhhh",
      5L -> "iiiiiiiijjjjjjjjkkkkkkkkllllllll",
      6L -> "iiiXiiiXjjjjXjjjkkkkkkkXllllllll",
      7L -> "some totally unrelated text here")
    val blocked = Dedup.editDistancePairs(d, "doc_id", "text", 32, 3)
      .orderBy("id_a", "id_b").collect()
    // ground truth: all pairs, same padded key, no blocking
    val p = d.selectExpr("doc_id AS id",
      "rpad(lower(substr(text, 1, 32)), 32, '#') AS s")
    val truth = p.alias("a").join(p.alias("b"), col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.s"), col("b.s")))
      .filter(col("dist") <= 3)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist"))
      .orderBy("id_a", "id_b").collect()
    assert(blocked.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ===
      truth.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq)
    assert(blocked.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L), (3L, 4L)))
  }

  test("script profile counts BMP ranges and picks the dominant script deterministically") {
    val out = graft.operators.LlmQueries.scriptProfileOf(docsOf(
      1L -> "hello world 42",            // latin + digits + spaces
      2L -> "привет мир",                // cyrillic
      3L -> "你好世界 hello",              // cjk beats latin 4:5? no — latin 5 wins
      4L -> "αβγ αβγ",                   // greek
      5L -> "مرحبا",                     // arabic
      6L -> "12 34",                     // digits only: no script → none
      7L -> "你好 ok"                     // tie cjk=2 latin=2 → alphabetical: cjk
    )).collect().map(r => r.getLong(0) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(10)))).toMap
    // columns: arabic, cjk, cyrillic, greek, latin, dominant
    assert(out(1L) === ((0L, 0L, 0L, 0L, 10L, "latin")))
    assert(out(2L) === ((0L, 0L, 9L, 0L, 0L, "cyrillic")))
    assert(out(3L) === ((0L, 4L, 0L, 0L, 5L, "latin")))
    assert(out(4L) === ((0L, 0L, 0L, 6L, 0L, "greek")))
    assert(out(5L) === ((5L, 0L, 0L, 0L, 0L, "arabic")))
    assert(out(6L) === ((0L, 0L, 0L, 0L, 0L, "none")))
    assert(out(7L) === ((0L, 2L, 0L, 0L, 2L, "cjk")),
      "ties break alphabetically on the script name")
    // n_other accounts exactly: n_chars = scripts + digit + space + other
    graft.operators.LlmQueries.scriptProfileOf(docsOf(
      8L -> "a9 好 ب!#")).collect().foreach { r =>
      val total = (2 to 8).map(r.getLong).sum + r.getLong(9)
      assert(r.getLong(1) === total)
    }
  }

  test("BPE trainer replays Sennrich merges with non-overlapping greedy application") {
    // "aaaa" ×2 and "ab": round 1 counts (a,a) 3·2=6 vs (a,b) 1 →
    // merge (a,a); greedy non-overlap turns a|a|a|a into aa|aa (NOT
    // aa|a|a), so round 2 sees (aa,aa) 2 vs (a,b) 1 → merge (aa,aa);
    // round 3 merges the leftover (a,b); then the corpus runs dry and
    // the table ends early (3 rows, not BpeRounds)
    val out = graft.operators.LlmQueries.bpeTrainOf(
      docsOf(1L -> "aaaa", 2L -> "aaaa", 3L -> "ab")).collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "aa", "aa", "aaaa", 2L),
      (3, "a", "b", "ab", 1L)))
  }

  test("BPE separator invariant: a literal chr(31) in text can never become a piece") {
    // chr(31) is the segmentation separator; the pre-tokenizer regex
    // excludes control chars so raw text cannot inject it into a
    // symbol — the byte behaves as a piece delimiter (like whitespace),
    // never as a piece. A doc embedding chr(31) (and quotes, exercising
    // the literal escaping) must train exactly like its space twin.
    val us = 31.toChar.toString
    val dirty = docsOf(1L -> s"aa${us}aa", 2L -> s"a'${us}'a")
    val clean = docsOf(1L -> "aa aa", 2L -> "a' 'a")
    def table(df: org.apache.spark.sql.DataFrame) =
      graft.operators.LlmQueries.bpeTrainOf(df).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    val t = table(dirty)
    assert(t === table(clean), "chr(31) must be invisible to training")
    assert(t.forall { case (_, l, r2, m, _) =>
      !(l + r2 + m).contains(us) }, "no symbol may contain the separator")
  }

  test("BPE trainer returns an empty merge table when nothing is mergeable") {
    // every piece single-character → zero adjacent pairs → zero merges;
    // must come back as an empty (rank, lhs, rhs, merged, pair_cnt)
    // frame, not a FROM VALUES syntax error
    val out = graft.operators.LlmQueries.bpeTrainOf(
      docsOf(1L -> "a b c", 2L -> "! ? ."))
    assert(out.columns.toSeq ===
      Seq("rank", "lhs", "rhs", "merged", "pair_cnt"))
    assert(out.count() === 0L)
  }

  test("BPE tokenize serves counts from the trained vocab, zeros for empty docs") {
    val out = graft.operators.LlmQueries.bpeTokenizeOf(
      docsOf(1L -> "aaaa", 2L -> "aaaa", 3L -> "ab", 4L -> "")).collect()
    // after merges (a,a), (aa,aa), (a,b): both pre-tokens collapse to
    // one symbol; the empty doc keeps a zero row
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq(
      (1L, 1L, 4L, 1L), (2L, 1L, 4L, 1L),
      (3L, 1L, 2L, 1L), (4L, 0L, 0L, 0L)))
  }

  test("BM25 purge: idempotent, and a torn two-table publish converges next run") {
    val C = graft.operators.CorpusOps
    val W = graft.core.Warehouse
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val first = key(C.bm25IndexPurge(spark, sfDir))
    val dt = "bm25_doclen_purge_" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
    val pt = "bm25_postings_purge_" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
    val (vP, vD) = (W.publishedVersion(spark, pt).get,
      W.publishedVersion(spark, dt).get)
    // second run: nothing tombstoned remains -> no publish, same answer
    assert(key(C.bm25IndexPurge(spark, sfDir)) == first, "purge not a fixpoint")
    assert(W.publishedVersion(spark, pt).get == vP &&
      W.publishedVersion(spark, dt).get == vD,
      "a clean purge must not publish new versions")
    // simulate a writer killed between the two publishes: doclen reverts
    // to the UNPURGED table (tombstones back) while postings stay purged
    W.publish(C.bm25DoclenOf(
      graft.core.Tables.load(spark, sfDir, "documents")), dt)
    assert(key(C.bm25IndexPurge(spark, sfDir)) == first,
      "the torn pair must converge to the purged answer on the next run")
    assert(W.readTable(spark, dt)
      .filter(s"doc_id % ${C.Bm25DelMod} = ${C.Bm25DelRem}").isEmpty,
      "convergence must re-purge the stale table")
    graft.core.EngineCache.releaseAll()
  }

  test("wordpiece: greedy longest-match, continuation vocab, and the UNK fallback") {
    val L = graft.operators.LlmQueries
    // replicate the operator's doc_id hash split to land one doc in
    // train (vocab source) and one held-out (segmentation only)
    val xh = graft.core.Determinism.xhashExpr _
    val sp = spark.range(0, 50)
      .selectExpr("id", s"${xh("concat('split:', CAST(id AS STRING))")} % 10 AS sp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = (0L until 50L).find(sp(_) <= 7).get
    val heldId = (0L until 50L).find(sp(_) > 7).get
    // train vocab from {abab ×3, ab ×1}: i = {a} ∪ {ab, aba, abab},
    // c = {a, b} ∪ {ab, ba, bab} — all multi-char pieces fit WpTopN
    val out = L.wordpieceOf(docsOf(
        trainId -> "abab abab abab ab",
        heldId -> "abab ababab ba")).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def h(s: String): Long = spark.sql(
      s"SELECT ${xh(s"'$s'")} % ${L.WpCkMod}").head().getLong(0)
    // held-out: "abab" → [abab:i]; "ababab" → GREEDY takes abab (4)
    // then ##ab — not aba+bab; "ba" → no 'b' in the INITIAL vocab
    // (no train word starts with b) → one [UNK] piece
    assert(out(heldId) == (3L, 4L, 1L,
      2 * h("abab:i") + h("ab:c") + h("[UNK]:i")),
      s"held-out segmentation drifted: ${out(heldId)}")
    // train doc: three 1-piece abab + 1-piece ab, zero UNK
    assert(out(trainId) == (4L, 4L, 0L, 3 * h("abab:i") + h("ab:i")),
      s"train segmentation drifted: ${out(trainId)}")
    graft.core.EngineCache.releaseAll()
  }

  test("frozen-vocab wordpiece serves batches against the base vocab, OOV hits UNK") {
    val L = graft.operators.LlmQueries
    val xh = graft.core.Determinism.xhashExpr _
    // base vocab from {abab ×3, ab ×1} (as in the q240 spec, but frozen
    // from a separate corpus): i = {a, ab, aba, abab}, c = {a, b, ab,
    // ba, bab}
    val base = docsOf(1L -> "abab abab abab ab")
    val vocab = L.wordpieceVocabOf(base)
      .transform(graft.core.EngineCache.persisted)
    // the batch was never seen at vocab time: "ababab" segments
    // greedily [abab, ##ab], "ba" has no initial piece -> [UNK],
    // "abab" is one piece
    val out = L.wordpieceFrozenOf(
        docsOf(50L -> "abab ababab ba"), vocab).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def h(s: String): Long = spark.sql(
      s"SELECT ${xh(s"'$s'")} % ${L.WpCkMod}").head().getLong(0)
    assert(out(50L) == (3L, 4L, 1L,
      2 * h("abab:i") + h("ab:c") + h("[UNK]:i")),
      s"frozen segmentation drifted: ${out(50L)}")
    graft.core.EngineCache.releaseAll()
  }

  test("unigram LM: Viterbi segmentation, hard-EM piece dropping, both UNK protocols") {
    val L = graft.operators.LlmQueries
    val xh = graft.core.Determinism.xhashExpr _
    // land one doc in the train split (sp <= 7) and one held out,
    // replicating the operator's doc_id hash split
    val sp = spark.range(0, 50)
      .selectExpr("id", s"${xh("concat('split:', CAST(id AS STRING))")} % 10 AS sp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = (0L until 50L).find(sp(_) <= 7).get
    val heldId = (0L until 50L).find(sp(_) > 7).get
    // train = {aaaa ×3}: seed counts a:12, aa:9, aaa:6, aaaa:3 (total
    // 30) — the SEED Viterbi of "aaaa" picks the single piece
    // (ln 0.1 > 2·ln 0.3 > ln 0.2 + ln 0.4 > 4·ln 0.4), so hard-EM
    // re-counts {aaaa: 3} + the char floor {a: 1} and DROPS aa/aaa
    // (cnt 0). Round 2 must segment "aa" as a+a — only a survived —
    // proving the EM round actually reshaped the distribution.
    val out = L.unigramLmOf(docsOf(
        trainId -> "aaaa aaaa aaaa",
        // held out: 1 piece, 2 pieces, unseen char → [UNK],
        // 13 chars > UgMaxWord → [UNK]
        heldId -> "aaaa aa b aaaaaaaaaaaaa")).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def h(s: String): Long = spark.sql(
      s"SELECT pmod(${xh(s"'$s'")}, ${L.UgCkMod})").head().getLong(0)
    assert(out(trainId) == (3L, 3L, 0L, 3 * h("aaaa")),
      s"train segmentation drifted: ${out(trainId)}")
    assert(out(heldId) == (4L, 5L, 2L,
      h("aaaa") + 2 * h("a") + 2 * h("[UNK]")),
      s"held-out segmentation drifted: ${out(heldId)}")
    graft.core.EngineCache.releaseAll()
  }

  test("frozen unigram serve segments batches against the at-rest distribution") {
    val L = graft.operators.LlmQueries
    val xh = graft.core.Determinism.xhashExpr _
    // base {aaaa ×3} trains with NO split; hard-EM keeps {aaaa, a}
    // and drops aa/aaa (the q257 spec's argument) — assert the stored
    // distribution is exactly that before serving
    val pieces = L.unigramPiecesOf(docsOf(1L -> "aaaa aaaa aaaa"))
      .transform(graft.core.EngineCache.persisted)
    assert(pieces.collect().map(_.getString(0)).toSet == Set("a", "aaaa"),
      "hard-EM must keep exactly the on-path pieces + char floor")
    // the batch was never seen at train time: 1 piece, a+a (aa was
    // dropped), unseen char → [UNK], 13 chars > UgMaxWord → [UNK]
    val out = L.unigramFrozenOf(
        docsOf(50L -> "aaaa aa b aaaaaaaaaaaaa"), pieces).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def h(s: String): Long = spark.sql(
      s"SELECT pmod(${xh(s"'$s'")}, ${L.UgCkMod})").head().getLong(0)
    assert(out(50L) == (4L, 5L, 2L,
      h("aaaa") + 2 * h("a") + 2 * h("[UNK]")),
      s"frozen segmentation drifted: ${out(50L)}")
    graft.core.EngineCache.releaseAll()
  }

  test("frozen-vocab BPE serving matches training and folds OOV pieces exactly") {
    // frozen artifacts from the Sennrich spec corpus: merges
    // (a,a)->aa, (aa,aa)->aaaa, (a,b)->ab, then the corpus runs dry
    val serve = graft.operators.LlmQueries.bpeTokenizeFrozen(
      docsOf(1L -> "aaaa", 2L -> "aaaa", 3L -> "ab"))
    val out = serve(docsOf(
        10L -> "aaaa",   // in-vocab: collapses to 1 token
        11L -> "aaa",    // OOV: a|a|a -> greedy (a,a) -> aa|a = 2
        12L -> "aaaaa",  // OOV: aa|aa|a -> (aa,aa) -> aaaa|a = 2
        13L -> "ba",     // OOV: (a,b) never matches b-then-a = 2
        14L -> ""))      // no pieces: zero row survives
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L) === ((1L, 4L, 1L)))
    assert(out(11L) === ((1L, 3L, 2L)))
    assert(out(12L) === ((1L, 5L, 2L)))
    assert(out(13L) === ((1L, 2L, 2L)))
    assert(out(14L) === ((0L, 0L, 0L)))
    // serving the training corpus itself reproduces the train-time
    // apply bit for bit (vocab join path, no OOV anywhere)
    val self = serve(docsOf(1L -> "aaaa", 2L -> "aaaa", 3L -> "ab"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(self === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    graft.core.EngineCache.releaseAll()
  }

  test("held-out perplexity: in-distribution scores low, alien text high, OOV exact") {
    val sq = spark
    import sq.implicits._
    val fluent = "the cat sat on the mat"
    val train = (1 to 10).map(i => (i.toLong, fluent, "train"))
    val batch = Seq(
      (100L, fluent, "batch"),            // every bigram seen 10x: low bits
      (101L, "zz yy xx ww vv uu", "batch"), // nothing seen: oov 1, high bits
      (102L, "the cat zz yy", "batch"))   // half seen
    val out = CorpusOps.heldoutPerplexityOf(
      (train ++ batch).toDF("doc_id", "text", "source"), "batch").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(out.keySet === Set(100L, 101L, 102L),
      "only batch docs are scored")
    assert(out(100L)._3 === 0.0, "all bigrams seen in train")
    assert(out(101L)._3 === 1.0, "no bigram seen in train")
    assert(out(102L)._3 > 0.0 && out(102L)._3 < 1.0)
    // add-one smoothing detail: an UNSEEN history scores p = 1/v while a
    // seen history with an unseen continuation scores 1/(c1+v) — so the
    // mixed doc can out-surprise the fully-alien one; the guaranteed
    // order is only in-distribution below everything out-of-distribution
    assert(out(100L)._2 < out(101L)._2 && out(100L)._2 < out(102L)._2,
      s"in-distribution text must score lowest: $out")
  }

  test("bm25 delete: tombstoned docs vanish and every surviving score re-flows") {
    import graft.operators.CorpusOps
    val corpus = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    assert(corpus.exists(_ % CorpusOps.Bm25DelMod == CorpusOps.Bm25DelRem),
      "fixture must contain at least one tombstoned doc")
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val before = CorpusOps.bm25IndexServe(spark, sfDir).collect().map(key).toSet
    val after = CorpusOps.bm25IndexDelete(spark, sfDir).collect().map(key).toSet
    assert(after.nonEmpty)
    assert(after.forall(_._3 % CorpusOps.Bm25DelMod != CorpusOps.Bm25DelRem),
      "a tombstoned doc leaked into the post-delete ranking")
    // |D| and avgdl shrink with the corpus, so EVERY surviving score
    // must shift — identical result sets would mean the tombstones
    // never reached the statistics
    assert(before != after,
      "deletion must be observable in the served ranking")
    graft.core.EngineCache.releaseAll()
  }

  test("retrieval nDCG exposes tf-vs-coverage disagreement, 1.0 on agreement") {
    val sq = spark
    import sq.implicits._
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val docsF = Seq(
      // short doc, one query term repeated: BM25 loves it, rel = 1
      1L -> "spark spark",
      // all three bq1 terms once, buried in length: rel = 3, BM25
      // length normalization pushes it below doc 1
      2L -> s"spark hash table $filler",
      // exactly one relevant doc for bq2: any order is ideal
      3L -> "window sort merge",
      // hash/table appear here too: raises their df (deflating doc 2's
      // rare-term advantage) and makes these rel=2 docs BM25 ranks
      // above the rel=3 doc — the planted order disagreement
      4L -> "hash table g1 g2 g3 g4 g5 g6 g7 g8",
      5L -> "hash table h1 h2 h3 h4 h5 h6 h7 h8").toDF("doc_id", "text")
    val out = CorpusOps.retrievalNdcgOf(docsF).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // bq3 terms are absent entirely: no row
    assert(out.keySet === Set("bq1", "bq2"))
    val (d1, i1, n1) = out("bq1")
    assert(d1 <= i1, "DCG can never beat the ideal ordering")
    assert(n1 < 1.0,
      s"planted tf-heavy doc must outrank the full-coverage doc: $out")
    assert(out("bq2")._3 === 1.0)
  }

  test("wordEntropy matches closed-form values on known distributions") {
    val d = docsOf(
      1L -> "a a b b",     // uniform over 2 → 1 bit, gini 0.5
      2L -> "a b c d",     // uniform over 4 → 2 bits, gini 0.75
      3L -> "a a a a")     // degenerate → 0 bits, gini 0
    val rows = CorpusOps.wordEntropy(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows.map(_.getDouble(3)).toSeq === Seq(1.0, 2.0, 0.0))
    assert(rows.map(_.getDouble(4)).toSeq === Seq(0.5, 0.75, 0.0))
    assert(rows.map(_.getLong(1)).toSeq === Seq(4L, 4L, 4L))
    assert(rows.map(_.getLong(2)).toSeq === Seq(2L, 4L, 1L))
  }

  test("prioritySample is the exact smallest-N set and partitioning-invariant") {
    val d = docsOf((1L to 200L).map(i =>
      i -> (s"token " * (1 + (i % 17).toInt)).trim): _*)
    val s1 = CorpusOps.prioritySample(d, "doc_id", "text", 50).collect()
    val s2 = CorpusOps.prioritySample(d.repartition(13), "doc_id", "text", 50)
      .collect()
    assert(s1.map(_.getLong(0)).toSeq === s2.map(_.getLong(0)).toSeq)
    // the kept set is exactly the 50 smallest priorities
    val all = CorpusOps.prioritySample(d, "doc_id", "text", 200)
      .collect().map(r => (r.getDouble(2), r.getLong(0)))
    assert(s1.map(r => (r.getDouble(2), r.getLong(0))).toSeq ===
      all.sorted.take(50).toSeq)
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val sq = spark
    import sq.implicits._
    val a = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "vh")
    val b = Seq((2L, 20L), (3L, 31L), (4L, 40L)).toDF("k", "vh")
    val out = CorpusOps.snapshotDiff(a, b, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("hybrid RRF fusion is arithmetic-consistent with its input rankings") {
    val fused = CorpusOps.hybridSearch(spark, sfDir).collect()
    assert(fused.nonEmpty)
    val byQuery = fused.groupBy(_.getString(0))
    assert(byQuery.keySet == CorpusOps.DenseProbes.map(_._1).toSet)
    byQuery.values.foreach(rows => assert(rows.length <= CorpusOps.FuseTopK))
    fused.foreach { r =>
      val rs = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val rd = if (r.isNullAt(5)) None else Some(r.getInt(5))
      // every fused doc came from at least one list, and its score is
      // exactly the bridged 1/(C+rank) sum of the lists it appears in
      assert(rs.nonEmpty || rd.nonEmpty)
      def term(rk: Option[Int]): Long = rk
        .map(x => math.floor(1e9 / (CorpusOps.RrfC + x)).toLong).getOrElse(0L)
      assert(r.getDouble(3) == (term(rs) + term(rd)).toDouble / 1e9)
    }
    // fused scores are non-increasing down each query's ranking
    byQuery.values.foreach { rows =>
      rows.sortBy(_.getInt(1)).map(_.getDouble(3)).sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ =>
      }
    }
  }

  test("PSI drift alarms on a shifted source, stays flat on twins") {
    val sq = spark
    import sq.implicits._
    val clean = (1 to 80).map(j => s"w$j").mkString(" ")   // long, high quality
    val junk = "x!! y!! z!!"                               // short, punct-heavy
    val rows =
      (1 to 20).map(i => (i.toLong, clean, "srcA")) ++
      (21 to 40).map(i => (i.toLong, clean, "srcB")) ++     // twin of A
      (41 to 50).map(i => (i.toLong, junk, "srcC"))         // shifted
    val d = rows.toDF("doc_id", "text", "source")
    val psi = CorpusOps.psiDriftOf(d).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(psi.keySet === Set("srcA", "srcB", "srcC"))
    // PSI is a sum of (p-q)ln(p/q) >= 0 terms
    assert(psi.values.forall(_ >= 0.0))
    assert(psi("srcA") === psi("srcB"),
      "identically distributed sources must score identically")
    assert(psi("srcC") > psi("srcA") + 0.25,
      s"shifted source must alarm: $psi")
  }

  test("KMV source Jaccard: exact on twins and disjoint, close in between") {
    val sq = spark
    import sq.implicits._
    def text(words: Seq[String]) = words.mkString(" ")
    val vocabA = (1 to 300).map(i => s"a$i")
    val vocabC = (1 to 300).map(i => s"c$i")
    // srcA and srcB identical text -> identical shingle sets -> J = 1;
    // srcC fully disjoint -> J = 0
    val d = Seq(
      (1L, text(vocabA), "srcA"),
      (2L, text(vocabA), "srcB"),
      (3L, text(vocabC), "srcC")
    ).toDF("doc_id", "text", "source")
    val est = graft.operators.LlmQueries.sourceJaccardOf(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est(("srcA", "srcB")) === 1.0)
    assert(est(("srcA", "srcC")) === 0.0)
    assert(est(("srcB", "srcC")) === 0.0)
    // half-overlapping vocab: estimate within KMV error of the truth
    val shared = (1 to 150).map(i => s"s$i")
    val d2 = Seq(
      (1L, text(shared ++ (1 to 150).map(i => s"x$i")), "srcX"),
      (2L, text(shared ++ (1 to 150).map(i => s"y$i")), "srcY")
    ).toDF("doc_id", "text", "source")
    val e2 = graft.operators.LlmQueries.sourceJaccardOf(d2).collect()
      .head.getDouble(2)
    // exact J of the shingle sets (3-gram shingles across the seam mix,
    // so compute the truth from the real sets, not the vocab ratio)
    import graft.functions.TextFunctions
    val sets = d2.select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.explode(
          TextFunctions.wordShingles("text", 3)).as("s"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    val (sx, sy) = (sets("srcX"), sets("srcY"))
    val truth = sx.intersect(sy).size.toDouble / sx.union(sy).size
    assert(math.abs(e2 - truth) < 0.15,
      s"KMV estimate $e2 too far from exact $truth")
  }
}
