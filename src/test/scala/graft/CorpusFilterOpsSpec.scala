package graft

import graft.operators.CorpusFilterOps
import org.apache.spark.sql.functions._

/** Round-9 corpus-filtering operators (q205–q208): the oracle gate
  * proves the sf0.01 results; these specs prove the rule/selection
  * semantics on hand-built fixtures where each gate, weight ordering,
  * and backoff branch is planted deliberately. */
class CorpusFilterOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mkWords(n: Int, len: Int, prefix: String): Seq[String] =
    (0 until n).map(i => (prefix + ('a' + i % 26).toChar.toString * len).take(len))

  test("gopher rules: each gate trips on exactly its planted violation") {
    // 23 distinct 5-char words + 2 stopwords = the passing shape
    val okTail = mkWords(23, 5, "w").mkString(" ")
    val docs = Seq(
      (1L, s"the of $okTail", "en"), // all rules pass
      (2L, s"the of ${mkWords(8, 5, "w").mkString(" ")}", "en"), // 10 words
      (3L, s"the of ${mkWords(23, 2, "x").mkString(" ")}", "en"), // mean len < 3
      (4L, mkWords(25, 5, "y").mkString(" "), "en"), // no stopwords
      (5L, s"the of 11111 22222 33333 44444 55555 66666 " +
        mkWords(17, 5, "z").mkString(" "), "en"), // 6/25 non-alpha
      (6L, s"the of dup dup dup dup dup " +
        mkWords(18, 5, "q").mkString(" "), "en")) // top token 5 > 25/10
      .toDF("doc_id", "text", "lang")
    val r = CorpusFilterOps.gopherRulesOf(docs).collect()
      .map(row => row.getLong(0) ->
        (row.getInt(5), row.getInt(6), row.getInt(7), row.getInt(8),
          row.getInt(9), row.getInt(10))).toMap
    assert(r(1L) == (1, 1, 1, 1, 1, 1), s"doc 1 must pass all: ${r(1L)}")
    assert(r(2L)._1 == 0 && r(2L)._6 == 0, s"word-count gate: ${r(2L)}")
    assert(r(3L)._2 == 0 && r(3L)._6 == 0, s"mean-word-length gate: ${r(3L)}")
    assert(r(4L)._3 == 0 && r(4L)._6 == 0, s"stopword gate: ${r(4L)}")
    assert(r(5L)._4 == 0 && r(5L)._6 == 0, s"alpha-ratio gate: ${r(5L)}")
    assert(r(6L)._5 == 0 && r(6L)._6 == 0, s"top-token gate: ${r(6L)}")
    // violations are isolated: every other flag on the failing docs is 1
    assert(r(2L)._2 == 1 && r(2L)._3 == 1 && r(2L)._4 == 1 && r(2L)._5 == 1)
    assert(r(6L)._1 == 1 && r(6L)._2 == 1 && r(6L)._3 == 1 && r(6L)._4 == 1)
    graft.core.EngineCache.releaseAll()
  }

  test("DSIR weights order docs by target-likeness, blind to the lang tag") {
    // target (en) speaks 'alphatok', the rest speak 'betatok'; an xx doc
    // written in pure 'alphatok' must score exactly like the en original —
    // DSIR selects on CONTENT, the lang tag only defines the target fit
    val docs = Seq(
      (0L, Seq.fill(20)("alphatok").mkString(" "), "en"),
      (1L, (Seq.fill(10)("alphatok") ++ Seq.fill(10)("betatok")).mkString(" "), "en"),
      (2L, Seq.fill(20)("betatok").mkString(" "), "xx"),
      (3L, Seq.fill(20)("alphatok").mkString(" "), "xx"))
      .toDF("doc_id", "text", "lang")
    val w = CorpusFilterOps.dsirWeightsOf(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size == 4) // top-50 keeps all on a 4-doc corpus
    assert(w(0L) == w(3L), s"identical token streams must tie: $w")
    assert(w(0L) > w(1L) && w(1L) > w(2L),
      s"weights must order by target-likeness: $w")
    assert(w(2L) < 0, s"an off-target doc must score negative: $w")
    graft.core.EngineCache.releaseAll()
  }

  test("winnowing: a long shared substring pairs docs, disjoint text never does") {
    // 150 shared chars >> K+W-1 = 31, so A and B must share >= tau
    // fingerprints; C shares no 20-char gram with anyone
    val shared = (0 until 30).map(i => f"seg${i}%02d").mkString // 150 chars, varied
    val a = (10L, "unique-prefix-alpha-0123456789" + shared, "en")
    val b = (20L, "other-head-zyxwvutsrq-99887766" + shared, "en")
    val c = (30L, (0 until 40).map(i => f"blk${(i * 7) % 100}%02d").mkString, "en")
    val pairs = CorpusFilterOps.winnowingPairsOf(
        Seq(a, b, c).toDF("doc_id", "text", "lang")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((10L, 20L)),
      s"exactly the sharing pair must surface: ${pairs.toSeq}")
    assert(pairs.head._3 >= CorpusFilterOps.WinTau)
    graft.core.EngineCache.releaseAll()
  }

  test("winnow delete: tombstones drop pairs, re-derived df-cap re-admits stop-grams") {
    import org.apache.spark.sql.functions.{broadcast, col}
    val sq = spark
    import sq.implicits._
    // group S: 10 docs share block X -> its fps have df = 10 > WinDfCap
    // = 8, so the PRE-delete serve suppresses them all as stop-grams.
    // Deleting 3 drops df to 7 <= 8: the fingerprints are RE-ADMITTED
    // and the surviving 7 docs pair up — pairs that exist only because
    // the cap is re-derived on the surviving population at serve time.
    val blockX = (0 until 30).map(i => f"xxs${i}%02d").mkString // 150 chars
    val blockY = (0 until 30).map(i => f"yyt${i}%02d").mkString
    val groupS = (1L to 10L).map(i => (i, f"pfx${i}%02d-abcdefghijklmnopqrstuv" + blockX))
    val pairUv = Seq((11L, "uhead-0123456789-qwertyuiopas" + blockY),
                     (12L, "vhead-9876543210-poiuytrewqsa" + blockY))
    val lone = Seq((13L, (0 until 40).map(i => f"zw${(i * 13) % 100}%02d").mkString))
    val docsDf = (groupS ++ pairUv ++ lone).toDF("doc_id", "text")
    val fps = CorpusFilterOps.winnowFps(docsDf)
      .transform(graft.core.EngineCache.persisted)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = keys(CorpusFilterOps.winnowPairsFromFps(fps))
    assert(before == Set((11L, 12L)),
      s"pre-delete: only the Y pair surfaces (X is a stop-gram): $before")
    val tomb = Seq(8L, 9L, 10L, 12L).toDF("doc_id")
    val after = keys(CorpusFilterOps.winnowPairsFromFps(
      fps.join(broadcast(tomb), Seq("doc_id"), "left_anti")))
    val survivors = (1L to 7L)
    val expected = (for (a <- survivors; b <- survivors if a < b) yield (a, b)).toSet
    assert(after == expected,
      s"post-delete: (11,12) gone, X re-admitted pairs all 7 survivors: $after")
    // delete o store == rebuild on the filtered corpus
    val rebuilt = keys(CorpusFilterOps.winnowingPairsOf(
      docsDf.filter(!col("doc_id").isin(8L, 9L, 10L, 12L))))
    assert(after == rebuilt, s"anti-join must equal rebuild: $after vs $rebuilt")
    graft.core.EngineCache.releaseAll()
  }

  test("min-k% prob: memorized text floors at 0, the tail picks the unseen half") {
    val sq = spark
    import sq.implicits._
    val C = CorpusFilterOps
    val sp = spark.range(0, 200).selectExpr("id",
        s"${graft.core.Determinism.xhashExpr("concat('split:', CAST(id AS STRING))")} % 10 AS sp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainIds = (0L until 200L).filter(sp(_) <= 7).take(20)
    val heldIds = (0L until 200L).filter(sp(_) > 7).take(3)
    val sentence = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = (trainIds.map(id => (id, sentence)) ++ Seq(
      heldIds(0) -> sentence, // fully memorized
      heldIds(1) -> (1 to 12).map(i => s"u$i").mkString(" "), // fully novel
      // half memorized, half novel: min-k% must score the NOVEL tail
      heldIds(2) -> (sentence + " " + (1 to 12).map(i => s"x$i").mkString(" "))))
      .map { case (i, t) => (i, t, "en") }
      .toDF("doc_id", "text", "lang")
    val mink = C.minkProbOf(docs)
    val out = mink.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    // memorized: every trigram seen, all scores ln(1)=0 -> mink = 0
    assert(out(heldIds(0))._3 == 0.0, s"memorized doc must floor at 0: $out")
    // novel: every trigram at the backoff floor -> mink equals q208's avg
    val avg = C.backoffLmOf(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(out(heldIds(1))._3 - avg(heldIds(1))) < 1e-9,
      "an all-unseen doc's bottom tail IS its average")
    // mixed: the bottom 20% is drawn from the novel half, so mink is
    // strictly below the doc's overall average
    assert(out(heldIds(2))._3 < avg(heldIds(2)),
      s"min-k% must pick the unseen tail: ${out(heldIds(2))._3} vs ${avg(heldIds(2))}")
    // k accounting: m = max(1, floor(0.2 * n_tri))
    assert(out.forall { case (_, (n, m, _)) =>
      m == math.max(1, n * C.MinkPct / 100) })
    graft.core.EngineCache.releaseAll()
  }

  test("ppl buckets: per-lang terciles follow LM score, rank-pure, partition-invariant") {
    val sq = spark
    import sq.implicits._
    val C = CorpusFilterOps
    // replicate the operator's hash split; per language plant three
    // held-out docs of graded quality: fully memorized (avg_logp 0 →
    // head), half novel (→ middle), fully novel (LM floor → tail)
    val sp = spark.range(0, 400).selectExpr("id",
        s"${graft.core.Determinism.xhashExpr("concat('split:', CAST(id AS STRING))")} % 10 AS sp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainIds = (0L until 400L).filter(sp(_) <= 7).take(20)
    val heldIds = (0L until 400L).filter(sp(_) > 7).take(6)
    val sentence = (1 to 12).map(i => s"tok$i").mkString(" ")
    def novel(p: String) = (1 to 12).map(i => s"$p$i").mkString(" ")
    val docs = (trainIds.map(id => (id, sentence, "en")) ++ Seq(
      (heldIds(0), sentence, "en"),
      (heldIds(1), sentence + " " + novel("x"), "en"),
      (heldIds(2), novel("u"), "en"),
      (heldIds(3), sentence, "de"),
      (heldIds(4), sentence + " " + novel("y"), "de"),
      (heldIds(5), novel("v"), "de")))
      .toDF("doc_id", "text", "lang")
    val out = C.pplBucketsOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3), r.getString(4)))
      .toMap
    // only held-out docs are bucketed, three per language
    assert(out.keySet == heldIds.toSet, s"held-out only: $out")
    // each language's tercile follows its LM scores: memorized → head,
    // mixed → middle, novel → tail — per-lang independently
    assert(out(heldIds(0))._3 == "head" && out(heldIds(1))._3 == "middle" &&
      out(heldIds(2))._3 == "tail", s"en terciles: $out")
    assert(out(heldIds(3))._3 == "head" && out(heldIds(4))._3 == "middle" &&
      out(heldIds(5))._3 == "tail", s"de terciles: $out")
    // the bucket is a pure rank of avg_logp: head score >= middle >= tail
    Seq("en", "de").foreach { l =>
      val s = out.values.filter(_._1 == l).toSeq
      val by = s.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      assert(by("head").min >= by("middle").max &&
        by("middle").min >= by("tail").max, s"$l rank order: $s")
    }
    // pure function of the data: re-partitioning changes nothing
    val again = C.pplBucketsOf(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3), r.getString(4)))
      .toMap
    assert(again == out, "ppl buckets must be partition-invariant")
    graft.core.EngineCache.releaseAll()
  }

  test("backoff LM: in-domain held-out scores 0, unseen text hits the floor") {
    val sq = spark
    import sq.implicits._
    // replicate the operator's hash split to plant docs on both sides
    val sp = spark.range(0, 200).selectExpr("id",
        s"${graft.core.Determinism.xhashExpr("concat('split:', CAST(id AS STRING))")} % 10 AS sp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainIds = (0L until 200L).filter(sp(_) <= 7).take(20)
    val heldIds = (0L until 200L).filter(sp(_) > 7).take(2)
    val sentence = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = (trainIds.map(id => (id, sentence, "en")) ++ Seq(
      (heldIds(0), sentence, "en"), // every trigram seen: c3/c12 = 1
      (heldIds(1), (1 to 12).map(i => s"unseen$i").mkString(" "), "en")))
      .toDF("doc_id", "text", "lang")
    val out = CorpusFilterOps.backoffLmOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out.keySet == heldIds.toSet, s"only held-out docs are scored: $out")
    assert(out(heldIds(0)) == (10, 0.0),
      s"all-seen trigrams score ln(1) = 0 exactly: ${out(heldIds(0))}")
    // all-unseen: every trigram backs off to alpha^2 * 1 / (N + V)
    val n = 12L * trainIds.size; val v = 12L
    val l8 = math.floor(math.log(0.4 * 0.4 * 1.0 / (n + v)) * 1e8 + 0.5)
    // s8 = 10·l8 over n_tri = 10 trigrams → the per-trigram value
    val want = math.floor(l8 * 10 / 1e8 / 10 * 1e6 + 0.5) / 1e6
    assert(out(heldIds(1))._1 == 10)
    assert(out(heldIds(1))._2 == want,
      s"unseen-floor score must match the closed form: ${out(heldIds(1))._2} vs $want")
    graft.core.EngineCache.releaseAll()
  }

  test("mix weights: exact sqrt-grid temperature weights per source") {
    // planted token totals are perfect squares so every leg is
    // hand-exact: web 9 tokens -> w_num 3e6, wiki 8+8 = 16 -> 4e6,
    // books 25 -> 5e6; denominator 12e6 shared by every row
    val docs = Seq(
      (1L, "a b c d e f g h i", "web"),
      (2L, "a b c d e f g h", "wiki"),
      (3L, "p q r s t u v w", "wiki"),
      (4L, (1 to 25).map(i => s"t$i").mkString(" "), "books"))
    docs.toDF("doc_id", "text", "source").createOrReplaceTempView("documents")
    val got = spark.sql(CorpusFilterOps.mixWeightsSqlFor(
      s"size(${graft.functions.TextFunctions.wordsExpr("text")})"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "web" -> ((1L, 9L, 3000000L, 12000000L)),
      "wiki" -> ((2L, 16L, 4000000L, 12000000L)),
      "books" -> ((1L, 25L, 5000000L, 12000000L))),
      s"hand weights drifted: $got")
    // α = 1/2 sits between natural frequency and uniform: the weight
    // RATIO compresses the token ratio (25/9 tokens -> 5/3 weight)
    assert(got("books")._3 * 9L == got("web")._3 * 15L,
      "sqrt compression must hold exactly on the grid")
    graft.core.EngineCache.releaseAll()
  }
}
