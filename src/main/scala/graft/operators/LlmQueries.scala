package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Determinism._
import graft.core.Tables
import graft.functions.{GraftFunctions, TextFunctions}
import graft.functions.TextFunctions._
import graft.llm.{Dedup, Multimodal, Packing, Similarity}

/** The LLM-training-data operator inventory as driver-checkable queries:
  * text analysis, every dedup variant, similarity search, multimodal
  * metadata (SURVEY.md §2 Part B last row + the north-star extensions).
  * Constants here parameterize BOTH the Spark plan and the generated
  * DuckDB oracle, so candidate sets match exactly.
  */
object LlmQueries {

  // Shared tuning constants (Spark plan ⟷ oracle SQL)
  val WordShingleN = 3
  val MinhashK = 8
  val MinhashBands = 4
  val MinhashTau = 0.5
  val CharNgramN = 4
  // 2 bands × 8 rows: LSH S-curve threshold (1/b)^(1/r) ≈ 0.92. Char
  // 4-grams of same-language text share ~0.45 Jaccard at baseline, so
  // short bands admit O(n²) candidates; 8 rows cuts the background
  // collision rate to ~0.2% while keeping near-identical docs.
  val CharHashK = 16
  val CharBands = 2
  val CharTau = 0.6
  val SimhashMaxHamming = 3
  val EmbTau = 0.35
  val BruteK = 5
  val IvfK = 3
  // SRP-LSH: 10 bands × 6 bits — cos ≥ 0.95 pairs caught w.p. ~0.999,
  // background (cos ≈ 0) band-collision rate 0.5^6 ≈ 1.6%
  val SrpBits = 60
  val SrpBands = 10
  val SrpTopK = 20
  val EmbDims = 64
  // k-means: 8 cells, 2 Lloyd rounds — enough to move every centroid off
  // its seed vector while keeping the unrolled oracle readable
  val KmK = 8
  val KmRounds = 2

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
  private def embs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** Text statistics: chars, whitespace tokens, BPE-ish tokens, punctuation,
    * stopword ratio — the standard quality-filter signals. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_actual"),
      tokenCount("text").as("n_tokens"),
      bpeTokenCount("text").as("n_bpe_tokens"),
      punctCount("text").as("n_punct"),
      lexiconHits("text", EnglishStopwords).as("n_stopwords"),
      dround(lexiconHits("text", EnglishStopwords).cast("double") /
        tokenCount("text"), 6).as("stopword_ratio"))
      .orderBy("doc_id")

  /** The composite quality score shared by q31/q55/q78/q86 — length,
    * punctuation, stopword signals with fixed weights, 6dp-rounded.
    * SQL twin: [[qualitySql]]. */
  private[operators] def qualityCol: org.apache.spark.sql.Column = {
    val tokens = tokenCount("text").cast("double")
    val punctR = punctCount("text").cast("double") / length(col("text"))
    val stopR = lexiconHits("text", EnglishStopwords).cast("double") / tokens
    dround(
      least(tokens / 100.0, lit(1.0)) * 0.4 + (lit(1.0) - punctR) * 0.3 + stopR * 0.3, 6)
  }
  private[operators] def qualitySql: String = {
    val tokens = s"${tokenCountSql("text")}::DOUBLE"
    val punctR = s"${punctCountSql("text")}::DOUBLE / length(text)"
    val stopR = s"${lexiconHitsSql("text", EnglishStopwords)}::DOUBLE / ($tokens)"
    droundSql(
      s"least($tokens / 100.0, 1.0) * 0.4 + (1.0 - ($punctR)) * 0.3 + ($stopR) * 0.3", 6)
  }

  /** Composite quality score + class — length, punctuation, stopword
    * signals combined with fixed weights. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val score = qualityCol
    docs(spark, dir).select(
      col("doc_id"), score.as("quality"),
      when(score >= 0.5, "high").when(score >= 0.35, "medium").otherwise("low")
        .as("quality_class"))
      .orderBy("doc_id")
  }

  /** Marker-lexicon language ID with deterministic argmax. */
  def langIdQuery(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      TextFunctions.langId("text").as("lang_guess"),
      col("lang").as("lang_label"))
      .orderBy("doc_id")

  /** Content + bag fingerprints (rolling-hash document identity). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      contentFingerprint("text").as("content_fp"),
      bagFingerprint("text").as("bag_fp"))
      .orderBy("doc_id")

  /** Exact dedup via hash group-by on the bag fingerprint (raw-text hash
    * yields all-singleton clusters on this fixture; the bag key catches
    * its planted reordered-word duplicates). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactClusters(docs(spark, dir), "doc_id", bagFingerprint("text"))
      .orderBy("fp")

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(docs(spark, dir), "doc_id", "text",
      WordShingleN, MinhashK, MinhashBands, MinhashTau)
      .orderBy("id_a", "id_b")

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(spark, dir), "doc_id", "text", SimhashMaxHamming)
      .orderBy("id_a", "id_b")

  def dedupCharNgram(spark: SparkSession, dir: String): DataFrame =
    Dedup.charNgramPairs(docs(spark, dir), "doc_id", "text",
      CharNgramN, CharHashK, CharBands, CharTau)
      .orderBy("id_a", "id_b")

  /** Training-mixture quota sampling: the best `QuotaPerLang` documents
    * per language by quality score — how a pipeline balances a corpus
    * across sources/languages under a per-bucket budget. One keyed window
    * (quality desc, doc_id tiebreak), no global sort; at 100 TB each
    * language partition ranks independently. */
  val QuotaPerLang = 40
  def quotaSample(spark: SparkSession, dir: String): DataFrame = {
    val score = qualityCol
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("quality").desc, col("doc_id"))
    docs(spark, dir)
      .select(col("doc_id"), col("lang"), score.as("quality"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= QuotaPerLang)
      .orderBy("lang", "rk")
  }

  /** Gopher-style repetition/boilerplate signals: distinct-word ratio,
    * most-common-word fraction, most-common-bigram fraction. High values
    * flag templated/spammy documents. The frequency mode per doc is the
    * distributed explode → (doc, term) count → per-doc max shape — two
    * shuffles keyed by doc_id, no per-doc quadratic lambda, so a 100 TB
    * corpus stays a pair of hash aggregations. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame =
    repetitionStatsOf(docs(spark, dir))

  def repetitionStatsOf(d: DataFrame): DataFrame = {
    // words materialized once; bigrams deliberately NOT distinct (these
    // are frequency signals — word_shingles' array_distinct would erase
    // exactly the repetition being measured)
    val base = d.select(col("doc_id"),
      expr(wordsExpr("text")).as("w"))
    val uni = base
      .select(col("doc_id"), size(col("w")).as("n_words"),
        explode(col("w")).as("t"))
      .groupBy("doc_id", "n_words", "t").agg(count(lit(1)).as("n"))
      .groupBy("doc_id", "n_words")
      .agg(count(lit(1)).cast("int").as("n_distinct"),
        max(col("n")).cast("int").as("top_word_n"))
    val bi = base
      .select(col("doc_id"), explode(expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) " +
          "ELSE array_repeat('', 0) END")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(max(col("n")).cast("int").as("top_bigram_n"))
    uni.join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        col("top_word_n"),
        coalesce(col("top_bigram_n"), lit(0)).as("top_bigram_n"),
        dround(col("n_distinct").cast("double") / col("n_words"), 6)
          .as("distinct_ratio"),
        dround(col("top_word_n").cast("double") / col("n_words"), 6)
          .as("top_word_frac"),
        dround(coalesce(col("top_bigram_n"), lit(0)).cast("double") /
          greatest(col("n_words") - 1, lit(1)), 6).as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Incremental dedup: which documents of an incoming batch (source =
    * `batchSource`) are NOVEL vs the existing corpus (every other source)
    * — the day-2 shape of dedup, where the corpus is already ingested and
    * only the delta is checked. Exact form: left-anti join on the bag
    * fingerprint — the corpus side is a one-column long projection, so at
    * 100 TB it broadcast-joins if the fingerprint set fits (or shuffles on
    * the 8-byte key, never the text); the standard pre-filter is a bloom
    * filter built over corpus fingerprints (false positives then re-checked
    * by this same anti-join, false negatives impossible). */
  val BatchSource = "src0"
  def novelDocs(spark: SparkSession, dir: String): DataFrame =
    novelDocsOf(docs(spark, dir), BatchSource)

  def novelDocsOf(d: DataFrame, batchSource: String): DataFrame = {
    val batch = d.filter(col("source") === batchSource)
      .select(col("doc_id"), bagFingerprint("text").as("fp"))
    val corpus = d.filter(col("source") =!= batchSource)
      .select(bagFingerprint("text").as("fp"))
    batch.join(corpus, Seq("fp"), "left_anti")
      .select("doc_id", "fp").orderBy("doc_id")
  }

  /** [[novelDocs]]'s documented 100 TB pre-filter, made real and
    * oracle-gated: build a bloom filter over the corpus fingerprints
    * (distributed treeAggregate, MB-scale sketch at the driver),
    * broadcast it, and let it split the batch — rows the bloom has never
    * seen are novel BY CONSTRUCTION (no false negatives) and skip the
    * join entirely; only the small might-contain slice (true dups +
    * ~fpp false positives) pays the exact anti-join. Same result as q57
    * (same oracle), different plan: at 100 TB the anti-join's probe side
    * shrinks from the whole batch to ~|dups| + fpp·|batch| rows. */
  def novelDocsBloom(spark: SparkSession, dir: String): DataFrame =
    novelDocsBloomOf(spark, docs(spark, dir), BatchSource)

  def novelDocsBloomOf(spark: SparkSession, d: DataFrame,
                       batchSource: String): DataFrame = {
    // both sides cached: corpus feeds sizing count + bloom build + the
    // anti-join, batch feeds both gate branches — one fingerprint
    // computation each, not three/two
    val corpus = d.filter(col("source") =!= batchSource)
      .select(bagFingerprint("text").as("fp"))
      .transform(graft.core.EngineCache.persisted)
    val bloom = corpus.stat.bloomFilter("fp",
      expectedNumItems = math.max(corpus.count(), 1L), fpp = 0.03)
    val bc = spark.sparkContext.broadcast(bloom)
    // boxed Long: a null fingerprint must NOT vanish into neither branch —
    // the exact anti-join keeps null-keyed rows (null never matches), so
    // the bloom path routes them to definitelyNovel for the same result
    val mightContain = udf((fp: java.lang.Long) =>
      fp != null && bc.value.mightContainLong(fp))
    val batch = d.filter(col("source") === batchSource)
      .select(col("doc_id"), bagFingerprint("text").as("fp"))
      .transform(graft.core.EngineCache.persisted)
    val definitelyNovel = batch.filter(!mightContain(col("fp")))
    val confirmedNovel = batch.filter(mightContain(col("fp")))
      .join(corpus, Seq("fp"), "left_anti")
      .select("doc_id", "fp")
    definitelyNovel.unionByName(confirmedNovel).orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q142
  /** Leakage-safe train/val/test split: q100 hashes DOCUMENTS into
    * splits, which leaks whenever two near-duplicates straddle the
    * boundary (the eval answer sits in the training set verbatim-ish —
    * the failure mode behind benchmark-contamination findings). This
    * split hashes the near-dup COMPONENT instead: LSH pairs (q35's
    * machinery) → connected components (q51's) → every doc not in any
    * pair is its own singleton component → split = hash(component) % 10
    * (8/1/1). Whole clusters land in one split BY CONSTRUCTION. The
    * oracle replays pairs + components through the recursive-CTE ground
    * truth and the identical hash arithmetic — hash-compared per doc. */
  def leakageSplit(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val comps = Dedup.connectedComponents(lshPairsAtRest(spark, dir))
      .withColumnRenamed("doc_id", "cid")
    d.select(col("doc_id"))
      .join(comps, col("doc_id") === col("cid"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .withColumn("b",
        xhash(concat(lit("split:"), col("component").cast("string"))) % 10)
      .select(col("doc_id"), col("component"),
        when(col("b") < 8, "train").when(col("b") === 8, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  def leakageSplitSql: String = {
    val pairs = Dedup.minhashLshPairsSql("documents", "doc_id", "text",
      WordShingleN, MinhashK, MinhashBands, MinhashTau, "id_a, id_b")
    s"""
    WITH RECURSIVE pairs AS ($pairs),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, label) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON r.id = e.src),
    comp AS (
      SELECT id AS doc_id, min(label) AS component
      FROM reach GROUP BY id),
    all_docs AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
    hashed AS (
      SELECT doc_id, component,
        ${xhashSql("'split:' || component::VARCHAR")} % 10 AS b
      FROM all_docs)
    SELECT doc_id, component,
      CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END
        AS split
    FROM hashed ORDER BY doc_id"""
  }

  // ---------------------------------------------------------------- q143
  /** Cross-source contamination matrix — which sources copy from which:
    * LSH near-dup pairs (q35's machinery) mapped to their sources and
    * rolled up per UNORDERED source pair, with each side's pair count
    * normalized by the smaller source's document count (an upper-bound
    * "mirror share": a feed that is a subset-mirror of another scores
    * near 1 even when the bigger side dwarfs it). O(|sources|²) output
    * at any corpus size; the expensive part is the pair generation the
    * dedup pipeline already runs. */
  def sourceContamination(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val pairs = lshPairsAtRest(spark, dir).select(col("id_a"), col("id_b"))
    val src = d.select(col("doc_id"), col("source"))
    val sized = d.groupBy(col("source")).agg(count(lit(1)).as("sn"))
    val m = pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("raw_a")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("raw_b")), "id_b")
      .select(least(col("raw_a"), col("raw_b")).as("source_a"),
        greatest(col("raw_a"), col("raw_b")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).cast("long").as("n_pairs"))
    m.join(sized.select(col("source").as("source_a"), col("sn").as("na")), "source_a")
      .join(sized.select(col("source").as("source_b"), col("sn").as("nb")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        dround(col("n_pairs").cast("double") / least(col("na"), col("nb")), 6)
          .as("mirror_share"))
      .orderBy("source_a", "source_b")
  }

  def sourceContaminationSql: String = {
    val pairs = Dedup.minhashLshPairsSql("documents", "doc_id", "text",
      WordShingleN, MinhashK, MinhashBands, MinhashTau, "id_a, id_b")
    s"""
    WITH pairs AS ($pairs),
    src AS (SELECT doc_id, source FROM documents),
    sized AS (SELECT source, CAST(count(1) AS BIGINT) AS sn
              FROM documents GROUP BY source),
    m AS (
      SELECT least(sa.source, sb.source) AS source_a,
        greatest(sa.source, sb.source) AS source_b,
        CAST(count(1) AS BIGINT) AS n_pairs
      FROM pairs p
      JOIN src sa ON sa.doc_id = p.id_a
      JOIN src sb ON sb.doc_id = p.id_b
      GROUP BY least(sa.source, sb.source), greatest(sa.source, sb.source))
    SELECT m.source_a, m.source_b, m.n_pairs,
      ${droundSql(
        "CAST(m.n_pairs AS DOUBLE) / least(za.sn, zb.sn)", 6)} AS mirror_share
    FROM m
    JOIN sized za ON za.source = m.source_a
    JOIN sized zb ON zb.source = m.source_b
    ORDER BY m.source_a, m.source_b"""
  }

  // ---------------------------------------------------------------- q141
  /** Bloom filters AT REST ([[graft.functions.BloomSketch]]) — the
    * membership leg of the sketch-at-rest story and the scale path q62
    * only gestures at: q62 rebuilds its filter from the corpus on every
    * run, while a real incremental pipeline builds per-shard blooms AT
    * INGEST, persists the BINARY bit arrays, and filters every later
    * batch from the stored sketches alone. Stage 1 writes per-shard
    * blooms of the corpus bag-fingerprints to parquet; stage 2 re-reads
    * ONLY the bloom table, `bloom_merge`s (bit-OR) into one filter, and
    * probes the incoming batch. Gates: exact duplicate flags
    * (hash-compared against the oracle's EXISTS) and the bloom contract
    * itself — a probe may only say "absent" when the key is truly
    * absent (no false negatives, structural: OR never clears a bit). */
  def bloomPersist(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BloomSketch.register(spark)
    val d = docs(spark, dir)
    graft.core.Warehouse.writeTable(
      d.filter(col("source") =!= BatchSource)
        .select(bagFingerprint("text").as("fp"))
        .withColumn("shard", (col("fp") % 8).cast("int"))
        .groupBy("shard").agg(expr("bloom_build(fp)").as("sk")),
      "bloom_fp_shards", "shard")
    val merged = graft.core.Warehouse.readTable(spark, "bloom_fp_shards")
      .agg(expr("bloom_merge(sk)").as("msk"))
    val corpusFp = d.filter(col("source") =!= BatchSource)
      .select(bagFingerprint("text").as("cfp")).distinct()
    d.filter(col("source") === BatchSource)
      .select(col("doc_id"), bagFingerprint("text").as("fp"))
      .crossJoin(broadcast(merged))
      .join(broadcast(corpusFp), col("fp") === col("cfp"), "left")
      .select(col("doc_id"),
        col("cfp").isNotNull.as("exact_dup"),
        (col("cfp").isNull || expr("bloom_contains(msk, fp)"))
          .as("no_false_negative"))
      .orderBy("doc_id")
  }

  def bloomPersistSql: String = s"""
    WITH b AS (
      SELECT doc_id, ${bagFingerprintSql("text")} AS fp
      FROM documents WHERE source = '$BatchSource'),
    c AS (
      SELECT DISTINCT ${bagFingerprintSql("text")} AS fp
      FROM documents WHERE source <> '$BatchSource')
    SELECT b.doc_id,
      EXISTS (SELECT 1 FROM c WHERE c.fp = b.fp) AS exact_dup,
      TRUE AS no_false_negative
    FROM b ORDER BY b.doc_id"""

  /** Benchmark decontamination: flag corpus documents sharing any
    * DecontamN-word shingle with a held-out eval source — the standard
    * "did training data leak the benchmark" check. The eval side's
    * distinct shingle set is tiny relative to the corpus, so the plan is
    * a broadcast semi-ish join: corpus shingles stream past the
    * broadcast eval set and only hits survive to the per-doc count. At
    * 100 TB: corpus side is explode → broadcast-hash-join → partial
    * count per doc — one scan, no corpus-side shuffle of text, and the
    * exchange carries only (doc_id, shingle-hit) rows. */
  val DecontamN = 4
  val EvalSource = "src19"
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val d = docs(spark, dir)
    def shingled(df: DataFrame) = df
      .selectExpr("doc_id", s"${wordsExpr("text")} AS w")
      .selectExpr("doc_id", s"word_shingles(w, $DecontamN) AS sh")
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val evalShingles = shingled(d.filter(col("source") === EvalSource))
      .select("s").distinct()
    shingled(d.filter(col("source") =!= EvalSource))
      .join(broadcast(evalShingles), "s")
      .groupBy("doc_id")
      .agg(countDistinct(col("s")).as("n_shared"))
      .orderBy("doc_id")
  }

  /** Text normalization — the canonical-form step before exact dedup:
    * lowercase, strip punctuation, collapse whitespace, trim; emits the
    * normalized text's fingerprint so normalized-dedup is one groupBy
    * away. Pure codegen'd string expressions over one scan. */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    val norm = "trim(regexp_replace(regexp_replace(lower(text), " +
      "'[\\\\p{Punct}]', ' '), '\\\\s+', ' '))"
    docs(spark, dir).select(
      col("doc_id"),
      expr(norm).as("norm_text"),
      expr(s"length($norm)").as("norm_len"),
      contentFingerprint(norm).as("norm_fp"))
      .orderBy("doc_id")
  }

  /** Greedy sequence packing into fixed-capacity token bins per
    * (lang, doc_id % PackShards) group — see [[graft.llm.Packing]]. */
  val PackCapacity = 256
  val PackShards = 4
  def packDocs(spark: SparkSession, dir: String): DataFrame =
    Packing.packGreedy(docs(spark, dir), "doc_id", "text", "lang",
      PackCapacity, PackShards)
      .orderBy("lang", "shard", "doc_id")

  /** Token-count deciles per language (ntile) — the corpus length profile
    * that picks packing capacity and truncation cutoffs. */
  def tokenDeciles(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_tokens"), col("doc_id"))
    docs(spark, dir)
      .select(col("doc_id"), col("lang"), tokenCount("text").as("n_tokens"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy("lang", "decile")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy("lang", "decile")
  }

  /** Deterministic mixture resampling: each language carries a target
    * weight; a doc is emitted floor(w) times plus one more iff its hash
    * gate lands under the fractional part — exact up/down-sampling with
    * no RNG state, reproducible on any partitioning (same hash-gate idea
    * as q49). Weights < 1 DOWN-sample (docs with 0 repeats vanish at the
    * explode); weights > 1 UP-sample (explode materializes the epochs).
    * One scan → codegen'd repeat computation → Generate; no shuffle at
    * all until a downstream consumer asks for one. */
  val MixWeights: Seq[(String, Double)] = Seq(
    "de" -> 2.5, "en" -> 0.5, "es" -> 1.5, "fr" -> 1.0, "zh" -> 2.0)
  /** (base copies, percent chance of one extra) per language — the
    * integer decomposition of MixWeights, shared with the oracle. */
  private def mixParts: Seq[(String, Int, Int)] = MixWeights.map { case (l, w) =>
    (l, math.floor(w).toInt, math.round((w - math.floor(w)) * 100).toInt)
  }
  def mixtureUpsample(spark: SparkSession, dir: String): DataFrame = {
    val gate =
      s"${xhashExpr("concat('mix:', CAST(doc_id AS STRING))")} % 100"
    val nRepeats = mixParts.map { case (l, base, fracPct) =>
      s"WHEN '$l' THEN $base + IF($gate < $fracPct, 1, 0)"
    }.mkString("CASE lang ", " ", " ELSE 1 END")
    docs(spark, dir)
      .selectExpr("doc_id", "lang", s"CAST($nRepeats AS INT) AS n_repeats")
      .selectExpr("doc_id", "lang", "n_repeats",
        "explode(CASE WHEN n_repeats >= 1 THEN sequence(1, n_repeats) " +
          "ELSE array_repeat(0, 0) END) AS copy_idx")
      .orderBy("doc_id", "copy_idx")
  }

  /** Corpus-wide term statistics: total term frequency + document
    * frequency, top `TermTopK` by frequency — the stopword/vocab
    * induction scan. Explode → two-level agg (map-side partials crush
    * each partition to its vocab before the shuffle) → top-k via
    * orderBy+limit (TakeOrderedAndProject, no global sort). */
  val TermTopK = 50
  def termStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(words("text")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("term"))
      .limit(TermTopK)

  /** Sliding-window document chunking: split each document's token stream
    * into `ChunkTokens`-token chunks advancing by `ChunkStride` (so
    * consecutive chunks overlap by ChunkTokens − ChunkStride tokens) — the
    * context-window preparation step before packing/training. Start
    * positions are computed, not discovered: k = ⌈(n − C)/S⌉ extra chunks
    * beyond the first, so the generator explodes an integer sequence and
    * `slice` does the rest — pure codegen'd expressions, one scan, no
    * shuffle; each chunk carries its fingerprint for chunk-level dedup. */
  val ChunkTokens = 64
  val ChunkStride = 48
  private def docChunksCore(spark: SparkSession, dir: String): DataFrame = {
    val sliceE = s"slice(w, chunk_id * $ChunkStride + 1, $ChunkTokens)"
    docs(spark, dir)
      .select(col("doc_id"), expr(wordsExpr("text")).as("w"))
      .withColumn("n_words", size(col("w")))
      .withColumn("k", expr("greatest(0, CAST(floor((n_words - " +
        s"$ChunkTokens + $ChunkStride - 1) / $ChunkStride) AS INT))"))
      .withColumn("chunk_id", explode(expr("sequence(0, k)")))
      .select(col("doc_id"), col("chunk_id"),
        expr(s"size($sliceE)").as("n_tokens"),
        expr(xhashExpr(s"array_join($sliceE, ' ')")).as("chunk_fp"))
  }
  def docChunks(spark: SparkSession, dir: String): DataFrame =
    docChunksCore(spark, dir).orderBy("doc_id", "chunk_id")

  /** Chunk-containment near-dup detection: doc A is (partially) contained
    * in doc B when ≥ `ContainTau` of A's distinct chunk fingerprints also
    * appear in B — the asymmetric complement of whole-doc dedup that
    * catches quote-inclusion and prefix/suffix copies. Candidates come
    * from an equi-join on chunk_fp (never all-pairs); "stop chunks"
    * appearing in more than `StopChunkDf` docs are dropped before the
    * join — the boilerplate-chunk guard that bounds every fingerprint's
    * bucket, so the join's worst key fans out ≤ StopChunkDf² even on 100 TB
    * (the same reason AQE skew-split stays idle here). The chunk frame is
    * computed once and persisted: the a-side, b-side, and size frames all
    * reuse it. Containment = shared/|A| on exact ints, division identical
    * cross-engine. */
  val ContainTau = 0.5
  val StopChunkDf = 50
  def chunkContainment(spark: SparkSession, dir: String): DataFrame = {
    val fps = docChunksCore(spark, dir)
      .select(col("doc_id"), col("chunk_fp")).distinct()
      .transform(graft.core.EngineCache.persisted)
    val keep = fps.groupBy("chunk_fp")
      .agg(count(lit(1)).as("cdf")).filter(col("cdf") <= StopChunkDf)
      .select("chunk_fp")
    val kept = fps.join(keep, "chunk_fp")
    val sizes = fps.groupBy("doc_id").agg(count(lit(1)).as("n_chunks_a"))
    kept.select(col("doc_id").as("doc_a"), col("chunk_fp"))
      .join(kept.select(col("doc_id").as("doc_b"), col("chunk_fp")), "chunk_fp")
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .withColumn("containment",
        col("shared").cast("double") / col("n_chunks_a"))
      .filter(col("containment") >= ContainTau)
      .select("doc_a", "doc_b", "shared", "n_chunks_a", "containment")
      .orderBy("doc_a", "doc_b")
  }

  /** Token-rarity profile per document: mean corpus document-frequency of
    * the doc's token instances and the count/ratio of "rare" instances
    * (corpus df ≤ `RareDf`) — the unigram-LM-flavored quality signal
    * (low mean-df ≈ high surprisal) computed with integer-exact
    * arithmetic: one explode feeds both the df aggregation and the
    * per-doc rollup, the vocabulary-sized df frame joins back on term,
    * and only the final mean/ratio divisions touch floating point
    * (identical-double ops, dround'd). At 100 TB the exchange carries
    * (doc_id, term) pairs; the df frame is |vocab| rows. */
  val RareDf = 200
  def docRarity(spark: SparkSession, dir: String): DataFrame = {
    val terms = docs(spark, dir)
      .select(col("doc_id"), explode(words("text")).as("term"))
    val df = terms.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
    terms.join(df, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("df")).as("sum_df"),
        sum(when(col("df") <= RareDf, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_tokens"), col("n_rare"),
        dround(col("sum_df").cast("double") / col("n_tokens"), 4).as("mean_df"),
        dround(col("n_rare").cast("double") / col("n_tokens"), 6).as("rare_ratio"))
      .orderBy("doc_id")
  }

  // PII patterns — RE2/Java-regex common subset (no lookaround), spelled
  // once; Spark SQL needs the backslashes doubled inside its string
  // literal, DuckDB takes them raw.
  val PiiEmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PiiIpRe = """\b\d{1,3}(\.\d{1,3}){3}\b"""
  val PiiNumRe = """\d{4,}"""
  private def sparkRe(re: String): String = re.replace("\\", "\\\\")

  /** PII redaction: scrub emails → `<EMAIL>`, IPv4 → `<IP>`, long digit
    * runs → `<NUM>`, counting each hit — the compliance pass every
    * training corpus runs before packing. Pure regexp_replace/
    * regexp_count column expressions: codegen'd, one scan, no shuffle at
    * any scale. The fixture text is wordlist-synthetic with no PII, so
    * the query enriches it with deterministic doc_id-derived contact
    * lines first (mirrored in the oracle) — the redactor then has real
    * work on every row; PiiSpec plants free-form PII besides. Replacement
    * order (email → ip → num) is part of the contract: an email's local
    * digits must not be half-eaten by the NUM pass first. */
  /** Spark SQL expression scrubbing PII from `src` (email → ip → num). */
  def redactPiiExpr(src: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($src, " +
      s"'${sparkRe(PiiEmailRe)}', '<EMAIL>'), " +
      s"'${sparkRe(PiiIpRe)}', '<IP>'), '${sparkRe(PiiNumRe)}', '<NUM>')"

  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val enriched = "concat(text, ' contact user', CAST(doc_id AS STRING), " +
      "'@example.com from 10.0.', CAST(doc_id % 256 AS STRING), '.77 ref ', " +
      "CAST(100000 + doc_id AS STRING))"
    docs(spark, dir).select(
      col("doc_id"),
      expr(s"regexp_count($enriched, '${sparkRe(PiiEmailRe)}')").as("n_emails"),
      expr(s"regexp_count($enriched, '${sparkRe(PiiIpRe)}')").as("n_ips"),
      expr(s"regexp_count($enriched, '${sparkRe(PiiNumRe)}')").as("n_nums"),
      expr(redactPiiExpr(enriched)).as("redacted"))
      .orderBy("doc_id")
  }

  /** Per-document top-`TfidfTopK` terms by smoothed TF-IDF
    * (tf · ln((N+1)/(df+1))) — keyword extraction / relevance weighting
    * over the corpus vocabulary. Plan: the explode runs once per
    * consumer inside whole-stage codegen (per-doc tf, per-term df, both
    * map-side partials) — deliberately NOT persisted: caching the
    * ~1-row-per-token intermediate was measured slower than recomputing
    * the codegen'd split (same trade as q101; at a corpus scale where
    * the doubled scan dominates, persist `terms`). The df frame joins
    * back on term (vocab-sized, not corpus-sized), the 1-row doc count
    * broadcasts, and the final top-k is a keyed window. At 100 TB
    * nothing but (doc_id, term) pairs ever shuffles. */
  val TfidfTopK = 3
  def tfidfTerms(spark: SparkSession, dir: String): DataFrame = {
    val terms = docs(spark, dir)
      .select(col("doc_id"), explode(words("text")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val n = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", dround(
        col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TfidfTopK)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
        col("tfidf"))
      .orderBy("doc_id", "rk")
  }

  // ---------------------------------------------------------------- q144
  /** The MinHash-LSH pair table AT REST — the "persist, don't recompute"
    * move for the whole dedup family (mirror of q141's bloom-at-rest):
    * the signature/banding/Jaccard pipeline runs ONCE per corpus and
    * lands in the warehouse (`shard = id_a % 8` Hive layout); every
    * downstream consumer — components (q51/q76), corpus survivorship
    * (q74), leakage split (q142), contamination matrix (q143) — joins
    * the stored pairs instead of re-shingling the corpus. At 100 TB the
    * pair generation is the expensive leg of the dedup pipeline; a
    * production run amortizes it across every analysis that rides it
    * (PlanSpec asserts the downstream plans are shingle-free). */
  def lshPairsAtRest(spark: SparkSession, dir: String): DataFrame = {
    val table = "lsh_pairs_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
    graft.core.Warehouse.tableOnce(spark, table, "shard") {
      Dedup.minhashLshPairs(docs(spark, dir), "doc_id", "text",
        WordShingleN, MinhashK, MinhashBands, MinhashTau)
        .withColumn("shard", (col("id_a") % 8).cast("int"))
    }.select(col("id_a"), col("id_b"), col("jaccard"))
  }

  def lshPairTable(spark: SparkSession, dir: String): DataFrame =
    lshPairsAtRest(spark, dir).orderBy("id_a", "id_b")

  // ---------------------------------------------------------------- q192
  /** Dedup-threshold sensitivity sweep — the tuning curve that picks τ
    * before anyone commits to a near-dup pass: for each candidate
    * threshold ≥ the banded floor, the surviving pair count and the
    * number of distinct docs those pairs touch, read from the q144
    * at-rest pair table in ONE scan (the exact Jaccard is stored, so
    * raising τ is a filter, not a recompute — lowering it below the
    * LSH floor is the only case that needs a rebuild). Six rows out;
    * thresholds compare against hash-proven-identical doubles, so the
    * boundary pairs cannot split across engines. */
  val TauSweep: Seq[String] =
    Seq("0.5", "0.6", "0.7", "0.8", "0.9", "1.0")

  def dedupTauSweep(spark: SparkSession, dir: String): DataFrame = {
    val pv = s"graft_tausweep_pairs_t${Thread.currentThread().getId}"
    lshPairsAtRest(spark, dir).createOrReplaceTempView(pv)
    spark.sql(s"""
      WITH t AS (SELECT explode(array(${TauSweep.mkString(", ")})) AS tau),
      s AS (SELECT t.tau, p.id_a, p.id_b
            FROM $pv p JOIN t ON p.jaccard >= t.tau),
      np AS (SELECT tau, CAST(count(1) AS BIGINT) AS n_pairs
             FROM s GROUP BY tau),
      ids AS (SELECT tau, id_a AS id FROM s
              UNION SELECT tau, id_b FROM s),
      nd AS (SELECT tau, CAST(count(1) AS BIGINT) AS n_docs
             FROM ids GROUP BY tau)
      SELECT t.tau,
        coalesce(np.n_pairs, 0) AS n_pairs,
        coalesce(nd.n_docs, 0) AS n_docs
      FROM t LEFT JOIN np ON t.tau = np.tau
      LEFT JOIN nd ON t.tau = nd.tau
      ORDER BY t.tau""")
  }

  def dedupTauSweepSql: String = {
    val pairsSql = Dedup.minhashLshPairsSql("documents", "doc_id", "text",
      WordShingleN, MinhashK, MinhashBands, MinhashTau, "id_a, id_b")
    s"""
      WITH p AS ($pairsSql),
      t AS (SELECT unnest([${TauSweep.mkString(", ")}]) AS tau),
      s AS (SELECT t.tau, p.id_a, p.id_b
            FROM p JOIN t ON p.jaccard >= t.tau),
      np AS (SELECT tau, CAST(count(*) AS BIGINT) AS n_pairs
             FROM s GROUP BY tau),
      ids AS (SELECT tau, id_a AS id FROM s
              UNION SELECT tau, id_b FROM s),
      nd AS (SELECT tau, CAST(count(*) AS BIGINT) AS n_docs
             FROM ids GROUP BY tau)
      SELECT t.tau,
        coalesce(np.n_pairs, 0) AS n_pairs,
        coalesce(nd.n_docs, 0) AS n_docs
      FROM t LEFT JOIN np ON t.tau = np.tau
      LEFT JOIN nd ON t.tau = nd.tau
      ORDER BY t.tau"""
  }

  // ---------------------------------------------------------------- q145
  /** Incremental near-dedup against SIGNATURES at rest — the daily-batch
    * production path: the corpus (source ≠ '[[BatchSource]]') is
    * represented only by its persisted (id, hs, sig) signature table
    * (built once, warehouse shard=N layout); the incoming batch
    * (source = '[[BatchSource]]') is the only text that gets shingled.
    * Banded join batch-vs-stored, exact Jaccard from the stored shingle
    * hash sets, threshold — the same contract as q35 restricted to
    * cross-side pairs. The oracle replays BOTH sides from raw text, so
    * the hash match proves the at-rest signature frame is lossless. At
    * 100 TB this is the difference between re-signing a corpus per batch
    * and an O(batch) increment. */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val sigTable = "lsh_sig_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
    val corpusSig = graft.core.Warehouse.tableOnce(spark, sigTable, "shard") {
      Dedup.signatureFrame(d.filter(col("source") =!= BatchSource),
        "doc_id", "text", WordShingleN, MinhashK)
        .withColumn("shard", (col("id") % 8).cast("int"))
    }.select("id", "hs", "sig")
    val batchSig = Dedup.signatureFrame(
      d.filter(col("source") === BatchSource),
      "doc_id", "text", WordShingleN, MinhashK)
    Dedup.incrementalLshPairs(corpusSig, batchSig,
      MinhashK, MinhashBands, MinhashTau)
      .orderBy("batch_id", "corpus_id")
  }

  /** End-to-end dedup: the surviving corpus after exact dedup (keep the
    * min doc_id per bag fingerprint) AND near-dedup (keep only each
    * MinHash-LSH connected component's min-id representative) — the final
    * artifact every dedup stage upstream exists to produce. Rule: a doc
    * survives iff it wins its exact-fp group and is either untouched by
    * the near-dup graph or is its component's representative. Pairs come
    * from the q144 at-rest table, not a fresh shingling pass. */
  def dedupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val exactKeep = d.select(col("doc_id"), bagFingerprint("text").as("fp"))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
    val comp = Dedup.connectedComponents(lshPairsAtRest(spark, dir))
    exactKeep.join(comp, Seq("doc_id"), "left")
      .filter(col("component").isNull || col("component") === col("doc_id"))
      .select(col("doc_id"), col("fp"))
      .orderBy("doc_id")
  }

  /** Pairwise near-dup hits → dedup clusters: connected components over
    * the q144 at-rest MinHash-LSH pair table (same parameters as q35). */
  def dedupComponents(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(lshPairsAtRest(spark, dir))
      .orderBy("doc_id")

  /** Same clusters via alternating large-star/small-star contraction —
    * the high-diameter scale path (chains/link-farms where label
    * propagation needs O(diameter) rounds). Same oracle as q51: both
    * algorithms must land on identical components. */
  def dedupComponentsStar(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponentsStar(lshPairsAtRest(spark, dir))
      .orderBy("doc_id")

  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(embs(spark, dir), "label", EmbTau)
      .orderBy("id_a", "id_b")

  /** Hyperplane-LSH candidates ranked by exact cosine — the cell-free
    * near-dup path (top-k form: this fixture has no global near-dups, so
    * a threshold query would be empty; DedupSpec covers the thresholded
    * form with planted near-identical vectors). */
  def embedSrpPairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.srpTopPairs(embs(spark, dir), SrpBits, SrpBands, SrpTopK)

  def annBruteForce(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(embs(spark, dir), col("vec_id") < 20, BruteK)
      .orderBy("query_id", "rnk")

  // ---------------------------------------------------------------- q147
  /** Metadata-filtered ANN ([[Similarity.filteredTopK]]): candidates are
    * restricted by a predicate BEFORE scoring, so the corpus scan reads
    * only qualifying rows (pushdown) and every query still gets a full
    * k — post-filtering a top-k can come up short when the filter bites.
    * The even-label predicate here stands in for the tenant / language /
    * license filters of a production retrieval stack. */
  val FilteredCandWhere = "label % 2 = 0"
  def annFiltered(spark: SparkSession, dir: String): DataFrame =
    Similarity.filteredTopK(embs(spark, dir), col("vec_id") < 10,
      FilteredCandWhere, BruteK)
      .orderBy("query_id", "rnk")

  // ---------------------------------------------------------------- q158
  /** Hard-negative mining ([[Similarity.hardNegatives]]): per anchor,
    * the k most-similar vectors with a DIFFERENT label — the pairs a
    * contrastive objective learns most from. The negativity predicate
    * is per-pair (anchor.label ≠ candidate.label), i.e. it lives in the
    * join, where q147's tenant filter was a static scan predicate. */
  def hardNegativeMining(spark: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(embs(spark, dir), col("vec_id") < 10, BruteK)
      .orderBy("query_id", "rnk")

  /** The q74 surviving-corpus oracle's CTE chain ending in `surv` —
    * shared verbatim with the q160 impact report. */
  private def dedupSurvivorsOracleCtes: String = {
    val pairsSql = Dedup.minhashLshPairsSql("documents", "doc_id", "text",
      WordShingleN, MinhashK, MinhashBands, MinhashTau, "id_a, id_b")
    s"""
      WITH RECURSIVE pairs AS ($pairsSql),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
      reach(id, label) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON r.id = e.src),
      comp AS (SELECT id AS doc_id, min(label) AS component
        FROM reach GROUP BY id),
      fps AS (SELECT doc_id, ${bagFingerprintSql("text")} AS fp
        FROM documents),
      keepx AS (SELECT fp, min(doc_id) AS doc_id FROM fps GROUP BY fp),
      surv AS (
        SELECT k.doc_id, k.fp
        FROM keepx k LEFT JOIN comp c ON k.doc_id = c.doc_id
        WHERE c.doc_id IS NULL OR c.component = k.doc_id)"""
  }

  // ---------------------------------------------------------------- q161
  /** Temperature-sampling mixture plan (α = 0.5): per source, the
    * sampling weight ∝ tokens^α that flattens the source distribution —
    * the standard multi-source/multilingual mixing rule (small sources
    * up-weighted relative to their size, dominant sources damped) —
    * turned into an executable plan: normalized weight, the token
    * allocation out of a [[MixtureTokenBudget]]-token budget, and the
    * implied epochs over each source (epochs > 1 = upsampling, which
    * q66's hash-gated resampler then executes). Determinism: sqrt runs
    * on exact integer token counts and is floor-bridged to a 1e6 grid,
    * so the normalizing sum is an exact BIGINT and the allocation is
    * pure integer arithmetic. O(|sources|) everything. */
  val MixtureTokenBudget = 1000000L
  private def mixturePlanSql(tokExpr: String, intDiv: String): String = s"""
      WITH t AS (
        SELECT source, CAST(sum($tokExpr) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
      s AS (
        SELECT source, n_tokens,
          CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
            AS sw
        FROM t),
      tot AS (SELECT CAST(sum(sw) AS BIGINT) AS tw FROM s)
      SELECT source, n_tokens,
        ${droundSql("CAST(sw AS DOUBLE) / CAST(tw AS DOUBLE)", 6)} AS weight,
        CAST(($MixtureTokenBudget * sw) $intDiv tw AS BIGINT) AS alloc_tokens,
        ${droundSql(
          s"CAST(($MixtureTokenBudget * sw) $intDiv tw AS DOUBLE) / " +
            "CAST(n_tokens AS DOUBLE)", 6)} AS epochs
      FROM s CROSS JOIN tot
      ORDER BY source"""

  def mixturePlan(spark: SparkSession, dir: String): DataFrame = {
    docs(spark, dir).createOrReplaceTempView("documents")
    spark.sql(mixturePlanSql(s"size(${wordsExpr("text")})", "DIV"))
  }

  def mixturePlanOracleSql: String =
    mixturePlanSql(tokenCountSql("text"), "//")

  // ---------------------------------------------------------------- q176
  /** Source-pair shingle-Jaccard matrix via BOTTOM-K (KMV) sketches —
    * the fourth mergeable-sketch family (beside HLL/DDSketch/CMS/Bloom):
    * each source's distinct 3-word-shingle set reduces to its K
    * smallest 60-bit hashes — a [[KmvK]]-row sketch a billion-shingle
    * source still fits in — built with the bounded TopKAgg (map-side
    * partials, never a per-source window sort). The pairwise estimate
    * is the classic KMV form: merge two sketches, keep the union's K
    * smallest, and the fraction present in BOTH estimates J(A,B). The
    * |sources|²·2K pair stage is dimension-sized at any corpus scale.
    * Unlike q143 (doc-pair contamination via LSH), this reads
    * set-overlap at the SOURCE level — mirror detection when the docs
    * themselves differ but the vocabulary is shared. Deterministic end
    * to end (integer hashes, integer counts, one final divide). */
  val KmvK = 128

  private def kmvPairTailSql(sk: String): String = s"""
      srcs AS (SELECT DISTINCT source FROM $sk),
      prs AS (
        SELECT a.source AS sa, b.source AS sb
        FROM srcs a JOIN srcs b ON a.source < b.source),
      uni AS (
        SELECT sa, sb, h,
          max(ina) AS ina, max(inb) AS inb
        FROM (
          SELECT p.sa, p.sb, k.h, 1 AS ina, 0 AS inb
          FROM prs p JOIN $sk k ON k.source = p.sa
          UNION ALL
          SELECT p.sa, p.sb, k.h, 0 AS ina, 1 AS inb
          FROM prs p JOIN $sk k ON k.source = p.sb) z
        GROUP BY sa, sb, h),
      rr AS (
        SELECT sa, sb, ina, inb,
          row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn,
          count(1) OVER (PARTITION BY sa, sb) AS nu
        FROM uni)
      SELECT sa AS source_a, sb AS source_b,
        ${droundSql(
          s"CAST(sum(CASE WHEN rn <= $KmvK AND ina = 1 AND inb = 1 " +
            "THEN 1 ELSE 0 END) AS DOUBLE) / " +
            s"CAST(least($KmvK, max(nu)) AS DOUBLE)", 6)} AS est_jaccard
      FROM rr GROUP BY sa, sb ORDER BY sa, sb"""

  def sourceJaccard(spark: SparkSession, dir: String): DataFrame =
    sourceJaccardOf(docs(spark, dir))

  def sourceJaccardOf(docsDf: DataFrame): DataFrame = {
    val spark = docsDf.sparkSession
    // materialize words BEFORE shingling: the inlined form re-runs the
    // regex split once per element inside the interpreted lambda
    // (TextFunctions.wordShinglesFromArrayExpr's documented hot-path rule)
    val sh = docsDf
      .select(col("source"), expr(wordsExpr("text")).as("w"))
      .select(col("source"), explode(expr(
        TextFunctions.wordShinglesFromArrayExpr("w", WordShingleN))).as("s"))
      .select(col("source"),
        graft.core.Determinism.xhash(concat(lit("kmv:"), col("s"))).as("h"))
      .distinct()
    // persisted: the pair stage's UNION ALL consumes the sketch twice
    // (A-side and B-side) — without the persist the whole shingling +
    // distinct + top-K pipeline runs once per branch
    val sk = sh.groupBy("source")
      .agg(graft.functions.VectorAggregates
        .topKOf(KmvK, -col("h").cast("double"), col("h")).as("top"))
      .select(col("source"), explode(col("top.cand_id")).as("h"))
      .transform(graft.core.EngineCache.persisted)
    val v = s"graft_kmv_sk_t${Thread.currentThread().getId}"
    sk.createOrReplaceTempView(v)
    spark.sql(s"WITH ${kmvPairTailSql(v)}")
  }

  def sourceJaccardSql: String = s"""
      WITH sh AS (
        SELECT DISTINCT source,
          ${xhashSql(s"'kmv:' || s")} AS h
        FROM (SELECT source, unnest(${wordShinglesSql("text", WordShingleN)})
                AS s FROM documents) z),
      sk AS (
        SELECT source, h FROM (
          SELECT source, h,
            row_number() OVER (PARTITION BY source ORDER BY h) AS krn
          FROM sh) zz WHERE krn <= $KmvK),
      ${kmvPairTailSql("sk")}"""

  // ---------------------------------------------------------------- q173
  /** First-round BPE merge-candidate table — the opening move of
    * tokenizer training (Sennrich et al.: count adjacent symbol pairs,
    * merge the most frequent): every adjacent CHARACTER pair inside
    * every pre-token (q138's GPT-2-style pre-tokenizer regex, so pairs
    * never cross a letter/digit/punct boundary), counted corpus-wide,
    * top-[[BpeMergeTopK]] by (count DESC, pair) — the exact table the
    * first merge round consumes, and the readout that sizes a vocab
    * budget. One codegen'd projection (regex → nested transform →
    * flatten) + one hash agg + a TakeOrdered top-k; the shuffle carries
    * (2-char pair, partial count) rows only. Full BPE iterates this
    * with re-segmentation — rounds beyond the first change the SYMBOL
    * table, not the plan shape. */
  val BpeMergeTopK = 20
  // The punct alternative EXCLUDES control chars (\x00-\x1f): chr(31)
  // is the multi-symbol segmentation separator downstream (q182/q183),
  // and a chr(31) surviving as a piece would corrupt the split — the
  // separator invariant is enforced by the pre-tokenizer itself, not by
  // an assumption about the corpus (PackingSpec proves it on a document
  // that embeds chr(31) directly).
  private val BpePieceRegexSpark =
    "'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s\\\\x00-\\\\x1f]'"
  private val BpePieceRegexDuck =
    "'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s\\x00-\\x1f]'"

  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    docs(spark, dir).createOrReplaceTempView("documents")
    spark.sql(s"""
      WITH pieces AS (
        SELECT explode(regexp_extract_all(text, $BpePieceRegexSpark, 0)) AS p
        FROM documents),
      pairs AS (
        SELECT explode(CASE WHEN length(p) >= 2
          THEN transform(sequence(1, length(p) - 1), i -> substr(p, i, 2))
          ELSE array_repeat('', 0) END) AS pair
        FROM pieces),
      cnt AS (
        SELECT pair, CAST(count(1) AS BIGINT) AS cnt
        FROM pairs GROUP BY pair),
      top AS (
        SELECT pair, cnt FROM cnt
        ORDER BY cnt DESC, pair LIMIT $BpeMergeTopK)
      SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT)
          AS rank,
        pair, cnt
      FROM top ORDER BY rank""")
  }

  def bpeMergesSql: String = s"""
      WITH pieces AS (
        SELECT unnest(regexp_extract_all(text, $BpePieceRegexDuck)) AS p
        FROM documents),
      pairs AS (
        SELECT unnest(list_transform(range(1, length(p)), i ->
          substr(p, i, 2))) AS pair
        FROM pieces),
      cnt AS (
        SELECT pair, CAST(count(*) AS BIGINT) AS cnt
        FROM pairs GROUP BY pair),
      top AS (
        SELECT pair, cnt FROM cnt
        ORDER BY cnt DESC, pair LIMIT $BpeMergeTopK)
      SELECT (row_number() OVER (ORDER BY cnt DESC, pair))::INT AS rank,
        pair, cnt
      FROM top ORDER BY rank"""

  // ---------------------------------------------------------------- q182
  /** Multi-round BPE tokenizer TRAINING — the full Sennrich loop q173
    * only opens: [[BpeRounds]] rounds of (count adjacent symbol pairs,
    * merge the most frequent everywhere, recount). Runs on the
    * VOCABULARY, not the corpus — Sennrich's own compression: one scan
    * reduces the corpus to (distinct pre-token segmentation, freq),
    * and every round after that touches only that vocab frame, so at
    * 100 TB the trainer's per-round cost is O(unique words), never
    * O(tokens). The winning pair is a 1-row collect (the PQ-codebook
    * driver barrier) re-embedded as literals, so plan depth stays
    * constant in rounds; applying a merge is a greedy left-to-right
    * fold over each segmentation — acc carries the merged prefix, a
    * symbol merges only when the accumulator's LAST symbol is exactly
    * the pair's left and it was not itself just consumed, which is
    * precisely non-overlapping BPE ("a a a a" → "aa aa", not "aa a a")
    * — expressed as the same `split_part`-on-accumulator fold in both
    * engines (Spark `aggregate`, DuckDB `list_reduce`), so the oracle
    * replays every round bit-identically, merge selection included.
    * Segmentations are chr(31)-joined symbol strings: pairs never
    * cross q138's pre-token boundaries, pre-tokens are letter/digit
    * runs or single punct chars, so the separator cannot occur inside
    * a symbol. Output: the merge table itself — rank, the pair, the
    * merged symbol, and its corpus pair-frequency at selection time —
    * the artifact a tokenizer ships. */
  val BpeRounds = 5
  private def bpeStepSql(x: String, y: String): String = s"""
    CASE WHEN split_part(acc, chr(31), -1) = $x AND e = $y
         THEN substr(acc, 1,
                length(acc) - length(split_part(acc, chr(31), -1))) || $x || $y
         ELSE acc || chr(31) || e END"""

  /** (x, y, cnt) of the most frequent adjacent pair over `vocab`
    * (Spark dialect; freq-weighted, ties broken by pair). */
  private def bpePairTopSql(vocab: String): String = s"""
      SELECT x, y, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        SELECT element_at(arr, i) AS x, element_at(arr, i + 1) AS y, freq
        FROM (SELECT arr, freq, explode(sequence(1, size(arr) - 1)) AS i
              FROM (SELECT split(seq, chr(31)) AS arr, freq FROM $vocab) z
              WHERE size(arr) >= 2) zz)
      GROUP BY x, y ORDER BY cnt DESC, x, y LIMIT 1"""

  def bpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeTrainOf(docs(spark, dir))

  def bpeTrainOf(docsF: DataFrame): DataFrame = {
    val (spark, merges, _) = bpeTrainCore(docsF)
    def lit(s: String): String = "'" + s.replace("'", "''") + "'"
    val rows = merges.map { case (k, x, y, c) =>
      s"(CAST($k AS INT), ${lit(x)}, ${lit(y)}, ${lit(x + y)}, " +
        s"CAST($c AS BIGINT))"
    }
    // a corpus with no mergeable pair at all (every piece a single
    // character) yields zero merges; `FROM VALUES` with no rows is a
    // syntax error, so return the empty merge table explicitly
    if (rows.isEmpty)
      spark.sql("""
        SELECT CAST(NULL AS INT) AS rank, '' AS lhs, '' AS rhs,
          '' AS merged, CAST(NULL AS BIGINT) AS pair_cnt
        WHERE false""")
    else spark.sql(s"""
      SELECT rank, lhs, rhs, merged, pair_cnt
      FROM VALUES ${rows.mkString(",")}
        AS t(rank, lhs, rhs, merged, pair_cnt)
      ORDER BY rank""")
  }

  /** Run the trainer; returns (session, merge list, FINAL vocab view) —
    * the vocab view holds each pre-token's fully-merged segmentation,
    * the artifact [[bpeTokenize]] serves token counts from. */
  private def bpeTrainCore(docsF: DataFrame)
      : (SparkSession, Seq[(Int, String, String, Long)], String) = {
    val spark = docsF.sparkSession
    val tid = Thread.currentThread().getId
    val dv = s"graft_bpe_docs_t$tid"
    docsF.createOrReplaceTempView(dv)
    def lit(s: String): String = "'" + s.replace("'", "''") + "'"
    var vocab = s"graft_bpe_vocab0_t$tid"
    spark.sql(s"""
      SELECT seq, CAST(count(1) AS BIGINT) AS freq FROM (
        SELECT array_join(transform(sequence(1, length(p)),
          i -> substr(p, i, 1)), chr(31)) AS seq
        FROM (SELECT explode(regexp_extract_all(text,
          $BpePieceRegexSpark, 0)) AS p FROM $dv) z) zz
      GROUP BY seq""")
      .transform(graft.core.EngineCache.persisted)
      .createOrReplaceTempView(vocab)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var t = 1
    var exhausted = false
    while (t <= BpeRounds && !exhausted) {
      // a corpus can run dry before BpeRounds (every piece fully
      // merged); the merge table just ends early then
      spark.sql(bpePairTopSql(vocab)).collect().headOption match {
        case None => exhausted = true
        case Some(r) =>
          merges += ((t, r.getString(0), r.getString(1), r.getLong(2)))
          val next = s"graft_bpe_vocab${t}_t$tid"
          // injective on seq (same text ⇒ same merge history), no regroup
          spark.sql(s"""
            SELECT aggregate(slice(arr, 2, size(arr) - 1),
                element_at(arr, 1),
                (acc, e) -> ${bpeStepSql(lit(r.getString(0)),
                  lit(r.getString(1)))})
              AS seq, freq
            FROM (SELECT split(seq, chr(31)) AS arr, freq FROM $vocab) z""")
            .transform(graft.core.EngineCache.persisted)
            .createOrReplaceTempView(next)
          vocab = next
      }
      t += 1
    }
    (spark, merges.result(), vocab)
  }

  // ---------------------------------------------------------------- q183
  /** BPE tokenization with the learned merges — the apply half that
    * makes q182 end-to-end: per document, the token count under the
    * trained vocabulary (plus piece and pre-merge symbol counts, so
    * the row reads as a compression report: chars → merged tokens).
    * The corpus is NOT re-folded per occurrence: the trainer's final
    * vocab frame already holds every pre-token's fully-merged
    * segmentation, so tokenization is a (piece-text → token count)
    * broadcast-shaped join — the vocabulary-compression payoff a
    * second time, and the reason applying a tokenizer at 100 TB is a
    * join, not a per-token loop. The piece text recovers from the
    * segmentation by stripping the chr(31) separators (injective, so
    * the map is exact); docs whose text yields no pieces keep a row
    * with zero counts. Oracle replays training AND apply, so the gate
    * covers the whole train→tokenize lifecycle. */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame =
    bpeTokenizeOf(docs(spark, dir))

  def bpeTokenizeOf(docsF: DataFrame): DataFrame = {
    val (spark, _, vocab) = bpeTrainCore(docsF)
    val tid = Thread.currentThread().getId
    val dv = s"graft_bpe_docs_t$tid" // registered by bpeTrainCore
    spark.sql(s"""
      SELECT d.doc_id,
        CAST(coalesce(a.n_pieces, 0) AS BIGINT) AS n_pieces,
        CAST(coalesce(a.n_sym0, 0) AS BIGINT) AS n_sym0,
        CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens
      FROM $dv d
      LEFT JOIN (
        SELECT pd.doc_id, count(1) AS n_pieces,
          sum(length(pd.p)) AS n_sym0, sum(tk.ntok) AS n_tokens
        FROM (SELECT doc_id, explode(regexp_extract_all(text,
                $BpePieceRegexSpark, 0)) AS p FROM $dv) pd
        JOIN (SELECT replace(seq, chr(31), '') AS p,
                size(split(seq, chr(31))) AS ntok FROM $vocab) tk
          ON pd.p = tk.p
        GROUP BY pd.doc_id) a ON d.doc_id = a.doc_id
      ORDER BY d.doc_id""")
  }

  def bpeTokenizeSql: String = {
    val chain = bpeTrainSql
    val cut = chain.indexOf("\n      SELECT rank")
    require(cut > 0, "bpe train chain shape changed under tokenize")
    chain.substring(0, cut) + s""",
      tok AS MATERIALIZED (
        SELECT replace(seq, chr(31), '') AS p,
          len(string_split(seq, chr(31))) AS ntok
        FROM v$BpeRounds)
      SELECT d.doc_id,
        CAST(coalesce(a.n_pieces, 0) AS BIGINT) AS n_pieces,
        CAST(coalesce(a.n_sym0, 0) AS BIGINT) AS n_sym0,
        CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens
      FROM documents d
      LEFT JOIN (
        SELECT pd.doc_id, count(*) AS n_pieces,
          sum(length(pd.p)) AS n_sym0, sum(tk.ntok) AS n_tokens
        FROM (SELECT doc_id, unnest(regexp_extract_all(text,
                $BpePieceRegexDuck)) AS p FROM documents) pd
        JOIN tok tk ON pd.p = tk.p
        GROUP BY pd.doc_id) a ON d.doc_id = a.doc_id
      ORDER BY d.doc_id"""
  }

  def bpeTrainSql: String = {
    def viter(t: Int): String = {
      val vp = s"v${t - 1}"
      s"""
      p$t AS MATERIALIZED (
        SELECT arr[i] AS x, arr[i + 1] AS y, freq
        FROM (SELECT arr, freq, unnest(range(1, len(arr))) AS i
              FROM (SELECT string_split(seq, chr(31)) AS arr, freq
                    FROM $vp) z
              WHERE len(arr) >= 2) zz),
      m$t AS MATERIALIZED (
        SELECT x, y, CAST(sum(freq) AS BIGINT) AS cnt FROM p$t
        GROUP BY x, y ORDER BY cnt DESC, x, y LIMIT 1),
      v$t AS MATERIALIZED (
        SELECT list_reduce(string_split(v.seq, chr(31)),
          (acc, e) -> ${bpeStepSql("m.x", "m.y")}) AS seq, v.freq
        FROM $vp v CROSS JOIN m$t m)"""
    }
    val reports = (1 to BpeRounds).map { t =>
      s"""SELECT CAST($t AS INT) AS rank, x AS lhs, y AS rhs,
        x || y AS merged, cnt AS pair_cnt FROM m$t"""
    }
    s"""
      WITH v0 AS MATERIALIZED (
        SELECT seq, CAST(count(*) AS BIGINT) AS freq FROM (
          SELECT array_to_string(list_transform(range(1, length(p) + 1),
            i -> substr(p, i, 1)), chr(31)) AS seq
          FROM (SELECT unnest(regexp_extract_all(text,
            $BpePieceRegexDuck)) AS p FROM documents) z) zz
        GROUP BY seq),
      ${(1 to BpeRounds).map(viter).mkString(",")}
      SELECT rank, lhs, rhs, merged, pair_cnt FROM (
        ${reports.mkString(" UNION ALL ")}) u
      ORDER BY rank"""
  }

  // ---------------------------------------------------------------- q165
  /** Quality-curriculum training order — the standard data-schedule
    * construction (best data first, source mixture held uniform across
    * the whole schedule): rank docs by q31's composite quality WITHIN
    * each source, then interleave sources round-robin by that rank. Both
    * ranks are scale-safe: the within-source rank uses the new
    * [[DistributedRank.rankWithin]] (bucketed keyed two-pass — a
    * dominant source never becomes one task's sort, which is exactly
    * what `OVER (PARTITION BY source)` degenerates to on a skewed
    * corpus), and the global interleave position reuses
    * [[DistributedRank.rankOnly]] on (src_rank, source). The oracle
    * spells both as plain windows — the hash match proves the
    * distributed rewrite is bit-identical. */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame =
    curriculumOrderOf(docs(spark, dir))

  /** [[curriculumOrder]] over an arbitrary (doc_id, text, source) frame
    * — the composition entry point (cleaned corpora, filtered slices). */
  def curriculumOrderOf(docsDf: DataFrame): DataFrame = {
    val d = docsDf
      .select(col("doc_id"), col("source"), qualityCol.as("quality"))
      .transform(graft.core.EngineCache.persisted)
    val ranked = DistributedRank.rankWithin(
      d, "source", "src_rank", "quality", desc = true,
      col("quality").desc, col("doc_id"))
    val pos = DistributedRank.rankOnly(
      ranked, "global_pos", "src_rank", desc = false,
      col("src_rank"), col("source"))
    pos.select(col("global_pos"), col("doc_id"), col("source"),
        col("src_rank"), col("quality"))
      .orderBy("global_pos")
  }

  def curriculumOrderSql: String = s"""
      WITH q AS (
        SELECT doc_id, source, $qualitySql AS quality FROM documents),
      r AS (
        SELECT doc_id, source, quality,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY quality DESC, doc_id) AS BIGINT) AS src_rank
        FROM q)
      SELECT
        CAST(row_number() OVER (ORDER BY src_rank, source) AS BIGINT)
          AS global_pos,
        doc_id, source, src_rank, quality
      FROM r ORDER BY global_pos"""

  // ---------------------------------------------------------------- q160
  /** Dedup impact report — the ROI readout every dedup pipeline owes
    * its operator: per source, how many docs and tokens the full
    * exact+near dedup (q74's surviving corpus, riding the q144 at-rest
    * pair table) actually removed, as exact counts and retention
    * shares. A source with low retention is a mirror/template farm; a
    * source near 1.0 contributes genuinely novel text. One hash agg
    * over the corpus joined to the O(survivors) keep set — O(|sources|)
    * output at any scale. */
  def dedupImpact(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), col("source"),
        tokenCount("text").cast("long").as("tok"))
    val surv = dedupCorpus(spark, dir).select(col("doc_id"))
      .withColumn("kept", lit(1L))
    d.join(surv, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept").isNotNull, 1L).otherwise(0L)).as("n_docs_kept"),
        sum(col("tok")).as("n_tokens"),
        sum(when(col("kept").isNotNull, col("tok")).otherwise(0L))
          .as("n_tokens_kept"))
      .select(col("source"), col("n_docs"), col("n_docs_kept"),
        col("n_tokens"), col("n_tokens_kept"),
        dround(col("n_docs_kept").cast("double") /
          col("n_docs").cast("double"), 6).as("doc_retention"),
        dround(col("n_tokens_kept").cast("double") /
          col("n_tokens").cast("double"), 6).as("token_retention"))
      .orderBy("source")
  }

  def dedupImpactSql: String = s"""
      $dedupSurvivorsOracleCtes,
      d AS (
        SELECT doc_id, source, ${tokenCountSql("text")}::BIGINT AS tok
        FROM documents)
      SELECT d.source, count(*)::BIGINT AS n_docs,
        count(s.doc_id)::BIGINT AS n_docs_kept,
        sum(tok)::BIGINT AS n_tokens,
        coalesce(sum(CASE WHEN s.doc_id IS NOT NULL THEN tok END), 0)::BIGINT
          AS n_tokens_kept,
        ${droundSql(
          "count(s.doc_id)::DOUBLE / count(*)::DOUBLE", 6)} AS doc_retention,
        ${droundSql(
          "coalesce(sum(CASE WHEN s.doc_id IS NOT NULL THEN tok END), 0)::DOUBLE" +
            " / sum(tok)::DOUBLE", 6)} AS token_retention
      FROM d LEFT JOIN surv s ON d.doc_id = s.doc_id
      GROUP BY d.source
      ORDER BY d.source"""

  // ---------------------------------------------------------------- q162
  /** Cross-document duplicate-substring profile — span-level exact dedup
    * in the shape of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"), whose suffix-array pass finds verbatim
    * runs repeated across documents, re-expressed Spark-first: every
    * K-token positional gram is reduced to an 8-byte cross-engine hash
    * ([[graft.core.Determinism.xhashExpr]]) so the only corpus-sized
    * shuffle carries (doc_id, pos, ghash) and never the gram text; grams
    * seen in ≥2 DISTINCT docs (within-doc repetition is q56's metric)
    * mark their [pos, pos+K-1] token spans duplicated; per doc the spans
    * are merged by the q129 gaps-and-islands interval union (adjacent
    * spans fuse, so a repeated run of any length ≥ K is counted once,
    * exactly — overlapping grams chain through the union). No suffix
    * array needed: a hash agg + one doc-partitioned window is the whole
    * plan, which is why it survives 100 TB. Output: the span-removal
    * work list — per affected doc, how many tokens a cut pass deletes. */
  val SubdupK = 8
  /** The island-merge CTE block (w2 → isl → m) shared by q162's profile
    * and q168's executable span cut; expects an `sp(doc_id, n_tokens,
    * s, e)` relation in scope. */
  private def subdupIslandCtes: String = s"""
    w2 AS (
      SELECT doc_id, n_tokens, s, e,
        max(e) OVER (PARTITION BY doc_id ORDER BY s, e
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM sp),
    isl AS (
      SELECT doc_id, n_tokens, s, e,
        CAST(sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS island
      FROM w2),
    m AS (
      SELECT doc_id, n_tokens, island,
        min(s) AS i_s, max(e) AS i_e
      FROM isl GROUP BY doc_id, n_tokens, island)"""

  private def subdupIslandTail: String = s"""
    $subdupIslandCtes
    SELECT doc_id, n_tokens,
      CAST(count(1) AS BIGINT) AS dup_spans,
      CAST(sum(i_e - i_s + 1) AS BIGINT) AS dup_tokens,
      ${droundSql(
        "CAST(sum(i_e - i_s + 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE)",
        6)} AS dup_frac
    FROM m GROUP BY doc_id, n_tokens
    ORDER BY doc_id"""

  def substringDedup(spark: SparkSession, dir: String): DataFrame =
    substringDedupOf(docs(spark, dir))

  /** Register the base docs view + the persisted positional-gram-hash
    * view for `docsDf`; returns (baseView, gramsView). Grams persist
    * once: both the ≥2-docs gram filter and the span join consume the
    * frame, and Spark would otherwise re-tokenize the corpus for each. */
  private def subdupGramsView(docsDf: DataFrame): (String, String) = {
    val spark = docsDf.sparkSession
    val view = s"graft_subdup_docs_t${Thread.currentThread().getId}"
    docsDf.createOrReplaceTempView(view)
    spark.sql(s"""
      WITH d AS (SELECT doc_id, ${wordsExpr("text")} AS w FROM $view),
      e AS (
        SELECT doc_id, CAST(size(w) AS INT) AS n_tokens, w,
          explode(CASE WHEN size(w) >= $SubdupK
            THEN sequence(1, size(w) - ${SubdupK - 1})
            ELSE array_repeat(1, 0) END) AS pos
        FROM d)
      SELECT doc_id, n_tokens, pos,
        ${xhashExpr(s"concat_ws(' ', slice(w, pos, $SubdupK))")} AS ghash
      FROM e""")
      .transform(graft.core.EngineCache.persisted)
      .createOrReplaceTempView(s"${view}_grams")
    (view, s"${view}_grams")
  }

  /** The df (≥2-docs grams) + sp (dup spans) CTE pair over a grams
    * view — shared by q162 (all occurrences: the coverage PROFILE) and
    * q168 (`keepFirst`: the min-doc_id holder of each gram is its
    * canonical copy and keeps it — the Lee et al. "all but one" cut). */
  private def subdupSpanCtes(g: String, keepFirst: Boolean = false): String = {
    val skip = if (keepFirst) " AND gg.doc_id <> df.keeper" else ""
    s"""
      df AS (
        SELECT ghash, CAST(min(doc_id) AS BIGINT) AS keeper
        FROM $g GROUP BY ghash
        HAVING count(DISTINCT doc_id) >= 2),
      sp AS (
        SELECT gg.doc_id, gg.n_tokens, gg.pos AS s,
          gg.pos + ${SubdupK - 1} AS e
        FROM $g gg JOIN df ON gg.ghash = df.ghash$skip)"""
  }

  /** [[substringDedup]] over an arbitrary (doc_id, text) frame — the
    * spec entry point (planted shared runs → exact span boundaries). */
  def substringDedupOf(docsDf: DataFrame): DataFrame = {
    val (_, g) = subdupGramsView(docsDf)
    docsDf.sparkSession.sql(s"""
      WITH ${subdupSpanCtes(g)},
      $subdupIslandTail""")
  }

  // ---------------------------------------------------------------- q168
  /** Executable duplicate-span CUT — q162's work list turned into the
    * cleaned corpus itself, with Lee et al.'s "all but one" semantics:
    * each duplicate gram's min-doc_id holder is its canonical copy and
    * KEEPS the text; every other occurrence is covered by a cut span
    * (so a doc pair sharing a run loses it once, never twice, and a
    * fully-duplicated doc drops only if every one of its grams is
    * canonical elsewhere). Survivors re-join in position order into the
    * cleaned text (whitespace-normalized, as any span cut must be). The
    * anti join is doc-keyed with a per-doc range predicate against the
    * O(spans) island list; the rebuild is one doc-keyed hash agg over
    * (pos, word) structs — no window over the corpus, no driver text
    * handling, so the pass that writes a 100 TB cleaned corpus is
    * scan → two hash joins → hash agg. Output: the cleaned corpus. */
  def dedupClean(spark: SparkSession, dir: String): DataFrame =
    dedupCleanOf(docs(spark, dir))

  /** The survivor-rebuild tail (tok → t → kept → cleaned text) shared
    * by q168 and q184; expects an `m(doc_id, i_s, i_e)` island relation
    * in scope. */
  private def subdupRebuildTail(base: String): String = s"""
      tok AS (
        SELECT doc_id, w, posexplode(w) AS (p, word)
        FROM (SELECT doc_id, ${wordsExpr("text")} AS w FROM $base)),
      t AS (SELECT doc_id, CAST(size(w) AS INT) AS n_tokens,
              p + 1 AS pos, word FROM tok),
      kept AS (
        SELECT t.doc_id, t.n_tokens, t.pos, t.word
        FROM t LEFT JOIN m ON m.doc_id = t.doc_id
          AND t.pos BETWEEN m.i_s AND m.i_e
        WHERE m.i_s IS NULL)
      SELECT doc_id, CAST(min(n_tokens) AS INT) AS n_tokens,
        CAST(count(1) AS BIGINT) AS kept_tokens,
        array_join(transform(array_sort(collect_list(struct(pos, word))),
          s -> s.word), ' ') AS clean_text
      FROM kept GROUP BY doc_id ORDER BY doc_id"""

  def dedupCleanOf(docsDf: DataFrame): DataFrame = {
    val (base, g) = subdupGramsView(docsDf)
    docsDf.sparkSession.sql(s"""
      WITH ${subdupSpanCtes(g, keepFirst = true)},
      $subdupIslandCtes,
      ${subdupRebuildTail(base)}""")
  }

  // ---------------------------------------------------------------- q184
  /** WITHIN-document repetition cut — the intra-doc complement to
    * q168's cross-doc span cut (which deliberately ignores within-doc
    * repeats): any K-token gram occurring at ≥2 positions in the SAME
    * doc keeps its FIRST occurrence and every later occurrence falls
    * in a cut span; overlapping spans chain through the q129 island
    * union, so a PERIODIC run collapses to its leading period ("abc"
    * × 10 → "abc", "a" × 50 → "a") — the template/boilerplate-loop
    * scrub Gopher's repetition signals (q56) only measure. Spans
    * never start at position 1 (a gram at pos 1 is always its hash's
    * keeper), so every doc keeps ≥1 token. Same plan skeleton as
    * q168 — the persisted gram frame, one doc-keyed window for the
    * island union, a doc-keyed range anti join, one rebuild agg — so
    * the same 100 TB argument applies verbatim; the df/sp stage
    * groups by (doc, hash) instead of hash alone, which SHRINKS the
    * shuffle (no cross-doc gram fan-in at all). */
  def intradocDedup(spark: SparkSession, dir: String): DataFrame =
    intradocDedupOf(docs(spark, dir))

  def intradocDedupOf(docsDf: DataFrame): DataFrame = {
    val (base, g) = subdupGramsView(docsDf)
    docsDf.sparkSession.sql(s"""
      WITH dfw AS (
        SELECT doc_id, ghash, CAST(min(pos) AS INT) AS keeper
        FROM $g GROUP BY doc_id, ghash HAVING count(1) >= 2),
      sp AS (
        SELECT gg.doc_id, gg.n_tokens, gg.pos AS s,
          gg.pos + ${SubdupK - 1} AS e
        FROM $g gg JOIN dfw ON gg.doc_id = dfw.doc_id
          AND gg.ghash = dfw.ghash AND gg.pos <> dfw.keeper),
      $subdupIslandCtes,
      ${subdupRebuildTail(base)}""")
  }

  def intradocDedupSql: String = s"""
      WITH d AS (SELECT doc_id, ${wordsSql("text")} AS w FROM documents),
      e AS (
        SELECT doc_id, len(w)::INT AS n_tokens, w,
          unnest(range(1, len(w) - ${SubdupK - 2}))::INT AS pos
        FROM d),
      g AS (
        SELECT doc_id, n_tokens, pos,
          ${xhashSql(s"array_to_string(w[pos:pos+${SubdupK - 1}], ' ')")}
            AS ghash
        FROM e),
      dfw AS (
        SELECT doc_id, ghash, CAST(min(pos) AS INT) AS keeper
        FROM g GROUP BY doc_id, ghash HAVING count(*) >= 2),
      sp AS (
        SELECT g.doc_id, g.n_tokens, g.pos AS s,
          g.pos + ${SubdupK - 1} AS e
        FROM g JOIN dfw ON g.doc_id = dfw.doc_id
          AND g.ghash = dfw.ghash AND g.pos <> dfw.keeper),
      $subdupIslandCtes,
      tokpos AS (
        SELECT doc_id, len(w)::INT AS n_tokens,
          unnest(range(1, len(w) + 1))::INT AS pos, w
        FROM d),
      t AS (SELECT doc_id, n_tokens, pos, w[pos] AS word FROM tokpos),
      kept AS (
        SELECT t.doc_id, t.n_tokens, t.pos, t.word
        FROM t LEFT JOIN m ON m.doc_id = t.doc_id
          AND t.pos BETWEEN m.i_s AND m.i_e
        WHERE m.i_s IS NULL)
      SELECT doc_id, min(n_tokens)::INT AS n_tokens,
        count(*)::BIGINT AS kept_tokens,
        string_agg(word, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id ORDER BY doc_id"""

  def dedupCleanSql: String = dedupCleanSqlFrom("documents")

  /** [[dedupCleanSql]] over an arbitrary (doc_id, text) relation —
    * q190's funnel runs the cut on the DEDUP SURVIVORS, not the raw
    * corpus. */
  def dedupCleanSqlFrom(rel: String): String = s"""
      WITH d AS (SELECT doc_id, ${wordsSql("text")} AS w FROM $rel),
      e AS (
        SELECT doc_id, len(w)::INT AS n_tokens, w,
          unnest(range(1, len(w) - ${SubdupK - 2}))::INT AS pos
        FROM d),
      g AS (
        SELECT doc_id, n_tokens, pos,
          ${xhashSql(s"array_to_string(w[pos:pos+${SubdupK - 1}], ' ')")}
            AS ghash
        FROM e),
      df AS (
        SELECT ghash, CAST(min(doc_id) AS BIGINT) AS keeper
        FROM g GROUP BY ghash
        HAVING count(DISTINCT doc_id) >= 2),
      sp AS (
        SELECT g.doc_id, g.n_tokens, g.pos AS s,
          g.pos + ${SubdupK - 1} AS e
        FROM g JOIN df ON g.ghash = df.ghash AND g.doc_id <> df.keeper),
      $subdupIslandCtes,
      tokpos AS (
        SELECT doc_id, len(w)::INT AS n_tokens,
          unnest(range(1, len(w) + 1))::INT AS pos, w
        FROM d),
      t AS (SELECT doc_id, n_tokens, pos, w[pos] AS word FROM tokpos),
      kept AS (
        SELECT t.doc_id, t.n_tokens, t.pos, t.word
        FROM t LEFT JOIN m ON m.doc_id = t.doc_id
          AND t.pos BETWEEN m.i_s AND m.i_e
        WHERE m.i_s IS NULL)
      SELECT doc_id, min(n_tokens)::INT AS n_tokens,
        count(*)::BIGINT AS kept_tokens,
        string_agg(word, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id ORDER BY doc_id"""

  // ---------------------------------------------------------------- q190
  /** The corpus cleaning FUNNEL — the end-to-end per-source readout a
    * data lead looks at before a training run: raw volume → exact+near
    * dedup survivors (q74's keep set) → tokens left after the
    * duplicate-span cut applied to those survivors (q168's pass, run
    * on the deduped corpus the way a real pipeline stages it) → docs
    * and tokens clearing the q31 quality floor. One row per source,
    * every figure an exact integer, so the funnel doubles as the
    * reconciliation check between the stages it composes (each number
    * is BY CONSTRUCTION ≤ the one before it in token terms). The
    * oracle replays the full survivor chain, the span cut over the
    * survivor relation, and the quality rule — the deepest composed
    * gate in the suite: five operators, one hash compare. */
  def corpusFunnel(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val surv = dedupCorpus(spark, dir)
      .select(col("doc_id"), lit(1L).as("s"))
    val cut = dedupCleanOf(
      d.join(surv.select("doc_id"), Seq("doc_id")).select("doc_id", "text"))
      .select(col("doc_id"), col("kept_tokens"))
    d.select(col("source"), col("doc_id"),
        tokenCount("text").cast("long").as("toks"),
        (qualityCol >= 0.35).cast("long").as("qok"))
      .join(surv, Seq("doc_id"), "left")
      .join(cut, Seq("doc_id"), "left")
      .select(col("source"), col("toks"), col("qok"),
        coalesce(col("s"), lit(0L)).as("s"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).cast("long").as("n_docs_raw"),
        sum(col("toks")).cast("long").as("n_tokens_raw"),
        sum(col("s")).cast("long").as("n_docs_dedup"),
        sum(col("s") * col("toks")).cast("long").as("n_tokens_dedup"),
        sum(col("kept")).cast("long").as("n_tokens_cut"),
        sum(when(col("s") === 1 && col("qok") === 1 && col("kept") > 0, 1L)
          .otherwise(0L)).cast("long").as("n_docs_final"),
        sum(when(col("s") === 1 && col("qok") === 1, col("kept"))
          .otherwise(0L)).cast("long").as("n_tokens_final"))
      .orderBy(col("source"))
  }

  def corpusFunnelSql: String = {
    val tokens = s"${tokenCountSql("text")}::DOUBLE"
    val punctR = s"${punctCountSql("text")}::DOUBLE / length(text)"
    val stopR =
      s"${lexiconHitsSql("text", EnglishStopwords)}::DOUBLE / ($tokens)"
    val score = droundSql(
      s"least($tokens / 100.0, 1.0) * 0.4 + (1.0 - ($punctR)) * 0.3 + " +
        s"($stopR) * 0.3", 6)
    s"""
      $dedupSurvivorsOracleCtes,
      sd AS (SELECT d.doc_id, d.text FROM documents d
             JOIN surv s ON d.doc_id = s.doc_id),
      cutres AS (${dedupCleanSqlFrom("sd")}),
      base AS (
        SELECT d.source,
          CAST(${tokenCountSql("text")} AS BIGINT) AS toks,
          CASE WHEN $score >= 0.35 THEN 1 ELSE 0 END AS qok,
          CASE WHEN s.doc_id IS NULL THEN 0 ELSE 1 END AS s,
          CAST(coalesce(c.kept_tokens, 0) AS BIGINT) AS kept
        FROM documents d
        LEFT JOIN surv s ON d.doc_id = s.doc_id
        LEFT JOIN cutres c ON d.doc_id = c.doc_id)
      SELECT source,
        CAST(count(*) AS BIGINT) AS n_docs_raw,
        CAST(sum(toks) AS BIGINT) AS n_tokens_raw,
        CAST(sum(s) AS BIGINT) AS n_docs_dedup,
        CAST(sum(s * toks) AS BIGINT) AS n_tokens_dedup,
        CAST(sum(kept) AS BIGINT) AS n_tokens_cut,
        CAST(sum(CASE WHEN s = 1 AND qok = 1 AND kept > 0
          THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_final,
        CAST(sum(CASE WHEN s = 1 AND qok = 1 THEN kept ELSE 0 END)
          AS BIGINT) AS n_tokens_final
      FROM base GROUP BY source ORDER BY source"""
  }

  // ---------------------------------------------------------------- q189
  /** Gram-novelty of an incoming batch against the corpus at rest —
    * the ingest "newness" gauge a crawl pipeline reads before paying
    * for a full dedup pass: per batch doc, the fraction of its
    * DISTINCT K-token gram hashes absent from the stored corpus gram
    * set (q171's at-rest table, 8 bytes per unique gram). A mirror or
    * re-crawl scores ≈ 0, genuinely fresh text ≈ 1, and a
    * boilerplate-wrapped page sits in between — the number that
    * decides whether an incoming source is worth processing at all.
    * One anti-join-shaped left join of O(batch) gram hashes against
    * the shard-pruned stored set; the corpus is never re-tokenized
    * (the same frozen-artifact discipline as q171's span increment). */
  def gramNovelty(spark: SparkSession, dir: String): DataFrame =
    gramNoveltyOf(
      docs(spark, dir).filter(col("source") === BatchSource),
      corpusGramsAtRest(spark, dir))

  /** [[gramNovelty]] over an arbitrary batch frame + stored gram set —
    * the spec and foreachBatch entry point. */
  def gramNoveltyOf(batchDocs: DataFrame, corpusGrams: DataFrame): DataFrame = {
    val spark = batchDocs.sparkSession
    val (_, bg) = subdupGramsView(batchDocs)
    spark.table(bg).select(col("doc_id"), col("ghash")).distinct()
      .join(corpusGrams.select(col("ghash")).withColumn("seen", lit(1)),
        Seq("ghash"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("novel_grams"))
      .select(col("doc_id"), col("n_grams"), col("novel_grams"),
        dround(col("novel_grams").cast("double") /
          col("n_grams").cast("double"), 6).as("novelty"))
      .orderBy(col("doc_id"))
  }

  def gramNoveltySql: String = s"""
      WITH bd AS (SELECT doc_id, ${wordsSql("text")} AS w
                  FROM documents WHERE source = '$BatchSource'),
      be AS (
        SELECT doc_id, w,
          unnest(range(1, len(w) - ${SubdupK - 2}))::INT AS pos
        FROM bd),
      bg AS (
        SELECT DISTINCT doc_id,
          ${xhashSql(s"array_to_string(w[pos:pos+${SubdupK - 1}], ' ')")}
            AS ghash
        FROM be),
      cd AS (SELECT doc_id, ${wordsSql("text")} AS w
             FROM documents WHERE source <> '$BatchSource'),
      ce AS (
        SELECT doc_id, w,
          unnest(range(1, len(w) - ${SubdupK - 2}))::INT AS pos
        FROM cd),
      cg AS (
        SELECT DISTINCT
          ${xhashSql(s"array_to_string(w[pos:pos+${SubdupK - 1}], ' ')")}
            AS ghash
        FROM ce)
      SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        CAST(sum(CASE WHEN cg.ghash IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS novel_grams,
        ${droundSql(
          "CAST(sum(CASE WHEN cg.ghash IS NULL THEN 1 ELSE 0 END) AS DOUBLE)" +
            " / CAST(count(*) AS DOUBLE)", 6)} AS novelty
      FROM bg LEFT JOIN cg ON bg.ghash = cg.ghash
      GROUP BY bg.doc_id
      ORDER BY bg.doc_id"""

  // ---------------------------------------------------------------- q185
  /** Deterministic per-epoch training shuffle + token-balanced shard
    * assignment — the data-loader order a trainer actually consumes.
    * Each epoch permutes the corpus by a pure hash of (epoch, doc_id):
    * RNG-free, partitioning-invariant, different every epoch, and
    * reproducible from the doc ids alone. Shards are TOKEN-balanced,
    * not count-balanced: shard = ⌊tokens-before / ⌈total/S⌉⌋, so every
    * shard carries an equal token budget (±1 doc) and no trainer rank
    * idles on short documents. The tokens-before scan is the new
    * [[DistributedRank.rankAndScanWithin]] — a bucketed two-pass
    * distributed PREFIX SUM (per-(epoch, bucket) exact int64 sums,
    * driver-side offsets, one keyed window) — never the
    * single-partition `SUM OVER (ORDER BY)` window the oracle spells,
    * and the hash match proves the scan rewrite bit-identical. Output:
    * the full (epoch, position, doc, shard) assignment table. */
  val ShuffleEpochs = 2
  val ShuffleShards = 8

  def epochShuffle(spark: SparkSession, dir: String): DataFrame =
    epochShuffleOf(docs(spark, dir))

  def epochShuffleOf(docsF: DataFrame): DataFrame = {
    val spark = docsF.sparkSession
    import org.apache.spark.sql.functions.{broadcast => bcast}
    val base = docsF
      .selectExpr("doc_id",
        s"CAST(size(${wordsExpr("text")}) AS BIGINT) AS n_tokens")
      .crossJoin(spark.sql(
        s"SELECT explode(sequence(1, $ShuffleEpochs)) AS epoch"))
      .selectExpr("epoch", "doc_id", "n_tokens",
        xhashExpr("concat('shuf:', CAST(epoch AS STRING), ':', " +
          "CAST(doc_id AS STRING))") + " AS okey")
    val ranked = DistributedRank.rankAndScanWithin(
      base, "epoch", "pos", "tok_before", "n_tokens",
      "okey", desc = false, col("okey"), col("doc_id"))
    val totals = base.groupBy(col("epoch"))
      .agg(sum(col("n_tokens")).as("tot"))
    ranked.join(bcast(totals), "epoch")
      .selectExpr("CAST(epoch AS INT) AS epoch", "pos", "doc_id",
        "n_tokens",
        s"""CAST(least($ShuffleShards - 1,
          tok_before div ((tot + $ShuffleShards - 1) div $ShuffleShards))
          AS INT) AS shard""")
      .orderBy(col("epoch"), col("pos"))
  }

  def epochShuffleSql: String = s"""
      WITH base AS (
        SELECT doc_id,
          CAST(len(${wordsSql("text")}) AS BIGINT) AS n_tokens
        FROM documents),
      eps AS (SELECT unnest(range(1, ${ShuffleEpochs + 1}))::INT AS epoch),
      keyed AS (
        SELECT epoch, doc_id, n_tokens,
          ${xhashSql("'shuf:' || epoch || ':' || doc_id")} AS okey
        FROM base CROSS JOIN eps),
      r AS (
        SELECT epoch, doc_id, n_tokens,
          CAST(row_number() OVER (PARTITION BY epoch
            ORDER BY okey, doc_id) AS BIGINT) AS pos,
          CAST(coalesce(sum(n_tokens) OVER (PARTITION BY epoch
            ORDER BY okey, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS tok_before,
          CAST(sum(n_tokens) OVER (PARTITION BY epoch) AS BIGINT) AS tot
        FROM keyed)
      SELECT epoch, pos, doc_id, n_tokens,
        CAST(least($ShuffleShards - 1,
          tok_before // ((tot + ${ShuffleShards - 1}) // $ShuffleShards))
          AS INT) AS shard
      FROM r ORDER BY epoch, pos"""

  // ---------------------------------------------------------------- q188
  /** Unicode script / codepoint-class profile — the triage pass a
    * multilingual crawl needs before q32's n-gram language ID can even
    * apply (n-gram LID assumes you already know the script): per doc,
    * codepoint counts for Latin, digits, whitespace, CJK, Cyrillic,
    * Greek, Arabic, and the remainder, plus the dominant script with a
    * deterministic tie rule (highest count, alphabetical on ties,
    * 'none' when no script chars at all). Counts come from
    * length-after-scrub (len(text) − len(regexp_replace(class, ''))) —
    * one codegen'd projection, no explode, no shuffle beyond the scan;
    * ranges are BMP so both engines count codepoints identically. */
  private val ScriptClasses: Seq[(String, String)] = Seq(
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "latin" -> "[A-Za-z]")

  def scriptProfile(spark: SparkSession, dir: String): DataFrame =
    scriptProfileOf(docs(spark, dir))

  def scriptProfileOf(docsF: DataFrame): DataFrame = {
    val spark = docsF.sparkSession
    val dv = s"graft_script_docs_t${Thread.currentThread().getId}"
    docsF.createOrReplaceTempView(dv)
    // Spark SQL string literals process backslash escapes, so the regex
    // backslashes double here; DuckDB literals are raw (see the *Sql twin)
    def cnt(re: String) = {
      val esc = re.replace("\\", "\\\\")
      s"CAST(length(text) - length(regexp_replace(text, '$esc', '')) AS BIGINT)"
    }
    val classCols = ScriptClasses.map { case (n, re) => s"${cnt(re)} AS $n" }
    val scripts = ScriptClasses.map(_._1)
    val dominant = scripts.map { s =>
      val geAll = scripts.filter(_ != s).map(o => s"$s >= $o").mkString(" AND ")
      s"WHEN $s > 0 AND $geAll THEN '$s'"
    }.mkString(" ")
    spark.sql(s"""
      SELECT doc_id, n_chars, ${scripts.mkString(", ")}, n_digit, n_space,
        n_chars - (${scripts.mkString(" + ")} + n_digit + n_space) AS n_other,
        CASE $dominant ELSE 'none' END AS dominant_script
      FROM (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
          ${classCols.mkString(", ")},
          ${cnt("[0-9]")} AS n_digit,
          ${cnt("\\s")} AS n_space
        FROM $dv) z
      ORDER BY doc_id""")
  }

  def scriptProfileSql: String = {
    def cnt(re: String) =
      s"CAST(length(text) - length(regexp_replace(text, '$re', '', 'g')) AS BIGINT)"
    val classCols = ScriptClasses.map { case (n, re) => s"${cnt(re)} AS $n" }
    val scripts = ScriptClasses.map(_._1)
    val dominant = scripts.map { s =>
      val geAll = scripts.filter(_ != s).map(o => s"$s >= $o").mkString(" AND ")
      s"WHEN $s > 0 AND $geAll THEN '$s'"
    }.mkString(" ")
    s"""
      SELECT doc_id, n_chars, ${scripts.mkString(", ")}, n_digit, n_space,
        n_chars - (${scripts.mkString(" + ")} + n_digit + n_space) AS n_other,
        CASE $dominant ELSE 'none' END AS dominant_script
      FROM (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
          ${classCols.mkString(", ")},
          ${cnt("[0-9]")} AS n_digit,
          ${cnt("\\s")} AS n_space
        FROM documents) z
      ORDER BY doc_id"""
  }

  // ---------------------------------------------------------------- q186
  /** Deterministic skip-gram + negative-sample generation — the
    * word2vec-style embedding-training input pipeline as a query.
    * Three classic stages, every "random" choice a pure hash:
    *   1. frequency SUBSAMPLING (Mikolov's t-rule): token survives iff
    *      hash(doc,pos) mod 1e6 < ⌊p_keep·1e6⌉ with p_keep =
    *      min(1, (√(f/t)+1)·t/f) — frequent-word tokens thin out,
    *      reproducibly on any partitioning;
    *   2. skip-gram PAIRS: surviving tokens within ±[[SgWindow]]
    *      positions in the same doc — a doc-keyed band join, never a
    *      corpus window;
    *   3. NEGATIVES: [[SgNegK]] draws per pair from the unigram^0.75
    *      table. The 3/4 power is sqrt(cnt·sqrt(cnt)) — two IEEE
    *      sqrts and a product, all correctly rounded, so BOTH engines
    *      get the same integer weight (pow() would not cross-engine).
    *      Cumulative weight intervals come from the
    *      [[DistributedRank.rankAndScanWithin]] distributed prefix
    *      sum over the vocab; each hash draw lands in [0, W_total)
    *      and resolves to its interval through a BUCKETED equi-join
    *      (intervals explode into ⌈w/bs⌉ covering buckets, draws
    *      compute their bucket arithmetically) — the q95 trick, so
    *      the lookup is an equi-join at any vocab size while the
    *      oracle spells the plain inequality join.
    * Output: one row per (pair, negative slot) — the exact training
    * stream a skip-gram trainer consumes, RNG-free end to end. */
  val SgWindow = 2
  val SgNegK = 2
  val SgSubsampleT = "1e-3"
  val SgBuckets = 1024

  def skipgramNegatives(spark: SparkSession, dir: String): DataFrame =
    skipgramNegativesOf(docs(spark, dir))

  /** Corpus-derived sampling state: vocab / bucketed-interval view
    * names plus the total token count, total unigram^0.75 weight, and
    * interval bucket size. Session-bound (the views live on the
    * session that built them). */
  private case class SgStats(vocabV: String, vbV: String,
                             totT: Long, totW: Long, bs: Long)

  /** Build the frozen sampling state from a base corpus: vocab counts,
    * unigram^0.75 weights, the rankAndScanWithin cumulative intervals,
    * and their bucket explosion. One pass over the base; everything
    * downstream (batch or stream) only reads the views. */
  private def sgStats(baseDocs: DataFrame, tag: String): SgStats = {
    val spark = baseDocs.sparkSession
    val tid = Thread.currentThread().getId
    val dv = s"graft_sg_base_${tag}_t$tid"
    baseDocs.createOrReplaceTempView(dv)
    val vocabV = s"graft_sg_vocab_${tag}_t$tid"
    spark.sql(s"""
      SELECT word, CAST(count(1) AS BIGINT) AS cnt,
        CAST(greatest(1, floor(sqrt(CAST(count(1) AS DOUBLE) *
          sqrt(CAST(count(1) AS DOUBLE))))) AS BIGINT) AS w,
        ${xhashExpr("concat('w:', word)")} AS hw
      FROM (SELECT explode(${wordsExpr("text")}) AS word FROM $dv) z
      GROUP BY word""")
      .transform(graft.core.EngineCache.persisted)
      .createOrReplaceTempView(vocabV)
    val Array(totT, totW) = spark.sql(
      s"SELECT CAST(sum(cnt) AS BIGINT), CAST(sum(w) AS BIGINT) FROM $vocabV")
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val bs = (totW + SgBuckets - 1) / SgBuckets
    // cumulative unigram^0.75 intervals via the distributed prefix sum
    val cum = DistributedRank.rankAndScanWithin(
      spark.sql(s"SELECT word, w, hw, 1 AS k FROM $vocabV"),
      "k", "rk", "sc", "w", "hw", desc = false, col("hw"), col("word"))
    val cumV = s"graft_sg_cum_${tag}_t$tid"
    cum.createOrReplaceTempView(cumV)
    val vbV = s"graft_sg_vb_${tag}_t$tid"
    spark.sql(s"""
      SELECT word, w, sc, explode(sequence(sc div $bs, (sc + w - 1) div $bs))
        AS b
      FROM $cumV""")
      .transform(graft.core.EngineCache.persisted)
      .createOrReplaceTempView(vbV)
    SgStats(vocabV, vbV, totT, totW, bs)
  }

  /** The per-batch half: subsample, pair, and draw negatives for
    * `batchDocs` ALONE under frozen `st` statistics — the stream-time
    * unit of work. Batch words absent from the base vocab drop out
    * (no frequency ⇒ no subsample decision ⇒ no pair), the same
    * frozen-artifact contract as q151's codebook. */
  private def sgPairsFor(batchDocs: DataFrame, st: SgStats,
                         tag: String): DataFrame = {
    val spark = batchDocs.sparkSession
    val tid = Thread.currentThread().getId
    val bv = s"graft_sg_batch_${tag}_t$tid"
    batchDocs.createOrReplaceTempView(bv)
    val pk = s"""least(1.0, (sqrt((CAST(v.cnt AS DOUBLE) / ${st.totT})
      / $SgSubsampleT) + 1.0) * $SgSubsampleT
      / (CAST(v.cnt AS DOUBLE) / ${st.totT}))"""
    val keptV = s"graft_sg_kept_${tag}_t$tid"
    spark.sql(s"""
      SELECT t.doc_id, t.pos, t.word
      FROM (SELECT doc_id, p + 1 AS pos, word
            FROM (SELECT doc_id, posexplode(${wordsExpr("text")})
                    AS (p, word) FROM $bv) zz) t
      JOIN ${st.vocabV} v ON t.word = v.word
      WHERE ${xhashExpr(
        "concat('ss:', CAST(t.doc_id AS STRING), ':', CAST(t.pos AS STRING))")}
        % 1000000 < CAST(floor(($pk) * 1e6 + 0.5) AS BIGINT)""")
      .transform(graft.core.EngineCache.persisted)
      .createOrReplaceTempView(keptV)
    spark.sql(s"""
      SELECT n.doc_id, n.pos, n.cpos, n.center, n.context,
        n.neg_slot, vb.word AS neg_word
      FROM (
        SELECT c.doc_id, c.pos, x.pos AS cpos, c.word AS center,
          x.word AS context, j AS neg_slot,
          ${xhashExpr(
            "concat('neg:', CAST(c.doc_id AS STRING), ':', " +
            "CAST(c.pos AS STRING), ':', CAST(x.pos AS STRING), ':', " +
            "CAST(j AS STRING))")} % ${st.totW} AS draw
        FROM $keptV c
        JOIN $keptV x ON c.doc_id = x.doc_id
          AND x.pos BETWEEN c.pos - $SgWindow AND c.pos + $SgWindow
          AND x.pos <> c.pos
        LATERAL VIEW explode(sequence(1, $SgNegK)) nj AS j) n
      JOIN ${st.vbV} vb ON vb.b = n.draw div ${st.bs}
        AND n.draw >= vb.sc AND n.draw < vb.sc + vb.w
      ORDER BY doc_id, pos, cpos, neg_slot""")
  }

  def skipgramNegativesOf(docsF: DataFrame): DataFrame =
    sgPairsFor(docsF, sgStats(docsF, "self"), "self")

  /** Frozen-stats batch entry: pairs for `batchDocs` under `baseDocs`'
    * statistics — the unit [[graft.streaming.EventAnalytics
    * .startStreamingSkipgram]] runs per micro-batch. */
  def skipgramBatchPairs(baseDocs: DataFrame,
                         batchDocs: DataFrame): DataFrame =
    sgPairsFor(batchDocs, sgStats(baseDocs, "base"), "base")

  /** [[skipgramBatchPairs]] with the stats built once and reused —
    * returns the per-batch closure the streaming twin installs. */
  def skipgramPairsWithFrozenStats(baseDocs: DataFrame)
      : DataFrame => DataFrame = {
    val st = sgStats(baseDocs, "frozen")
    batch => sgPairsFor(batch, st, "frozen")
  }

  def skipgramNegativesSql: String = s"""
      WITH tok AS MATERIALIZED (
        SELECT doc_id, pos, w[pos] AS word FROM (
          SELECT doc_id, w, unnest(range(1, len(w) + 1))::INT AS pos
          FROM (SELECT doc_id, ${wordsSql("text")} AS w FROM documents) d) z),
      vocab AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt,
          CAST(greatest(1, floor(sqrt(CAST(count(*) AS DOUBLE) *
            sqrt(CAST(count(*) AS DOUBLE))))) AS BIGINT) AS w,
          ${xhashSql("'w:' || word")} AS hw
        FROM tok GROUP BY word),
      tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t,
                     CAST(sum(w) AS BIGINT) AS wt FROM vocab),
      kept AS MATERIALIZED (
        SELECT t.doc_id, t.pos, t.word
        FROM tok t JOIN vocab v ON t.word = v.word CROSS JOIN tot
        WHERE ${xhashSql("'ss:' || t.doc_id || ':' || t.pos")} % 1000000
          < CAST(floor(least(1.0,
              (sqrt((CAST(v.cnt AS DOUBLE) / tot.t) / $SgSubsampleT) + 1.0)
              * $SgSubsampleT / (CAST(v.cnt AS DOUBLE) / tot.t)) * 1e6 + 0.5)
            AS BIGINT)),
      cum AS MATERIALIZED (
        SELECT word, w,
          CAST(coalesce(sum(w) OVER (ORDER BY hw, word
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS sc
        FROM vocab),
      pairs AS MATERIALIZED (
        SELECT c.doc_id, c.pos, x.pos AS cpos, c.word AS center,
          x.word AS context, j AS neg_slot,
          ${xhashSql(
            "'neg:' || c.doc_id || ':' || c.pos || ':' || x.pos || ':' || j")}
            % tot.wt AS draw
        FROM kept c
        JOIN kept x ON c.doc_id = x.doc_id
          AND x.pos BETWEEN c.pos - $SgWindow AND c.pos + $SgWindow
          AND x.pos <> c.pos
        CROSS JOIN (SELECT unnest(range(1, ${SgNegK + 1}))::INT AS j) nj
        CROSS JOIN tot)
      SELECT p.doc_id, p.pos, p.cpos, p.center, p.context, p.neg_slot,
        c.word AS neg_word
      FROM pairs p JOIN cum c ON p.draw >= c.sc AND p.draw < c.sc + c.w
      ORDER BY doc_id, pos, cpos, neg_slot"""
  /** Incremental substring dedup against GRAMS at rest — the q145
    * discipline for the span leg: the corpus's distinct positional-gram
    * hashes persist ONCE to the warehouse (`shard=N` on ghash; 8 bytes
    * per unique gram — the smallest artifact that answers "is this run
    * verbatim in the corpus?"), and each arriving batch is the only
    * text that gets tokenized: batch grams semi-join the stored set,
    * matched spans merge through the same gaps-and-islands union, and
    * the output is q162's profile for the BATCH docs alone — the cut
    * list for an arriving increment, O(batch) work per increment.
    * Within-batch duplication is deliberately out of scope here (q162
    * owns it); this measures overlap with what is already stored. The
    * oracle replays both sides from raw text, proving the at-rest gram
    * set lost nothing. The STREAM-TIME twin
    * [[graft.streaming.EventAnalytics.startStreamingSpanDedup]] runs
    * the same increment per micro-batch against the same stored set. */
  def spanIncrement(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    spanIncrementOf(
      d.filter(col("source") === BatchSource), corpusGramsAtRest(spark, dir))
  }

  /** Build-or-read the corpus-side distinct-gram table for `dir`. */
  /** The distinct positional-gram hash set of a corpus frame — the
    * content of the at-rest gram table, exposed for specs and ad-hoc
    * baselines. */
  def corpusGramsOf(docsDf: DataFrame): DataFrame = {
    val (_, g) = subdupGramsView(docsDf)
    docsDf.sparkSession.table(g).select(col("ghash")).distinct()
  }

  def corpusGramsAtRest(spark: SparkSession, dir: String): DataFrame = {
    val table = "subdup_grams_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
    graft.core.Warehouse.tableOnce(spark, table, "shard") {
      corpusGramsOf(docs(spark, dir).filter(col("source") =!= BatchSource))
        .withColumn("shard", expr("CAST(pmod(ghash, 8) AS INT)"))
    }.select("ghash")
  }

  /** The increment over an arbitrary batch frame + stored gram set —
    * the spec and foreachBatch entry point. */
  def spanIncrementOf(batchDocs: DataFrame,
                      corpusGrams: DataFrame): DataFrame = {
    val spark = batchDocs.sparkSession
    val (_, bg) = subdupGramsView(batchDocs)
    // DataFrame-API semi join (no temp view for the corpus side): under
    // foreachBatch the batch frame lives in a CLONED session whose
    // catalog snapshot predates any view registered here — frames
    // compose across the clone, catalog lookups do not
    val sp = spark.table(bg)
      .join(corpusGrams.select(col("ghash")), Seq("ghash"), "left_semi")
      .select(col("doc_id"), col("n_tokens"), col("pos").as("s"),
        (col("pos") + (SubdupK - 1)).as("e"))
    val spView = s"graft_spaninc_sp_t${Thread.currentThread().getId}"
    sp.createOrReplaceTempView(spView)
    spark.sql(s"""
      WITH sp AS (SELECT * FROM $spView),
      $subdupIslandTail""")
  }

  def spanIncrementSql: String = s"""
      WITH bd AS (SELECT doc_id, ${wordsSql("text")} AS w
                  FROM documents WHERE source = '$BatchSource'),
      be AS (
        SELECT doc_id, len(w)::INT AS n_tokens, w,
          unnest(range(1, len(w) - ${SubdupK - 2}))::INT AS pos
        FROM bd),
      bg AS (
        SELECT doc_id, n_tokens, pos,
          ${xhashSql(s"array_to_string(w[pos:pos+${SubdupK - 1}], ' ')")}
            AS ghash
        FROM be),
      cd AS (SELECT ${wordsSql("text")} AS w
             FROM documents WHERE source <> '$BatchSource'),
      ce AS (
        SELECT w, unnest(range(1, len(w) - ${SubdupK - 2}))::INT AS pos
        FROM cd),
      cg AS (
        SELECT DISTINCT
          ${xhashSql(s"array_to_string(w[pos:pos+${SubdupK - 1}], ' ')")}
            AS ghash
        FROM ce),
      sp AS (
        SELECT bg.doc_id, bg.n_tokens, bg.pos AS s,
          bg.pos + ${SubdupK - 1} AS e
        FROM bg JOIN cg ON bg.ghash = cg.ghash),
      $subdupIslandTail"""

  def substringDedupSql: String = s"""
      WITH d AS (SELECT doc_id, ${wordsSql("text")} AS w FROM documents),
      e AS (
        SELECT doc_id, len(w)::INT AS n_tokens, w,
          unnest(range(1, len(w) - ${SubdupK - 2}))::INT AS pos
        FROM d),
      g AS (
        SELECT doc_id, n_tokens, pos,
          ${xhashSql(s"array_to_string(w[pos:pos+${SubdupK - 1}], ' ')")}
            AS ghash
        FROM e),
      df AS (
        SELECT ghash FROM g GROUP BY ghash
        HAVING count(DISTINCT doc_id) >= 2),
      sp AS (
        SELECT g.doc_id, g.n_tokens, g.pos AS s,
          g.pos + ${SubdupK - 1} AS e
        FROM g JOIN df ON g.ghash = df.ghash),
      $subdupIslandTail"""

  // ---------------------------------------------------------------- q159
  /** Blocking-strategy audit ([[Dedup.blockingAudit]]): MinHash bands vs
    * SimHash pigeonhole blocks vs the normalized-head key, each scored
    * for candidate volume, recall, and precision against the unblocked
    * exact-Jaccard ground truth — the measurement that decides which
    * blocking a production dedup can afford before anyone trusts it. */
  /** The audit's labeled sample: the unblocked truth is O(sample²), so
    * the cap — not the corpus — prices the measurement (5 000 docs at
    * sf0.1 already cost 12.5M exact set intersections unbounded). */
  val AuditSampleCap = 500
  def blockingAudit(spark: SparkSession, dir: String): DataFrame =
    Dedup.blockingAudit(
      docs(spark, dir).filter(col("doc_id") < AuditSampleCap),
      "doc_id", "text", WordShingleN, MinhashK, MinhashBands,
      SimhashMaxHamming, StatsOps.SurvivorHeadWords, MinhashTau)

  // ---------------------------------------------------------------- q148
  /** Padding-efficiency report for fixed-size inference/training batches
    * — the batching-planner readout: a batch of B docs pads every doc to
    * the batch max, so padded cost = Σ_batches n·max(tokens). 'arrival'
    * batches docs in doc_id order (the naive collate); 'sorted' batches
    * them in (tokens DESC, doc_id) order — length-sorted batching, the
    * standard trick that puts like-sized docs together and collapses the
    * padding waste. Both global ranks come from [[DistributedRank]]
    * (never a single-partition window); the token frame is persisted
    * once and serves both rank passes. All tallies are exact integers;
    * fp appears only in the final waste ratio. Output is O(strategies)
    * rows at any corpus size. */
  val PadBatchRows = 8
  def padBatching(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), tokenCount("text").cast("long").as("tok"))
      .transform(graft.core.EngineCache.persisted)
    val arrival = DistributedRank.rankOnly(
      toks, "rk", "doc_id", desc = false, col("doc_id"))
    val sorted = DistributedRank.rankOnly(
      toks, "rk", "tok", desc = true, col("tok").desc, col("doc_id"))
    def strat(df: DataFrame, name: String): DataFrame =
      df.withColumn("batch_id", expr(s"(rk - 1) div $PadBatchRows"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n"), max(col("tok")).as("mx"),
          sum(col("tok")).as("st"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("st")).as("actual_tokens"),
          sum(col("n") * col("mx")).as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("actual_tokens"), col("padded_tokens"))
    strat(arrival, "arrival").unionByName(strat(sorted, "sorted"))
      .withColumn("waste_ratio", dround(
        (col("padded_tokens") - col("actual_tokens")).cast("double") /
          col("padded_tokens").cast("double"), 6))
      .orderBy("strategy")
  }

  // ---------------------------------------------------------------- q152
  /** Content-defined chunking (CDC) — the shift-robust complement to
    * q72's fixed sliding windows: chunk boundaries are declared wherever
    * the hash of the trailing [[CdcWindow]]-word window ≡ 0 (mod
    * [[CdcDiv]]), so a boundary depends only on LOCAL content. Insert a
    * sentence at the top of a document and every q72 chunk shifts (all
    * fingerprints change); CDC boundaries downstream of the edit stay
    * put, so unchanged chunks keep their fingerprints — the property
    * dedup storage systems are built on. Expected chunk length is
    * CdcDiv words. One window pass per doc orders the tokens (boundary
    * flags → running-sum chunk ids), one hash agg fingerprints each
    * chunk, and the final fp_share count is the corpus-wide duplicate
    * signal; output is O(corpus tokens / CdcDiv) rows. */
  val CdcWindow = 3   // boundary decision window, in words
  val CdcDiv = 16     // boundary when window-hash % CdcDiv == 0
  def cdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunksOf(docs(spark, dir))

  /** [[cdcChunks]] over an arbitrary (doc_id, text) frame — the spec
    * entry point for shift-robustness (edit a doc, most fps survive). */
  def cdcChunksOf(docsDf: DataFrame): DataFrame = {
    val spark = docsDf.sparkSession
    val view = s"graft_cdc_docs_t${Thread.currentThread().getId}"
    docsDf.createOrReplaceTempView(view)
    val win = "'cdc:' || words[i-2] || ' ' || words[i-1] || ' ' || words[i]"
    spark.sql(s"""
      WITH d AS (SELECT doc_id, ${wordsExpr("text")} AS words FROM $view),
      w AS (SELECT doc_id, words, posexplode(words) AS (i, word) FROM d),
      b AS (
        SELECT doc_id, i, word,
          CASE WHEN i >= ${CdcWindow - 1}
                 AND ${xhashExpr(win)} % $CdcDiv = 0
               THEN 1 ELSE 0 END AS is_b
        FROM w),
      c AS (
        SELECT doc_id, i, word,
          sum(is_b) OVER (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id
        FROM b),
      g AS (
        SELECT doc_id, chunk_id, count(1) AS n_tokens,
          ${xhashExpr("array_join(transform(array_sort(" +
            "collect_list(struct(i, word))), s -> s.word), ' ')")} AS chunk_fp
        FROM c GROUP BY doc_id, chunk_id)
      SELECT doc_id, chunk_id, n_tokens, chunk_fp,
        count(1) OVER (PARTITION BY chunk_fp) AS fp_share
      FROM g ORDER BY doc_id, chunk_id""")
  }

  def cdcChunksSql: String = {
    val win = "'cdc:' || words[pos-2] || ' ' || words[pos-1] || ' ' || words[pos]"
    s"""
      WITH d AS (SELECT doc_id, ${wordsSql("text")} AS words FROM documents),
      e AS (SELECT doc_id, words,
              unnest(range(1, len(words) + 1))::INT AS pos FROM d),
      b AS (
        SELECT doc_id, pos, words[pos] AS word,
          CASE WHEN pos >= $CdcWindow
                 AND ${xhashSql(win)} % $CdcDiv = 0
               THEN 1 ELSE 0 END AS is_b
        FROM e),
      c AS (
        SELECT doc_id, pos, word,
          CAST(sum(is_b) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS chunk_id
        FROM b),
      g AS (
        SELECT doc_id, chunk_id, count(*) AS n_tokens,
          ${xhashSql("string_agg(word, ' ' ORDER BY pos)")} AS chunk_fp
        FROM c GROUP BY doc_id, chunk_id)
      SELECT doc_id, chunk_id, n_tokens, chunk_fp,
        count(*) OVER (PARTITION BY chunk_fp) AS fp_share
      FROM g ORDER BY doc_id, chunk_id"""
  }

  def padBatchingSql: String = {
    def strat(ranked: String, name: String) = s"""
      SELECT '$name' AS strategy, count(1)::BIGINT AS n_batches,
        sum(st)::BIGINT AS actual_tokens, sum(n * mx)::BIGINT AS padded_tokens
      FROM (
        SELECT (rk - 1) // $PadBatchRows AS batch_id, count(1) AS n,
          max(tok) AS mx, sum(tok) AS st
        FROM $ranked GROUP BY 1)"""
    s"""
    WITH t AS (
      SELECT doc_id, ${tokenCountSql("text")}::BIGINT AS tok FROM documents),
    ar AS (SELECT tok, row_number() OVER (ORDER BY doc_id) AS rk FROM t),
    sr AS (SELECT tok, row_number() OVER (ORDER BY tok DESC, doc_id) AS rk FROM t),
    u AS (${strat("ar", "arrival")} UNION ALL ${strat("sr", "sorted")})
    SELECT strategy, n_batches, actual_tokens, padded_tokens,
      ${droundSql(
        "(padded_tokens - actual_tokens)::DOUBLE / padded_tokens::DOUBLE", 6)}
        AS waste_ratio
    FROM u ORDER BY strategy"""
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(embs(spark, dir), "label", col("vec_id") < 50, IvfK)
      .orderBy("query_id", "rnk")

  // ---------------------------------------------------------------- q166
  /** IVF top-k over LEARNED cells — the production search path q169's
    * audit validates (q84 Lloyd cells: ~5× the recall of the label
    * stand-in at comparable scan): cluster once ([[Similarity
    * .kmeansLloyd]], broadcast-assign per round, corpus never
    * shuffles), then the cell-restricted search of q40 over the learned
    * assignment. The oracle composes the Lloyd replay with the IVF
    * chain — both already proven — so the learned inverted file is
    * hash-gated end to end. */
  def annKmeans(spark: SparkSession, dir: String): DataFrame = {
    val vecs = embs(spark, dir)
    val vk = vecs.select(col("vec_id"), col("embedding"))
      .join(Similarity.kmeansLloyd(vecs, KmK, KmRounds)
        .select(col("vec_id"), col("cell")), "vec_id")
    Similarity.ivfTopK(vk, "cell", col("vec_id") < 50, IvfK)
      .orderBy("query_id", "rnk")
  }

  // ---------------------------------------------------------------- q179
  /** Multi-probe IVF search (nprobe = [[MultiProbe]]) — the production
    * recall knob q169's audit prices: a probe ranks the learned cells
    * by cosine to their member-mean centroids (davg-bridged, so the
    * centroid bits match cross-engine) and searches its
    * [[MultiProbe]] nearest cells instead of one — recall climbs at
    * nprobe/K of the scan cost, which is exactly the trade a
    * billion-vector inverted file tunes. Centroids are K tiny rows
    * (broadcast); cell ranking and the candidate top-k both ride the
    * bounded TopKAgg; the corpus never shuffles. Oracle replays
    * Lloyd → member centroids → cell ranking → search. */
  val MultiProbe = 2

  /** (vk, pcells, results) — the multiprobe internals, exposed so the
    * q169 audit can price the nprobe trade from the same frames. */
  def annMultiprobeParts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import graft.functions.VectorAggregates.topKOf
    val vecs = embs(spark, dir)
    val vk = vecs.select(col("vec_id"), col("embedding"))
      .join(Similarity.kmeansLloyd(vecs, KmK, KmRounds)
        .select(col("vec_id"), col("cell")), "vec_id")
      .transform(graft.core.EngineCache.persisted)
    val cents = vk
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("cell", "dim")
      .agg(graft.core.Determinism.davg(col("x").cast("double"), 8).as("c"))
      .groupBy("cell")
      .agg(expr("transform(array_sort(collect_list(struct(dim, c))), " +
        "s -> CAST(s.c AS FLOAT))").as("cv"))
    val probes = vecs.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pcells = broadcast(probes).join(broadcast(cents))
      .withColumn("ccos", expr(Similarity.cosineExpr("qv", "cv")))
      .groupBy(col("query_id"))
      .agg(topKOf(MultiProbe, col("ccos"), col("cell")).as("top"))
      .select(col("query_id"), explode(col("top.cand_id")).as("cell"))
    val results = pcells
      .join(broadcast(probes), "query_id")
      .join(vk, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(Similarity.cosineExpr("qv", "embedding")))
      .groupBy(col("query_id"))
      .agg(topKOf(IvfK, col("cos"), col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("query_id"), (col("i") + 1).cast("int").as("rnk"),
        col("s.cand_id").as("cand_id"), col("s.cos").as("cos"))
    (vk, pcells, results)
  }

  def annMultiprobe(spark: SparkSession, dir: String): DataFrame =
    annMultiprobeParts(spark, dir)._3.orderBy("query_id", "rnk")

  def annMultiprobeSql: String =
    s"WITH $annMultiprobeCtes" + s"""
      SELECT query_id, rnk, cand_id, cos FROM (
        SELECT query_id, cand_id, cos,
          (row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, cand_id))::INT AS rnk
        FROM sc) r
      WHERE rnk <= $IvfK
      ORDER BY query_id, rnk"""

  /** The multiprobe oracle CTE chain through `pc` (probed cells) and
    * `sc` (scored candidates) — shared with the q169 audit oracle. */
  def annMultiprobeCtes: String = s"""
      akm AS (SELECT vec_id, cell FROM
        (${Similarity.kmeansLloydSql("embeddings", KmK, KmRounds)}) q),
      akv AS (
        SELECT e.vec_id, e.embedding, k.cell
        FROM embeddings e JOIN akm k ON e.vec_id = k.vec_id),
      ce AS (
        SELECT cell, (unnest(range(1, len(embedding) + 1)) - 1)::INT AS dim,
          unnest(embedding) AS x
        FROM akv),
      cd AS (
        SELECT cell, dim, ${graft.core.Determinism.avgSql("x::DOUBLE", 8)} AS c
        FROM ce GROUP BY cell, dim),
      cents AS (
        SELECT cell, list_transform(list(c ORDER BY dim), y -> y::FLOAT) AS cv
        FROM cd GROUP BY cell),
      prb AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id < 50),
      pc AS (
        SELECT query_id, cell FROM (
          SELECT p.query_id, c.cell,
            row_number() OVER (PARTITION BY p.query_id
              ORDER BY ${Similarity.cosineSql("p.qv", "c.cv")} DESC, c.cell)
              AS crn
          FROM prb p CROSS JOIN cents c) z
        WHERE crn <= $MultiProbe),
      sc AS (
        SELECT pc.query_id, v2.vec_id AS cand_id,
          ${Similarity.cosineSql("p.qv", "v2.embedding")} AS cos
        FROM pc
        JOIN prb p ON p.query_id = pc.query_id
        JOIN akv v2 ON v2.cell = pc.cell
        WHERE v2.vec_id <> pc.query_id)"""

  def annKmeansSql: String = s"""
      WITH akm AS (SELECT vec_id, cell FROM
        (${Similarity.kmeansLloydSql("embeddings", KmK, KmRounds)}) q),
      akv AS (
        SELECT e.vec_id, e.embedding, k.cell
        FROM embeddings e JOIN akm k ON e.vec_id = k.vec_id)
      SELECT query_id, cell, rnk, cand_id, cos FROM
        (${Similarity.ivfTopKSql("akv", "cell", "vec_id < 50", IvfK)}) q
      ORDER BY query_id, rnk"""

  def embCentroids(spark: SparkSession, dir: String): DataFrame =
    Similarity.centroids(embs(spark, dir), "label")
      .orderBy("cell", "dim")

  /** Nearest-centroid cell assignment (one Lloyd step) — the k-means side
    * of IVF, making q40's cells computed rather than fixture-given. */
  def ivfAssign(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfAssign(embs(spark, dir), "label")
      .orderBy("vec_id")

  /** Multimodal metadata over binary content (the real imageio decode is
    * the mapPartitions stage — see Multimodal.decodeImages; this is the
    * expression-level plumbing that needs no decoder). */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.withMetadata(
      Multimodal.asMediaTable(docs(spark, dir), "doc_id", "text"))
      .select(col("media_id"), col("byte_len"), col("header_hex"),
        col("content_md5"), array_join(col("frame_sample"), ":").as("frames"))
      .orderBy("media_id")

  /** Spearman rank correlation between document length (tokens) and
    * quality score, per language — does the quality signal just re-rank
    * by length? Rank correlation is the distribution-free way to ask, and
    * with strict ranks (row_number, doc_id tiebreak — documented variant
    * of tie-averaged Spearman) every intermediate is an INTEGER: rank
    * differences, their squares, and Σd² are exact in int64, so
    * ρ = 1 − 6Σd²/(n(n²−1)) is one identical-double expression at the
    * end — no fp accumulation anywhere. Two keyed window sorts + one
    * tiny aggregate; each language ranks independently at any scale. */
  def rankCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val tokens = tokenCount("text").cast("double")
    val punctR = punctCount("text").cast("double") / length(col("text"))
    val stopR = lexiconHits("text", EnglishStopwords).cast("double") / tokens
    val score = dround(
      least(tokens / 100.0, lit(1.0)) * 0.4 + (lit(1.0) - punctR) * 0.3 + stopR * 0.3, 6)
    val wx = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("x"), col("doc_id"))
    val wy = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("y"), col("doc_id"))
    docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        tokenCount("text").as("x"), score.as("y"))
      .withColumn("rx", row_number().over(wx).cast("long"))
      .withColumn("ry", row_number().over(wy).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("rx") - col("ry")) * (col("rx") - col("ry"))).as("sd2"))
      .select(col("lang"), col("n_docs"),
        dround(lit(1.0) - (lit(6.0) * col("sd2")) /
          (col("n_docs") * (col("n_docs") * col("n_docs") - 1)), 6)
          .as("spearman"))
      .orderBy("lang")
  }

  /** Int8 embedding quantization: symmetric per-vector scale
    * (max|x|/127), quantize-round-clamp, and reconstruction-error metrics
    * (max abs error, MSE, saturated-lane count) — the 4× storage/bandwidth
    * reduction step before ANN serving. Pure codegen'd array expressions
    * (transform/zip_with/aggregate) over one scan, no shuffle; every
    * arithmetic step is float→double then identical IEEE ops in both
    * engines, so even the quantized lanes are oracle-exact. */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    val quant = "transform(e, x -> least(greatest(round(x / scale), -127.0D), 127.0D))"
    embs(spark, dir)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .selectExpr("vec_id", "e",
        "array_max(transform(e, x -> abs(x))) AS amax")
      .selectExpr("vec_id", "e",
        "CASE WHEN amax = 0.0D THEN 1.0D ELSE amax / 127.0D END AS scale")
      .selectExpr("vec_id", "e", "scale", s"$quant AS qv")
      .select(col("vec_id"),
        dround(col("scale"), 8).as("scale"),
        expr("CAST(size(filter(qv, v -> abs(v) = 127.0D)) AS INT)").as("n_saturated"),
        dround(expr(
          "array_max(zip_with(e, qv, (x, q) -> abs(x - q * scale)))"), 8)
          .as("max_abs_err"),
        dround(expr(
          "aggregate(zip_with(e, qv, (x, q) -> (x - q * scale) * (x - q * scale)), " +
            "CAST(0.0 AS DOUBLE), (a, v) -> a + v) / size(e)"), 10).as("mse"))
      .orderBy("vec_id")
  }

  /** Array higher-order functions over embeddings (transform/filter/
    * aggregate/zip_with coverage with exact outputs). */
  def arrayOps(spark: SparkSession, dir: String): DataFrame =
    embs(spark, dir).select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      expr("CAST(size(filter(embedding, x -> x > 0)) AS INT)").as("n_pos"),
      dround(expr(
        "aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"), 6)
        .as("sum_elems"),
      dround(expr("CAST(array_max(embedding) AS DOUBLE)"), 6).as("max_elem"),
      dround(expr("CAST(array_min(embedding) AS DOUBLE)"), 6).as("min_elem"))
      .orderBy("vec_id")

  // ---------------------------------------------------------------- q138
  /** BPE-ish token-count estimate — the budget number every packing /
    * mixture / pricing decision needs BEFORE a real tokenizer runs:
    * split into GPT-2-style pieces (letter runs | single digits |
    * single punctuation — whitespace never tokenizes), then estimate
    * subwords as ⌈len/4⌉ per letter run (the "~4 chars per BPE token"
    * rule of thumb) and 1 per digit/punct piece. Pure string ops on an
    * ASCII-safe regex whose alternation resolves identically under
    * Java's leftmost-first and RE2's leftmost-longest (the letter-run
    * branch IS the longest match), so the counts hash-match exactly.
    * One projection, codegen'd, no UDF. */
  val BpePieceRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  def bpeTokens(spark: SparkSession, dir: String): DataFrame = {
    docs(spark, dir).createOrReplaceTempView("documents")
    spark.sql(s"""
      WITH p AS (
        SELECT doc_id,
          regexp_extract_all(text, '$BpePieceRe', 0) AS pieces
        FROM documents)
      SELECT doc_id,
        CAST(size(pieces) AS BIGINT) AS n_pieces,
        CAST(aggregate(
          transform(pieces, x -> CAST(ceil(length(x) / 4.0) AS BIGINT)),
          CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT) AS n_subtokens
      FROM p ORDER BY doc_id""")
  }

  def bpeTokensSql: String = s"""
    WITH p AS (
      SELECT doc_id,
        regexp_extract_all(text, '$BpePieceRe') AS pieces
      FROM documents)
    SELECT doc_id,
      CAST(len(pieces) AS BIGINT) AS n_pieces,
      CAST(coalesce(list_sum(
        list_transform(pieces, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))),
        0) AS BIGINT) AS n_subtokens
    FROM p ORDER BY doc_id"""

  // ---------------------------------------------------------------- q139
  /** Per-source corpus card — the dataset-documentation aggregate every
    * training-mixture decision reads: document and character volume,
    * mean quality (the q31 composite, decimal-bridged through the
    * order-free average), English share, and the exact within-source
    * duplicate rate (1 − distinct fingerprints / docs — md5 is
    * cross-engine identical). One hash aggregate over one scan; output
    * is O(|sources|) at any corpus size. */
  def sourceReport(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).groupBy(col("source")).agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(length(col("text"))).cast("long").as("total_chars"),
        davg(qualityCol, 6).as("mean_quality"),
        dround(sum(when(col("lang") === "en", 1).otherwise(0)).cast("double") /
          count(lit(1)), 6).as("en_share"),
        dround(lit(1.0) - countDistinct(md5(col("text"))).cast("double") /
          count(lit(1)), 6).as("dup_rate"))
      .orderBy("source")

  def sourceReportSql: String = s"""
    SELECT source,
      CAST(count(1) AS BIGINT) AS n_docs,
      CAST(sum(length(text)) AS BIGINT) AS total_chars,
      ${avgSql(qualitySql, 6)} AS mean_quality,
      ${droundSql(
        "CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)" +
          " / count(1)", 6)} AS en_share,
      ${droundSql(
        "1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(1)",
        6)} AS dup_rate
    FROM documents GROUP BY source ORDER BY source"""

  // ---------------------------------------------------------------- q140
  /** Query-level media decode: render one REAL 8×8 grayscale PNG per
    * embedding row (64 dims → pixel bytes, encoded with JDK imageio
    * inside the same per-partition batch contract production ingest
    * uses), then run [[Multimodal.decodeImages]] over the bytes and
    * report dimensions + channel means. Self-contained on purpose: the
    * fixture corpus carries no image column, and synthesizing the PNGs
    * in-query exercises the encode AND decode halves of the codec path
    * on every row.
    *
    * Fully oracle-gated: pixels are written as RAW raster samples
    * (`setSample`, not `setRGB` — which would route through an
    * sRGB→gray colorspace conversion and destroy the arithmetic
    * identity), PNG is lossless, and the decode side reads raw raster
    * bands, so `mean_luma` is a pure double-arithmetic function of the
    * embedding that DuckDB replicates bit-for-bit: pixel v_i =
    * clamp(floor(e_i*127+128+0.5), 0, 255), mean = Σv / (64·255). */
  /** Render each embedding row as a REAL 8×8 gray PNG via raw raster
    * writes (q140's lossless contract) — the shared media fixture for
    * the codec queries (q140 decode, q155 perceptual hash). */
  private def renderMedia(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(Multimodal.mediaSchema)
    embs(spark, dir).select(col("vec_id"), col("embedding"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val e = r.getSeq[Float](1)
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val ras = img.getRaster
          var i = 0
          while (i < 64) {
            val v = if (i < e.length)
              math.max(0, math.min(255,
                math.floor(e(i).toDouble * 127.0 + 128.0 + 0.5).toInt))
            else 0
            ras.setSample(i % 8, i / 8, 0, v)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val b = bos.toByteArray
          org.apache.spark.sql.Row(id, b, "image/png", b.length)
        }
      }(enc)
  }

  // ---------------------------------------------------------------- q156
  /** Vocabulary coverage ladder — the tokenizer-engineering readout:
    * for each min-count threshold k, how many distinct words survive a
    * "drop words seen < k times" vocabulary cut, and what share of ALL
    * token occurrences they still cover. The Zipf shape of the answer
    * (tiny vocab ⇒ still-high coverage) is what justifies truncated
    * vocabularies. Deliberately RANK-FREE: thresholding on the count
    * needs only one explode + one hash agg + ONE conditional-aggregation
    * pass over the vocab (all thresholds in one scan, unpivoted after) —
    * no global sort of a 100M-row vocabulary anywhere. Exact integers
    * until the final share. */
  val VocabMinCounts = Seq(1, 2, 4, 8, 16, 32, 64, 128)
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    docs(spark, dir).createOrReplaceTempView("documents")
    val aggs = VocabMinCounts.map(k =>
      s"CAST(count(CASE WHEN c >= $k THEN 1 END) AS BIGINT) AS v$k, " +
      s"CAST(coalesce(sum(CASE WHEN c >= $k THEN c END), 0) AS BIGINT) AS s$k")
      .mkString(", ")
    val stack = VocabMinCounts.map(k => s"$k, v$k, s$k").mkString(", ")
    spark.sql(s"""
      WITH cnt AS (
        SELECT term, count(1) AS c
        FROM (SELECT explode(${wordsExpr("text")}) AS term FROM documents)
        GROUP BY term),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt),
      agg AS (SELECT $aggs FROM cnt),
      u AS (
        SELECT stack(${VocabMinCounts.length}, $stack)
          AS (min_count, vocab_size, covered_tokens)
        FROM agg)
      SELECT min_count, vocab_size, covered_tokens,
        ${droundSql(
          "CAST(covered_tokens AS DOUBLE) / CAST(total AS DOUBLE)", 6)}
          AS coverage
      FROM u CROSS JOIN tot
      ORDER BY min_count""")
  }

  def vocabCoverageSql: String = {
    val ks = VocabMinCounts.map(k => s"($k)").mkString(",")
    s"""
      WITH cnt AS (
        SELECT term, count(*) AS c
        FROM (SELECT unnest(${wordsSql("text")}) AS term FROM documents)
        GROUP BY term),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt),
      ks(min_count) AS (VALUES $ks),
      agg AS (
        SELECT k.min_count,
          (count(*) FILTER (WHERE c >= k.min_count))::BIGINT AS vocab_size,
          coalesce(sum(c) FILTER (WHERE c >= k.min_count), 0)::BIGINT
            AS covered_tokens
        FROM cnt CROSS JOIN ks k GROUP BY k.min_count)
      SELECT min_count, vocab_size, covered_tokens,
        ${droundSql("covered_tokens::DOUBLE / total::DOUBLE", 6)} AS coverage
      FROM agg CROSS JOIN tot
      ORDER BY min_count"""
  }

  // ---------------------------------------------------------------- q157
  /** Near-dup cluster size histogram — the dedup health readout (a spike
    * of large clusters means template spam or a mirror dump; a corpus of
    * pairs-only means organic duplication): connected components over
    * the q144 AT-REST pair table rolled up to (cluster size →
    * n_clusters, n_docs). Output is O(max cluster size) rows at any
    * corpus scale, and the expensive leg (the pair table) is read from
    * the warehouse, not recomputed. */
  def dupClusterSizes(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(lshPairsAtRest(spark, dir))
      .groupBy(col("component")).agg(count(lit(1)).as("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("size"), col("n_clusters"),
        (col("size") * col("n_clusters")).as("n_docs"))
      .orderBy("size")

  def dupClusterSizesSql: String = s"""
    WITH comp AS (${Dedup.componentsSql(
      Dedup.minhashLshPairsSql("documents", "doc_id", "text",
        WordShingleN, MinhashK, MinhashBands, MinhashTau, "id_a, id_b"),
      "doc_id")}),
    cs AS (SELECT component, count(*) AS size FROM comp GROUP BY component)
    SELECT size::BIGINT AS size, count(*)::BIGINT AS n_clusters,
      (size * count(*))::BIGINT AS n_docs
    FROM cs GROUP BY size ORDER BY size"""

  // ---------------------------------------------------------------- q155
  /** Perceptual-hash near-dup detection over REAL decoded pixels — the
    * multimodal mirror of q36's SimHash text dedup: render → PNG →
    * decode → 63-bit aHash ([[Multimodal.aHashes]], raw raster reads) →
    * pigeonhole-blocked Hamming self-join (the same guaranteed-recall
    * block machinery as SimHash, [[Dedup.simhashPairsFromSigs]]). A
    * byte hash breaks on any re-encode; the perceptual hash survives
    * re-encodes and small edits, which is what image dedup needs. The
    * oracle needs no codec: q140 proves the decoded pixels are pure
    * arithmetic over the embedding, so DuckDB replays pixel → luma →
    * threshold → hash → all-pairs bit_count exactly — the hash match
    * certifies both the codec path and the blocking's zero recall loss.
    * Note the honest scale caveat: at maxHamming 16 on 63 bits the
    * pigeonhole blocks are 3-4 bits wide, so block selectivity carries
    * less than at q36's production-shaped threshold (3 over 60 bits) —
    * real image corpora cluster, which is what makes the blocks pay. */
  val PhashMaxHamming = 16
  def phashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Multimodal.aHashes(spark, renderMedia(spark, dir))
      .filter(col("decode_ok"))
      .select(col("media_id").as("id"), col("phash").as("sig"))
      .transform(graft.core.EngineCache.persisted)
    Dedup.simhashPairsFromSigs(sigs, PhashMaxHamming, sigBits = 63)
      .orderBy("id_a", "id_b")
  }

  def phashPairsSql: String = s"""
    WITH px AS (
      SELECT vec_id, list_transform(embedding, x ->
        LEAST(255, GREATEST(0,
          CAST(floor(CAST(x AS DOUBLE) * 127.0 + 128.0 + 0.5) AS BIGINT)))) AS p
      FROM embeddings),
    st AS (SELECT vec_id, p, list_sum(p) AS s FROM px),
    ph AS (
      SELECT vec_id,
        CAST(coalesce(list_sum(list_transform(range(1, 64), i ->
          CASE WHEN 64 * p[i] > s THEN (1::BIGINT << (i - 1))
               ELSE 0 END)), 0) AS BIGINT) AS phash
      FROM st)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM ph a JOIN ph b ON a.vec_id < b.vec_id
    WHERE bit_count(xor(a.phash, b.phash)) <= $PhashMaxHamming
    ORDER BY id_a, id_b"""

  def mediaDecode(spark: SparkSession, dir: String): DataFrame = {
    Multimodal.decodeImages(spark, renderMedia(spark, dir))
      .select(col("media_id").as("vec_id"), col("decode_ok"),
        col("width"), col("height"), col("channels"),
        dround(element_at(col("features"), 4).cast("double"), 6).as("mean_luma"))
      .orderBy("vec_id")
  }

  /** DuckDB twin of [[mediaDecode]]: the PNG round-trip is lossless and
    * the decode reads raw samples, so the expected output is plain
    * arithmetic over the embedding — no image codec needed. The cast
    * chain (DOUBLE division → FLOAT → DOUBLE → dround) mirrors the
    * Spark side's exact-integer-sum / FloatType-features / dround path. */
  def mediaDecodeSql: String = s"""
    SELECT vec_id,
      true AS decode_ok,
      8 AS width, 8 AS height, 1 AS channels,
      ${droundSql(
        "CAST(CAST(CAST(list_sum(list_transform(embedding, x -> " +
          "LEAST(255, GREATEST(0, CAST(floor(CAST(x AS DOUBLE) * 127.0" +
          " + 128.0 + 0.5) AS INTEGER))))) AS DOUBLE) / 16320.0" +
          " AS FLOAT) AS DOUBLE)", 6)} AS mean_luma
    FROM embeddings ORDER BY vec_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_bpe_tokens"     -> bpeTokens _,
    "q139_source_report"  -> sourceReport _,
    "q140_media_decode"   -> mediaDecode _,
    "q141_bloom_persist"  -> bloomPersist _,
    "q142_leakage_split"  -> leakageSplit _,
    "q143_source_contam"  -> sourceContamination _,
    "q144_lsh_pair_table" -> lshPairTable _,
    "q145_incremental_dedup" -> incrementalDedup _,
    "q147_ann_filtered"   -> annFiltered _,
    "q148_pad_batching"   -> padBatching _,
    "q152_cdc_chunks"     -> cdcChunks _,
    "q155_phash_neardup"  -> phashPairs _,
    "q156_vocab_coverage" -> vocabCoverage _,
    "q157_dup_clusters"   -> dupClusterSizes _,
    "q158_hard_negatives" -> hardNegativeMining _,
    "q159_blocking_audit" -> blockingAudit _,
    "q160_dedup_impact"   -> dedupImpact _,
    "q161_mixture_plan"   -> mixturePlan _,
    "q162_substring_dedup" -> substringDedup _,
    "q165_curriculum_order" -> curriculumOrder _,
    "q166_ann_kmeans"     -> annKmeans _,
    "q179_ivf_multiprobe" -> annMultiprobe _,
    "q168_dedup_clean"    -> dedupClean _,
    "q171_span_increment" -> spanIncrement _,
    "q173_bpe_merges"     -> bpeMerges _,
    "q182_bpe_train"      -> bpeTrain _,
    "q183_bpe_tokenize"   -> bpeTokenize _,
    "q184_intradoc_dedup" -> intradocDedup _,
    "q185_epoch_shuffle"  -> epochShuffle _,
    "q186_skipgram_negs"  -> skipgramNegatives _,
    "q188_script_profile" -> scriptProfile _,
    "q189_gram_novelty"   -> gramNovelty _,
    "q190_corpus_funnel"  -> corpusFunnel _,
    "q192_dedup_tau_sweep" -> dedupTauSweep _,
    "q176_source_jaccard" -> sourceJaccard _,
    "q30_text_stats"      -> textStats _,
    "q31_quality_score"   -> qualityScore _,
    "q32_langid"          -> langIdQuery _,
    "q33_fingerprint"     -> fingerprint _,
    "q34_dedup_exact"     -> dedupExact _,
    "q35_dedup_minhash"   -> dedupMinhash _,
    "q36_dedup_simhash"   -> dedupSimhash _,
    "q37_dedup_ngram"     -> dedupCharNgram _,
    "q38_embed_near_dup"  -> embedNearDup _,
    "q39_ann_bruteforce"  -> annBruteForce _,
    "q40_ann_ivf"         -> annIvf _,
    "q41_emb_centroids"   -> embCentroids _,
    "q42_multimodal_meta" -> multimodalMeta _,
    "q43_array_ops"       -> arrayOps _,
    "q51_dedup_components" -> dedupComponents _,
    "q52_ivf_assign"      -> ivfAssign _,
    "q54_embed_srp_topk"  -> embedSrpPairs _,
    "q55_quota_sample"    -> quotaSample _,
    "q56_repetition_stats" -> repetitionStats _,
    "q57_novel_docs"      -> novelDocs _,
    "q59_sequence_packing" -> packDocs _,
    "q60_token_deciles"   -> tokenDeciles _,
    "q62_bloom_novel_docs" -> novelDocsBloom _,
    "q63_decontaminate"   -> decontaminate _,
    "q64_normalize_text"  -> normalizeText _,
    "q65_minhash_estimate" -> ((s: SparkSession, d: String) =>
      Dedup.minhashEstimatePairs(docs(s, d), "doc_id", "text",
        WordShingleN, MinhashK, MinhashBands, MinhashTau)
        .orderBy("id_a", "id_b")),
    "q66_mixture_upsample" -> mixtureUpsample _,
    "q67_term_stats"      -> termStats _,
    "q72_doc_chunks"      -> docChunks _,
    "q73_tfidf_terms"     -> tfidfTerms _,
    "q74_dedup_corpus"    -> dedupCorpus _,
    "q76_components_star" -> dedupComponentsStar _,
    "q77_embed_quantize"  -> embedQuantize _,
    "q78_rank_correlation" -> rankCorrelation _,
    "q81_chunk_containment" -> chunkContainment _,
    "q82_doc_rarity"      -> docRarity _,
    "q83_pii_redact"      -> piiRedact _,
    "q84_kmeans_lloyd"    -> ((s: SparkSession, d: String) =>
      Similarity.kmeansLloyd(embs(s, d), KmK, KmRounds))
  )

  /** Shared by q57 and q62 — the bloom path is result-identical to the
    * exact anti-join BY CONSTRUCTION, so one oracle string serves both. */
  private val novelDocsOracle: String = s"""
      SELECT doc_id, fp FROM (
        SELECT doc_id, ${bagFingerprintSql("text")} AS fp
        FROM documents WHERE source = '$BatchSource') b
      WHERE NOT EXISTS (
        SELECT 1 FROM (
          SELECT ${bagFingerprintSql("text")} AS fp
          FROM documents WHERE source <> '$BatchSource') c
        WHERE c.fp = b.fp)
      ORDER BY doc_id"""

  val oracles: Map[String, String] = Map(
    "q138_bpe_tokens" -> bpeTokensSql,
    "q139_source_report" -> sourceReportSql,
    "q140_media_decode" -> mediaDecodeSql,
    "q141_bloom_persist" -> bloomPersistSql,
    "q142_leakage_split" -> leakageSplitSql,
    "q143_source_contam" -> sourceContaminationSql,
    // q144 persists exactly the q35 pair set; the oracle replays the
    // full signature pipeline, proving the at-rest bytes lost nothing
    "q144_lsh_pair_table" -> Dedup.minhashLshPairsSql(
      "documents", "doc_id", "text",
      WordShingleN, MinhashK, MinhashBands, MinhashTau, "id_a, id_b"),
    "q145_incremental_dedup" -> Dedup.incrementalLshPairsSql(
      "documents", "doc_id", "text", s"source = '$BatchSource'",
      WordShingleN, MinhashK, MinhashBands, MinhashTau),
    "q30_text_stats" -> s"""
      SELECT doc_id,
        length(text)::INT AS n_chars_actual,
        ${tokenCountSql("text")} AS n_tokens,
        ${bpeTokenCountSql("text")} AS n_bpe_tokens,
        ${punctCountSql("text")} AS n_punct,
        ${lexiconHitsSql("text", EnglishStopwords)} AS n_stopwords,
        ${droundSql(
          s"${lexiconHitsSql("text", EnglishStopwords)}::DOUBLE / ${tokenCountSql("text")}", 6)}
          AS stopword_ratio
      FROM documents ORDER BY doc_id""",
    "q31_quality_score" -> {
      val tokens = s"${tokenCountSql("text")}::DOUBLE"
      val punctR = s"${punctCountSql("text")}::DOUBLE / length(text)"
      val stopR = s"${lexiconHitsSql("text", EnglishStopwords)}::DOUBLE / ($tokens)"
      val score = droundSql(
        s"least($tokens / 100.0, 1.0) * 0.4 + (1.0 - ($punctR)) * 0.3 + ($stopR) * 0.3", 6)
      s"""
      SELECT doc_id, $score AS quality,
        CASE WHEN $score >= 0.5 THEN 'high'
             WHEN $score >= 0.35 THEN 'medium' ELSE 'low' END AS quality_class
      FROM documents ORDER BY doc_id"""
    },
    "q32_langid" -> s"""
      SELECT doc_id, ${langIdSql("text")} AS lang_guess, lang AS lang_label
      FROM documents ORDER BY doc_id""",
    "q33_fingerprint" -> s"""
      SELECT doc_id,
        ${contentFingerprintSql("text")} AS content_fp,
        ${bagFingerprintSql("text")} AS bag_fp
      FROM documents ORDER BY doc_id""",
    "q34_dedup_exact" -> s"""
      SELECT fp, min(doc_id) AS keep_id, count(1) AS n_copies
      FROM (SELECT doc_id, ${bagFingerprintSql("text")} AS fp FROM documents)
      GROUP BY fp HAVING count(1) > 1
      ORDER BY fp""",
    "q35_dedup_minhash" -> Dedup.minhashLshPairsSql("documents", "doc_id", "text",
      WordShingleN, MinhashK, MinhashBands, MinhashTau, "id_a, id_b"),
    "q36_dedup_simhash" -> Dedup.simhashPairsSql("documents", "doc_id", "text",
      SimhashMaxHamming, "id_a, id_b"),
    "q37_dedup_ngram" -> Dedup.charNgramPairsSql("documents", "doc_id", "text",
      CharNgramN, CharHashK, CharBands, CharTau, "id_a, id_b"),
    "q38_embed_near_dup" -> Similarity.cosineNearDupPairsSql("embeddings", "label", EmbTau),
    "q39_ann_bruteforce" -> Similarity.bruteForceTopKSql("embeddings", "vec_id < 20", BruteK),
    "q147_ann_filtered" -> Similarity.filteredTopKSql(
      "embeddings", "vec_id < 10", FilteredCandWhere, BruteK),
    "q148_pad_batching" -> padBatchingSql,
    "q152_cdc_chunks" -> cdcChunksSql,
    "q155_phash_neardup" -> phashPairsSql,
    "q156_vocab_coverage" -> vocabCoverageSql,
    "q157_dup_clusters" -> dupClusterSizesSql,
    "q158_hard_negatives" -> Similarity.hardNegativesSql(
      "embeddings", "vec_id < 10", BruteK),
    "q159_blocking_audit" -> Dedup.blockingAuditSql(
      "documents", "doc_id", "text", WordShingleN, MinhashK, MinhashBands,
      SimhashMaxHamming, StatsOps.SurvivorHeadWords, MinhashTau,
      s"doc_id < $AuditSampleCap"),
    "q160_dedup_impact" -> dedupImpactSql,
    "q161_mixture_plan" -> mixturePlanOracleSql,
    "q162_substring_dedup" -> substringDedupSql,
    "q165_curriculum_order" -> curriculumOrderSql,
    "q166_ann_kmeans" -> annKmeansSql,
    "q179_ivf_multiprobe" -> annMultiprobeSql,
    "q168_dedup_clean" -> dedupCleanSql,
    "q171_span_increment" -> spanIncrementSql,
    "q173_bpe_merges" -> bpeMergesSql,
    "q182_bpe_train" -> bpeTrainSql,
    "q183_bpe_tokenize" -> bpeTokenizeSql,
    "q184_intradoc_dedup" -> intradocDedupSql,
    "q185_epoch_shuffle" -> epochShuffleSql,
    "q186_skipgram_negs" -> skipgramNegativesSql,
    "q188_script_profile" -> scriptProfileSql,
    "q189_gram_novelty" -> gramNoveltySql,
    "q190_corpus_funnel" -> corpusFunnelSql,
    "q192_dedup_tau_sweep" -> dedupTauSweepSql,
    "q176_source_jaccard" -> sourceJaccardSql,
    "q40_ann_ivf" -> Similarity.ivfTopKSql("embeddings", "label", "vec_id < 50", IvfK),
    "q41_emb_centroids" -> Similarity.centroidsSql("embeddings", "label"),
    "q42_multimodal_meta" -> """
      SELECT doc_id AS media_id,
        octet_length(encode(text))::INT AS byte_len,
        substr(hex(encode(text)), 1, 16) AS header_hex,
        md5(text) AS content_md5,
        array_to_string(list_transform(range(0, 4),
          i -> substr(hex(encode(text)), i * 32 + 1, 2)), ':') AS frames
      FROM documents ORDER BY media_id""",
    "q52_ivf_assign" -> Similarity.ivfAssignSql("embeddings", "label"),
    "q55_quota_sample" -> {
      val tokens = s"${tokenCountSql("text")}::DOUBLE"
      val punctR = s"${punctCountSql("text")}::DOUBLE / length(text)"
      val stopR = s"${lexiconHitsSql("text", EnglishStopwords)}::DOUBLE / ($tokens)"
      val score = droundSql(
        s"least($tokens / 100.0, 1.0) * 0.4 + (1.0 - ($punctR)) * 0.3 + ($stopR) * 0.3", 6)
      s"""
      SELECT doc_id, lang, quality, rk FROM (
        SELECT doc_id, lang, $score AS quality,
          (row_number() OVER (PARTITION BY lang
             ORDER BY $score DESC, doc_id))::INT AS rk
        FROM documents)
      WHERE rk <= $QuotaPerLang
      ORDER BY lang, rk"""
    },
    "q54_embed_srp_topk" -> Similarity.srpTopPairsSql("embeddings",
      SrpBits, SrpBands, SrpTopK, EmbDims),
    "q51_dedup_components" -> Dedup.componentsSql(
      Dedup.minhashLshPairsSql("documents", "doc_id", "text",
        WordShingleN, MinhashK, MinhashBands, MinhashTau, "id_a, id_b"),
      "doc_id"),
    // identical result to q51 by design — two algorithms, one contract
    "q76_components_star" -> Dedup.componentsSql(
      Dedup.minhashLshPairsSql("documents", "doc_id", "text",
        WordShingleN, MinhashK, MinhashBands, MinhashTau, "id_a, id_b"),
      "doc_id"),
    "q56_repetition_stats" -> s"""
      WITH w AS (
        SELECT doc_id, ${wordsSql("text")} AS w FROM documents),
      uni AS (
        SELECT doc_id, len(w) AS n_words, unnest(w) AS t FROM w),
      uc AS (
        SELECT doc_id, n_words, t, count(*) AS n FROM uni GROUP BY 1, 2, 3),
      us AS (
        SELECT doc_id, n_words, count(*) AS n_distinct, max(n) AS top_word_n
        FROM uc GROUP BY 1, 2),
      big AS (
        SELECT doc_id, unnest(CASE WHEN len(w) >= 2
          THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
          ELSE [] END) AS t FROM w),
      bc AS (SELECT doc_id, t, count(*) AS n FROM big GROUP BY 1, 2),
      bs AS (SELECT doc_id, max(n) AS top_bigram_n FROM bc GROUP BY 1)
      SELECT us.doc_id, n_words::INT AS n_words, n_distinct::INT AS n_distinct,
        top_word_n::INT AS top_word_n,
        coalesce(top_bigram_n, 0)::INT AS top_bigram_n,
        ${droundSql("n_distinct::DOUBLE / n_words", 6)} AS distinct_ratio,
        ${droundSql("top_word_n::DOUBLE / n_words", 6)} AS top_word_frac,
        ${droundSql(
          "coalesce(top_bigram_n, 0)::DOUBLE / greatest(n_words - 1, 1)", 6)}
          AS top_bigram_frac
      FROM us LEFT JOIN bs ON us.doc_id = bs.doc_id
      ORDER BY us.doc_id""",
    "q57_novel_docs" -> novelDocsOracle,
    "q59_sequence_packing" -> Packing.packGreedySql("documents", "doc_id",
      "text", "lang", PackCapacity, PackShards, "lang, shard, doc_id"),
    // identical result to q57 by design — the bloom is a pre-filter with
    // no false negatives, so the oracle is the same shared NOT EXISTS
    "q62_bloom_novel_docs" -> novelDocsOracle,
    "q63_decontaminate" -> s"""
      WITH sh AS (
        SELECT doc_id, source,
          unnest(${wordShinglesSql("text", DecontamN)}) AS s
        FROM documents),
      es AS (SELECT DISTINCT s FROM sh WHERE source = '$EvalSource'),
      cs AS (SELECT doc_id, s FROM sh WHERE source <> '$EvalSource')
      SELECT cs.doc_id, count(DISTINCT cs.s) AS n_shared
      FROM cs JOIN es USING (s)
      GROUP BY cs.doc_id
      ORDER BY cs.doc_id""",
    "q65_minhash_estimate" -> Dedup.minhashEstimatePairsSql("documents",
      "doc_id", "text", WordShingleN, MinhashK, MinhashBands, MinhashTau,
      "id_a, id_b"),
    "q66_mixture_upsample" -> {
      val gate = s"${xhashSql("'mix:' || doc_id::VARCHAR")} % 100"
      val nRepeats = mixParts.map { case (l, base, fracPct) =>
        s"WHEN '$l' THEN $base + (CASE WHEN $gate < $fracPct THEN 1 ELSE 0 END)"
      }.mkString("CASE lang ", " ", " ELSE 1 END")
      s"""
      SELECT doc_id, lang, n_repeats,
        unnest(range(1, n_repeats + 1))::INT AS copy_idx
      FROM (SELECT doc_id, lang, ($nRepeats)::INT AS n_repeats FROM documents)
      ORDER BY doc_id, copy_idx"""
    },
    "q67_term_stats" -> s"""
      SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
      FROM (SELECT doc_id, unnest(${wordsSql("text")}) AS term FROM documents)
      GROUP BY term
      ORDER BY tf DESC, term
      LIMIT $TermTopK""",
    "q64_normalize_text" -> {
      val norm = "trim(regexp_replace(regexp_replace(lower(text), " +
        "'[[:punct:]]', ' ', 'g'), '\\s+', ' ', 'g'))"
      s"""
      SELECT doc_id, $norm AS norm_text,
        length($norm)::INT AS norm_len,
        ${graft.core.Determinism.xhashSql(norm)} AS norm_fp
      FROM documents ORDER BY doc_id"""
    },
    "q60_token_deciles" -> s"""
      SELECT lang, decile, count(*) AS n_docs,
        min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
      FROM (
        SELECT lang, doc_id, ${tokenCountSql("text")} AS n_tokens,
          (ntile(10) OVER (PARTITION BY lang
             ORDER BY ${tokenCountSql("text")}, doc_id))::INT AS decile
        FROM documents)
      GROUP BY lang, decile
      ORDER BY lang, decile""",
    "q43_array_ops" -> s"""
      SELECT vec_id,
        len(embedding)::INT AS dim,
        len(list_filter(embedding, x -> x > 0))::INT AS n_pos,
        ${droundSql("list_sum(list_transform(embedding, x -> x::DOUBLE))", 6)} AS sum_elems,
        ${droundSql("list_max(embedding)::DOUBLE", 6)} AS max_elem,
        ${droundSql("list_min(embedding)::DOUBLE", 6)} AS min_elem
      FROM embeddings ORDER BY vec_id""",
    "q72_doc_chunks" -> {
      val slice = s"list_slice(w, chunk_id * $ChunkStride + 1, " +
        s"chunk_id * $ChunkStride + $ChunkTokens)"
      s"""
      WITH base AS (
        SELECT doc_id, ${wordsSql("text")} AS w FROM documents),
      sized AS (
        SELECT doc_id, w, len(w) AS n_words,
          greatest(0, floor((len(w) - $ChunkTokens + $ChunkStride - 1)
            / $ChunkStride)::INT) AS k
        FROM base),
      chunks AS (
        SELECT doc_id, w, unnest(range(0, k + 1))::INT AS chunk_id FROM sized)
      SELECT doc_id, chunk_id,
        len($slice)::INT AS n_tokens,
        ${xhashSql(s"array_to_string($slice, ' ')")} AS chunk_fp
      FROM chunks
      ORDER BY doc_id, chunk_id"""
    },
    "q73_tfidf_terms" -> s"""
      WITH terms AS (
        SELECT doc_id, unnest(${wordsSql("text")}) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(1) AS tf FROM terms GROUP BY 1, 2),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
      n AS (SELECT count(1) AS n_docs FROM documents)
      SELECT doc_id, rk, term, tf, df, tfidf FROM (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
          ${droundSql("tf.tf * ln((n.n_docs + 1)::DOUBLE / (df.df + 1))", 6)}
            AS tfidf,
          (row_number() OVER (PARTITION BY tf.doc_id ORDER BY
            ${droundSql("tf.tf * ln((n.n_docs + 1)::DOUBLE / (df.df + 1))", 6)}
              DESC, tf.term))::INT AS rk
        FROM tf JOIN df USING (term) CROSS JOIN n)
      WHERE rk <= $TfidfTopK
      ORDER BY doc_id, rk""",
    "q74_dedup_corpus" -> s"""
      $dedupSurvivorsOracleCtes
      SELECT doc_id, fp FROM surv
      ORDER BY doc_id""",
    "q78_rank_correlation" -> {
      val tokens = s"${tokenCountSql("text")}::DOUBLE"
      val punctR = s"${punctCountSql("text")}::DOUBLE / length(text)"
      val stopR = s"${lexiconHitsSql("text", EnglishStopwords)}::DOUBLE / ($tokens)"
      val score = droundSql(
        s"least($tokens / 100.0, 1.0) * 0.4 + (1.0 - ($punctR)) * 0.3 + ($stopR) * 0.3", 6)
      s"""
      WITH b AS (
        SELECT doc_id, lang, ${tokenCountSql("text")} AS x, $score AS y
        FROM documents),
      r AS (
        SELECT lang,
          row_number() OVER (PARTITION BY lang ORDER BY x, doc_id) AS rx,
          row_number() OVER (PARTITION BY lang ORDER BY y, doc_id) AS ry
        FROM b)
      SELECT lang, count(1) AS n_docs,
        ${droundSql(
          "1.0 - (6.0 * sum((rx - ry) * (rx - ry))) / (count(1) * (count(1) * count(1) - 1))", 6)}
          AS spearman
      FROM r GROUP BY lang
      ORDER BY lang"""
    },
    "q81_chunk_containment" -> {
      val slice = s"list_slice(w, chunk_id * $ChunkStride + 1, " +
        s"chunk_id * $ChunkStride + $ChunkTokens)"
      s"""
      WITH base AS (
        SELECT doc_id, ${wordsSql("text")} AS w FROM documents),
      sized AS (
        SELECT doc_id, w,
          greatest(0, floor((len(w) - $ChunkTokens + $ChunkStride - 1)
            / $ChunkStride)::INT) AS k
        FROM base),
      ch AS (
        SELECT doc_id, w, unnest(range(0, k + 1))::INT AS chunk_id FROM sized),
      fps AS (
        SELECT DISTINCT doc_id,
          ${xhashSql(s"array_to_string($slice, ' ')")} AS chunk_fp
        FROM ch),
      keep AS (
        SELECT chunk_fp FROM fps GROUP BY chunk_fp
        HAVING count(1) <= $StopChunkDf),
      kept AS (SELECT f.* FROM fps f JOIN keep USING (chunk_fp)),
      sizes AS (SELECT doc_id, count(1) AS n_chunks_a FROM fps GROUP BY doc_id),
      shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(1) AS shared
        FROM kept a JOIN kept b
          ON a.chunk_fp = b.chunk_fp AND a.doc_id <> b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, shared, n_chunks_a,
        shared::DOUBLE / n_chunks_a AS containment
      FROM shared JOIN sizes ON doc_a = sizes.doc_id
      WHERE shared::DOUBLE / n_chunks_a >= $ContainTau
      ORDER BY doc_a, doc_b"""
    },
    "q82_doc_rarity" -> s"""
      WITH terms AS (
        SELECT doc_id, unnest(${wordsSql("text")}) AS term FROM documents),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
      j AS (
        SELECT doc_id, count(1) AS n_tokens, sum(df) AS sum_df,
          sum(CASE WHEN df <= $RareDf THEN 1 ELSE 0 END)::BIGINT AS n_rare
        FROM terms JOIN df USING (term) GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_rare,
        ${droundSql("sum_df::DOUBLE / n_tokens", 4)} AS mean_df,
        ${droundSql("n_rare::DOUBLE / n_tokens", 6)} AS rare_ratio
      FROM j ORDER BY doc_id""",
    "q83_pii_redact" -> {
      val enriched = "(text || ' contact user' || doc_id::VARCHAR || " +
        "'@example.com from 10.0.' || (doc_id % 256)::VARCHAR || '.77 ref ' || " +
        "(100000 + doc_id)::VARCHAR)"
      s"""
      SELECT doc_id,
        len(regexp_extract_all($enriched, '$PiiEmailRe'))::INT AS n_emails,
        len(regexp_extract_all($enriched, '$PiiIpRe'))::INT AS n_ips,
        len(regexp_extract_all($enriched, '$PiiNumRe'))::INT AS n_nums,
        regexp_replace(regexp_replace(regexp_replace($enriched,
          '$PiiEmailRe', '<EMAIL>', 'g'),
          '$PiiIpRe', '<IP>', 'g'),
          '$PiiNumRe', '<NUM>', 'g') AS redacted
      FROM documents ORDER BY doc_id"""
    },
    "q84_kmeans_lloyd" ->
      Similarity.kmeansLloydSql("embeddings", KmK, KmRounds),
    "q77_embed_quantize" -> s"""
      WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
        FROM embeddings),
      sc AS (
        SELECT vec_id, e,
          CASE WHEN amax = 0.0 THEN 1.0 ELSE amax / 127.0 END AS scale
        FROM (SELECT vec_id, e,
          list_max(list_transform(e, x -> abs(x))) AS amax FROM base)),
      q AS (
        SELECT vec_id, e, scale,
          list_transform(e, x ->
            least(greatest(round(x / scale), -127.0), 127.0)) AS qv
        FROM sc)
      SELECT vec_id,
        ${droundSql("scale", 8)} AS scale,
        len(list_filter(qv, v -> abs(v) = 127.0))::INT AS n_saturated,
        ${droundSql(
          "list_max(list_transform(range(1, len(e) + 1), i -> abs(e[i] - qv[i] * scale)))", 8)}
          AS max_abs_err,
        ${droundSql(
          "list_sum(list_transform(range(1, len(e) + 1), i -> (e[i] - qv[i] * scale) * (e[i] - qv[i] * scale))) / len(e)", 10)}
          AS mse
      FROM q
      ORDER BY vec_id"""
  )
}
