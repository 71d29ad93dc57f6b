package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The COMPOSED streaming ingest edge — q190's cleaning funnel run at
  * stream time as ONE foreachBatch pipeline with ONE checkpoint, instead
  * of eight standalone twins each with their own query:
  *
  *   quality score (frozen q163 weights) → quality floor
  *     → intra-doc repetition cut (q184, per-doc)
  *     → cross-corpus span profile (q171, vs the at-rest gram set)
  *     → near-dedup (q145, vs the at-rest signature table)
  *     → BM25 postings/doclen append (q178) for the survivors
  *     → one exact-integer funnel row per micro-batch (q190's readout)
  *
  * Every stage consumes the PREVIOUS stage's output (the cut text is
  * what gets signed; only near-dup survivors are indexed) — the staging
  * q190's batch funnel prescribes — and every stage touches O(batch)
  * text plus frozen at-rest state only, so a micro-batch costs the same
  * whether the corpus behind the gram/signature tables is 1 GB or
  * 100 TB. Per-doc outputs depend only on the doc and frozen state,
  * never on which micro-batch carried the doc, so the pipeline is
  * batch-split-invariant by construction; each stage lands under
  * `<out>/<stage>/batch_run=N` with idempotent overwrite, which makes a
  * checkpoint-replayed batch REPLACE its own partitions — exactly-once
  * end to end with a single checkpoint directory
  * ([[Archive.startMultiSink]]'s discipline, applied to a six-sink
  * DAG). StreamingAnalyticsSpec proves a two-micro-batch run (with a
  * mid-run restart replay) equals the one-shot batch chain.
  */
object IngestPipeline {

  /** Frozen per-pipeline parameters: the trained classifier weights and
    * floor, and the near-dedup banding. All trained/chosen BEFORE the
    * stream starts; nothing shifts mid-stream (the q151 frozen-codebook
    * discipline). */
  case class Config(weights: Array[Double], scoreFloor: Double,
                    shingleN: Int, numHashes: Int, bands: Int, tau: Double)

  /** The stage outputs for one batch of arriving docs. */
  case class Stages(scores: DataFrame, clean: DataFrame, spans: DataFrame,
                    hits: DataFrame, postings: DataFrame, doclen: DataFrame,
                    funnel: DataFrame)

  /** Run one batch of (doc_id, text, lang, n_chars) docs through the
    * whole chain against frozen at-rest state. The SAME function serves
    * the streaming writer and the batch comparand — the spec's equality
    * is between two call sites of this code, not two implementations. */
  def chainOf(batch: DataFrame, corpusGrams: DataFrame,
              corpusSig: DataFrame, cfg: Config): Stages = {
    val scores = graft.operators.StatsOps.scoreWithWeights(batch, cfg.weights)
    val kept = batch.join(
      scores.filter(col("score") >= cfg.scoreFloor).select("doc_id"),
      "doc_id")
    val clean = graft.operators.LlmQueries
      .intradocDedupOf(kept.select("doc_id", "text"))
      .transform(graft.core.EngineCache.persisted)
    val cleanDocs = clean
      .select(col("doc_id"), col("clean_text").as("text"))
    val spans = graft.operators.LlmQueries
      .spanIncrementOf(cleanDocs, corpusGrams)
      .transform(graft.core.EngineCache.persisted)
    val hits = graft.llm.Dedup.incrementalLshPairs(
      corpusSig,
      graft.llm.Dedup.signatureFrame(
        cleanDocs, "doc_id", "text", cfg.shingleN, cfg.numHashes),
      cfg.numHashes, cfg.bands, cfg.tau)
      .transform(graft.core.EngineCache.persisted)
    val survivors = cleanDocs.join(
      hits.select(col("batch_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val postings = graft.operators.CorpusOps.bm25PostingsOf(survivors)
    val doclen = graft.operators.CorpusOps.bm25DoclenOf(survivors)
    // q190's per-batch funnel row: every count an exact integer, every
    // stage monotone vs the previous one — six 1-row aggregates, cheap
    val funnel = batch.agg(count(lit(1)).as("n_raw"))
      .crossJoin(kept.agg(count(lit(1)).as("n_quality")))
      .crossJoin(clean.agg(
        coalesce(sum(col("n_tokens")), lit(0L)).as("tokens_raw"),
        coalesce(sum(col("kept_tokens")), lit(0L)).as("tokens_after_cut")))
      .crossJoin(spans.agg(
        coalesce(sum(col("dup_tokens")), lit(0L)).as("corpus_dup_tokens")))
      .crossJoin(hits.select("batch_id").distinct()
        .agg(count(lit(1)).as("n_near_dup")))
      .crossJoin(survivors.agg(count(lit(1)).as("n_indexed")))
    Stages(scores, clean, spans, hits, postings, doclen, funnel)
  }

  /** Start the composed pipeline: one stream, one checkpoint, six
    * batch_run-partitioned sinks. */
  def start(docStream: DataFrame, corpusGrams: DataFrame,
            corpusSig: DataFrame, cfg: Config, outPath: String,
            checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = chainOf(batch, corpusGrams, corpusSig, cfg)
          def land(df: DataFrame, stage: String): Unit =
            df.write.mode("overwrite")
              .parquet(s"$outPath/$stage/batch_run=$batchId")
          land(s.scores, "scores")
          land(s.clean, "clean")
          land(s.spans, "spans")
          land(s.hits, "neardup")
          land(s.postings, "postings")
          land(s.doclen, "doclen")
          land(s.funnel, "funnel")
          // release THIS thread's persisted stage frames between batches
          graft.core.EngineCache.releaseOwned()
        }
        () // Unit, not DataFrameWriter — keep the VoidFunction2 overload
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
