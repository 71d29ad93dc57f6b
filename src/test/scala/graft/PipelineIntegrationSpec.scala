package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.Archive
import graft.streaming.Archive.ArchiveConfig
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline over ONE lineage — the composition
  * the reference exists to feed (archive first, analyze later), chained
  * through the engine's own operators:
  *
  *   archive (with a checkpoint RESTART mid-stream, exactly-once)
  *     → decode → quality filter (token floor)
  *     → exact dedup (fingerprint clusters, keep lowest id)
  *     → near dedup (MinHash-LSH pairs → connected components)
  *     → survivorship (richness-then-id golden record per component)
  *     → greedy sequence packing
  *
  * Every stage is an operator a gated query already exercises alone;
  * this spec proves they COMPOSE: the packed corpus at the end contains
  * exactly the documents that should survive, with no loss or
  * duplication introduced by the restart. */
class PipelineIntegrationSpec extends SparkSpec {

  case class KMsg(key: Array[Byte], value: Array[Byte], topic: String,
                  partition: Int, offset: Long, timestamp: Timestamp)

  private def doc(id: Long, text: String): KMsg =
    KMsg(null, text.getBytes("UTF-8"), "docs", 0, id,
      new Timestamp(1700000000000L + id * 1000))

  test("archive -> quality -> exact+near dedup -> survivorship -> packing " +
       "over one lineage with a checkpoint restart mid-stream") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    val goodA = "the quick brown fox jumps over the lazy dog and then naps"
    val goodB = "pack small documents tightly into training sequences for the model"
    val goodC = "completely different content about spark execution plans and shuffles"

    val out = Files.createTempDirectory("pipe-out").toString
    val ckpt = Files.createTempDirectory("pipe-ckpt").toString
    val cfg = ArchiveConfig(out, ckpt, rotationInterval = "1 seconds")
    val source = MemoryStream[KMsg]

    // ---- stage 1a: archive the first half of the stream
    source.addData(
      doc(1, goodA),
      doc(2, goodA),                // exact duplicate of 1
      doc(3, "??!! !! ?? !!"),      // junk -> quality-filtered
      doc(4, goodA + " happily"))   // near duplicate of 1, slightly longer
    val q1 = Archive.start(source.toDF(), cfg)
    q1.processAllAvailable()
    q1.stop()

    // ---- stage 1b: RESTART from the same checkpoint; only new data lands
    source.addData(
      doc(5, goodB),
      doc(6, goodC),
      doc(7, goodB),                // exact duplicate of 5
      doc(8, "ok"))                 // too short -> quality-filtered
    val q2 = Archive.start(source.toDF(), cfg)
    q2.processAllAvailable()
    q2.stop()

    // exactly-once across the restart: 8 rows, 8 distinct offsets
    val archived = Archive.readArchive(spark, out)
    assert(archived.count() === 8)
    assert(archived.select("offset").distinct().count() === 8)

    // ---- stage 2: decode + quality filter (token floor)
    val docsDf = archived.select(
      col("offset").as("doc_id"),
      col("value").cast("string").as("text"))
    val quality = docsDf.filter(
      graft.functions.TextFunctions.tokenCount("text") >= 5)
    assert(quality.select("doc_id").as[Long].collect().sorted
      === Array(1L, 2L, 4L, 5L, 6L, 7L))

    // ---- stage 3: exact dedup — fingerprint clusters, keep lowest id
    val clusters = graft.llm.Dedup.exactClusters(quality, "doc_id", md5(col("text")))
    val exactClean = quality.join(
        clusters.select(col("fp"), col("keep_id")),
        md5(col("text")) === col("fp"), "left")
      .filter(col("keep_id").isNull || col("doc_id") === col("keep_id"))
      .select("doc_id", "text")
    assert(exactClean.select("doc_id").as[Long].collect().sorted
      === Array(1L, 4L, 5L, 6L))

    // ---- stage 4: near dedup — LSH pairs -> connected components
    val pairs = graft.llm.Dedup.minhashLshPairs(
      exactClean, "doc_id", "text",
      shingleN = 2, numHashes = 32, bands = 16, tau = 0.5)
    val comps = graft.llm.Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b")))

    // ---- stage 5: survivorship — richness-then-id golden record (q131's
    // rule) applied per near-dup component
    val withComp = exactClean.join(comps.withColumnRenamed("doc_id", "cid"),
        col("doc_id") === col("cid"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .select("doc_id", "text", "component")
    val w = Window.partitionBy("component")
      .orderBy(length(col("text")).desc, col("doc_id"))
    val survivors = withComp.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).select("doc_id", "text")
    // component {1,4}: 4 wins on length; 5 and 6 are their own canon
    assert(survivors.select("doc_id").as[Long].collect().sorted
      === Array(4L, 5L, 6L))

    // ---- stage 6: greedy packing of the surviving corpus
    val packed = graft.llm.Packing.packGreedy(
      survivors.withColumn("lang", lit("en")),
      "doc_id", "text", "lang", capacity = 1000, shards = 1)
    assert(packed.select("doc_id").as[Long].collect().sorted
      === Array(4L, 5L, 6L))
    // capacity 1000 >> corpus: one pack, positions follow doc_id order
    assert(packed.select("pack_id").distinct().count() === 1)
    assert(packed.orderBy("pack_pos").select("doc_id").as[Long].collect().toSeq
      === Seq(4L, 5L, 6L))
    val fills = packed.orderBy("pack_pos").select("pack_fill").as[Int].collect()
    assert(fills.last <= 1000 && fills.sameElements(fills.sorted),
      "fill must grow monotonically within the pack")

    graft.core.EngineCache.releaseAll()
  }

  test("span cut -> classifier training -> curriculum over one lineage") {
    // round-8 composition: the cleaned corpus (q168) feeds classifier
    // training (q163's weights) and the curriculum order (q165) — the
    // stages a real data pipeline chains after dedup
    val sq = spark
    import sq.implicits._
    val run = (1 to 12).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $run", "en", "srcA"),
      (2L, s"$run delta epsilon zeta", "en", "srcA"), // loses the run
      (3L, (1 to 40).map(j => s"w$j").mkString(" "), "en", "srcB"),
      (4L, "kurz und knapp!!", "xx", "srcB"),
      (5L, (1 to 30).map(j => s"u$j").mkString(" "), "xx", "srcA")
    ).toDF("doc_id", "text", "lang", "source")
    // 1. span cut: doc 2 must lose the duplicated run but survive
    val cleaned = graft.operators.LlmQueries
      .dedupCleanOf(docs.select("doc_id", "text"))
      .select(col("doc_id"), col("clean_text").as("text"))
    val c2 = cleaned.filter(col("doc_id") === 2L).collect().head.getString(1)
    assert(c2 === "delta epsilon zeta")
    // 2. rejoin metadata, train the classifier on the CLEANED text
    val meta = docs.select("doc_id", "lang", "source")
    val cleanedDocs = cleaned.join(meta, "doc_id")
      .withColumn("n_chars", length(col("text")))
    val w = graft.operators.StatsOps.trainedClsWeights(
      cleanedDocs.select("doc_id", "text", "lang", "n_chars"))
    assert(w.exists(_ != 0.0), "training must move the weights")
    // 3. curriculum order over the cleaned corpus: every surviving doc
    // gets exactly one position, sources interleave by quality rank
    val viewDocs = cleanedDocs.select("doc_id", "text", "lang", "source")
    val order = graft.operators.LlmQueries.curriculumOrderOf(viewDocs)
      .collect()
    assert(order.map(_.getLong(1)).sorted.toSeq ===
      cleaned.collect().map(_.getLong(0)).sorted.toSeq)
    assert(order.map(_.getLong(0)).toSeq ===
      (1L to order.length).toSeq, "positions are a contiguous ranking")
    // first block of the schedule holds each source's best doc
    val firstBlock = order.take(2).map(_.getString(2)).toSet
    assert(firstBlock === Set("srcA", "srcB"))
    graft.core.EngineCache.releaseAll()
  }
}
