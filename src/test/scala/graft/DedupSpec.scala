package graft

import graft.llm.{Dedup, Similarity}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Algebraic properties of the dedup/similarity operators (SURVEY.md §5.2):
  * identical texts collide everywhere, pair orientation, guard behavior on
  * degenerate inputs, idempotence. */
class DedupSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    val sq = spark
    import sq.implicits._
    rows.toDF("doc_id", "text")
  }

  test("identical documents produce jaccard 1.0 via MinHash-LSH") {
    val d = docsOf(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta",
      3L -> "totally different words entirely here now")
    val pairs = Dedup.minhashLshPairs(d, "doc_id", "text", 3, 8, 4, 0.5).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(0) === 1L && pairs.head.getLong(1) === 2L)
    assert(pairs.head.getDouble(2) === 1.0)
  }

  test("pairs are oriented id_a < id_b and never self-paired") {
    val d = docsOf(
      5L -> "one two three four five six seven",
      2L -> "one two three four five six seven",
      9L -> "one two three four five six seven")
    val pairs = Dedup.minhashLshPairs(d, "doc_id", "text", 3, 8, 4, 0.5).collect()
    assert(pairs.length === 3) // all 3 pairs of the triple
    pairs.foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }

  test("documents shorter than the shingle width are excluded, not errors") {
    val d = docsOf(1L -> "too short", 2L -> "also tiny")
    assert(Dedup.minhashLshPairs(d, "doc_id", "text", 3, 8, 4, 0.1).count() === 0)
  }

  test("simhash of identical texts is identical; hamming 0") {
    val d = docsOf(1L -> "spark hash group row value", 2L -> "spark hash group row value")
    val pairs = Dedup.simhashPairs(d, "doc_id", "text", 0).collect()
    assert(pairs.length === 1 && pairs.head.getInt(2) === 0)
  }

  test("exact clusters: reordered words collide on bag fingerprint") {
    val d = docsOf(
      1L -> "red green blue",
      2L -> "blue red green",
      3L -> "red green purple")
    val clusters = Dedup.exactClusters(d, "doc_id",
      TextFunctions.bagFingerprint("text")).collect()
    assert(clusters.length === 1)
    assert(clusters.head.getLong(1) === 1L && clusters.head.getLong(2) === 2L)
  }

  test("cosine top-k: identical vector ranks first with cos 1.0") {
    val sq = spark
    import sq.implicits._
    val vs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteForceTopK(vs, col("vec_id") === 1, 2)
      .orderBy("rnk").collect()
    assert(top(0).getLong(2) === 2L && top(0).getDouble(3) === 1.0)
    assert(top(1).getLong(2) === 3L && top(1).getDouble(3) === 0.0)
  }

  test("langId is deterministic and total over the fixture") {
    val d = graft.core.Tables.load(spark, sfDir, "documents")
      .select(TextFunctions.langId("text").as("g"))
    assert(d.filter(col("g").isNull).count() === 0)
    val langs = d.distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(TextFunctions.LangMarkers.map(_._1).toSet))
  }

  test("multimodal decode stub preserves ids and emits fixed-dim features") {
    val media = graft.llm.Multimodal.asMediaTable(
      graft.core.Tables.load(spark, sfDir, "documents").limit(10), "doc_id", "text")
    val feats = graft.llm.Multimodal.decodeStub(spark, media)
    assert(feats.count() === 10)
    assert(feats.selectExpr("size(features)").distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(4))
  }
}
