package graft

import graft.llm.Packing
import graft.operators.LlmQueries
import org.apache.spark.sql.functions._

/** Greedy sequence packing + the round-3 training-pipeline operators:
  * boundary semantics, oversize documents, determinism under arbitrary
  * input partitioning, and known-value checks for the repetition and
  * incremental-dedup operators. */
class PackingSpec extends SparkSpec {

  private def docsOf(rows: (Long, String, String)*) = {
    val sq = spark
    import sq.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  // one word == one token for these fixtures
  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("packing: docs fill a pack up to capacity, then roll over") {
    val d = docsOf(
      (1L, words(4), "en"), (2L, words(5), "en"),
      (3L, words(2), "en"), (4L, words(9), "en"))
    val got = Packing.packGreedy(d, "doc_id", "text", "lang",
        capacity = 10, shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "pack_id", "pack_pos", "pack_fill")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // 4+5 fit pack 0 (fill 9); 2 doesn't (11>10) -> pack 1; 9 -> pack 2
    assert(got.toSeq === Seq((1L, 0, 1, 4), (2L, 0, 2, 9),
      (3L, 1, 1, 2), (4L, 2, 1, 9)))
  }

  test("packing: an exact fit stays in the pack; the next doc rolls over") {
    val d = docsOf((1L, words(5), "en"), (2L, words(5), "en"), (3L, words(1), "en"))
    val got = Packing.packGreedy(d, "doc_id", "text", "lang", 10, 1)
      .orderBy("doc_id").select("pack_id", "pack_fill")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.toSeq === Seq((0, 5), (0, 10), (1, 1)))
  }

  test("packing: an oversize doc occupies exactly one pack, no cascade") {
    val d = docsOf(
      (1L, words(3), "en"), (2L, words(25), "en"), (3L, words(3), "en"))
    val got = Packing.packGreedy(d, "doc_id", "text", "lang", 10, 1)
      .orderBy("doc_id").select("pack_id", "pack_fill")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    // 25 > capacity: it alone is pack 1 (fill 25), and doc 3 starts pack 2
    assert(got.toSeq === Seq((0, 3), (1, 25), (2, 3)))
  }

  test("packing: no pack exceeds capacity unless it is a single oversize doc") {
    val packed = Packing.packGreedy(
      graft.core.Tables.load(spark, sfDir, "documents"),
      "doc_id", "text", "lang", LlmQueries.PackCapacity, LlmQueries.PackShards)
    val over = packed.groupBy("lang", "shard", "pack_id")
      .agg(max("pack_fill").as("fill"), count(lit(1)).as("n"))
      .filter(col("fill") > LlmQueries.PackCapacity && col("n") > 1)
    assert(over.count() === 0)
  }

  test("packing: output is invariant to input partitioning") {
    val d = graft.core.Tables.load(spark, sfDir, "documents")
    val a = Packing.packGreedy(d, "doc_id", "text", "lang", 256, 4)
    val b = Packing.packGreedy(d.repartition(17, col("text")),
      "doc_id", "text", "lang", 256, 4)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("packing: groups are (lang, doc_id % shards); packs never cross groups") {
    val packed = Packing.packGreedy(
      graft.core.Tables.load(spark, sfDir, "documents"),
      "doc_id", "text", "lang", 256, 4)
    assert(packed.filter(col("shard") =!= pmod(col("doc_id"), lit(4))).count() === 0)
    // pack_pos restarts at 1 per (lang, shard, pack_id)
    val bad = packed.groupBy("lang", "shard", "pack_id")
      .agg(min("pack_pos").as("lo"), max("pack_pos").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(bad.count() === 0)
  }

  test("repetition stats: known values on a planted repetitive doc") {
    val d = docsOf((1L, "a a a b", "en"), (2L, "x y", "en"), (3L, "z", "en"))
    val got = LlmQueries.repetitionStatsOf(d).orderBy("doc_id").collect()
    // doc 1: 4 words, 2 distinct, top word 'a'x3, bigrams [a a, a a, a b]
    val r1 = got(0)
    assert(r1.getInt(1) === 4 && r1.getInt(2) === 2 && r1.getInt(3) === 3)
    assert(r1.getInt(4) === 2) // "a a" twice
    assert(r1.getDouble(5) === 0.5 && r1.getDouble(6) === 0.75)
    // doc 3: single word — no bigrams, frac 0 with the /max(n-1,1) guard
    val r3 = got(2)
    assert(r3.getInt(4) === 0 && r3.getDouble(7) === 0.0)
  }

  test("mixture resampling: weights map to {floor, floor+1} copies; " +
       "weight-1 langs pass through; zero-repeat docs vanish") {
    val rows = LlmQueries.mixtureUpsample(spark, sfDir)
      .select("doc_id", "lang", "n_repeats", "copy_idx").collect()
    val byLang = rows.groupBy(_.getString(1))
    // de: w=2.5 -> every doc 2 or 3 copies; fr: w=1.0 -> exactly 1
    assert(byLang("de").map(_.getInt(2)).toSet.subsetOf(Set(2, 3)))
    assert(byLang("fr").map(_.getInt(2)).toSet === Set(1))
    // en: w=0.5 -> emitted docs have exactly 1 copy, and roughly half of
    // the lang's docs were dropped (hash gate, not RNG — exact per run)
    assert(byLang("en").map(_.getInt(2)).toSet === Set(1))
    val enTotal = graft.core.Tables.load(spark, sfDir, "documents")
      .filter(col("lang") === "en").count()
    val enKept = byLang("en").map(_.getLong(0)).distinct.length
    assert(enKept < enTotal && enKept > 0)
    // copy_idx enumerates 1..n_repeats per doc
    rows.groupBy(r => (r.getLong(0))).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq === (1 to rs.head.getInt(2)))
    }
    // determinism: a second run is identical
    val again = LlmQueries.mixtureUpsample(spark, sfDir)
      .select("doc_id", "lang", "n_repeats", "copy_idx").collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("novel docs: batch rows whose bag fingerprint exists in corpus drop") {
    val sq = spark
    import sq.implicits._
    val d = Seq(
      (1L, "red green blue", "batch"),
      (2L, "totally new thing", "batch"),
      (3L, "blue red green", "corpus"), // same bag as doc 1
      (4L, "other corpus text", "corpus")).toDF("doc_id", "text", "source")
    val got = LlmQueries.novelDocsOf(d, "batch").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(2L))
  }

  test("bloom novel-docs path keeps null-fingerprint batch rows like the " +
       "exact anti-join does") {
    val sq = spark
    import sq.implicits._
    val d = Seq(
      (1L, Some("red green blue"), "batch"),
      (2L, None, "batch"), // null text -> null fp: anti-join keeps it
      (3L, Some("blue red green"), "corpus"),
      (4L, Some("other corpus text"), "corpus"))
      .toDF("doc_id", "text", "source")
    val exact = LlmQueries.novelDocsOf(d, "batch")
      .collect().map(_.getLong(0)).sorted
    val bloomed = LlmQueries.novelDocsBloomOf(spark, d, "batch")
      .collect().map(_.getLong(0)).sorted
    assert(exact.toSeq === Seq(2L), "null-fp row is novel under anti-join")
    assert(bloomed.toSeq === exact.toSeq,
      "bloom path must not silently drop null-fingerprint rows")
  }
}
