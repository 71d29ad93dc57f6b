package graft

import graft.operators.{LlmQueries, Windows}
import org.apache.spark.sql.functions._

/** Value-level properties of the round-3 event/pipeline operators that the
  * DuckDB hash gate can't express (internal invariants: grid contiguity,
  * rolling-frame correctness vs a brute-force recompute, funnel monotonicity,
  * chunk coverage, dedup-survivor structure). */
class PipelineOpsSpec extends SparkSpec {

  test("gap-fill emits a contiguous hourly grid with non-null carry-forward") {
    val rows = Windows.gapFill(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, grid) =>
      val hours = grid.map(_.getTimestamp(1).getTime).sorted
      val expected = (hours.head to hours.last by 3600 * 1000L).toArray
      assert(hours.sameElements(expected), "grid has holes or duplicates")
    }
    // first bucket per type comes from an observed hour, so carry-forward
    // never has a null to propagate
    assert(rows.forall(!_.isNullAt(4)))
    rows.filter(_.getBoolean(3)).foreach(r => assert(r.getLong(2) == 0L))
  }

  test("rolling 1h window matches a brute-force recompute") {
    val events = graft.core.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = events.groupBy(_._2)
    val expected = events.map { case (id, u, ms, _) =>
      val peers = byUser(u).filter(e => e._3 <= ms && e._3 >= ms - Windows.RollingMs)
      id -> (peers.length.toLong,
        math.rint(peers.map(e => BigDecimal(e._4)).sum.toDouble * 100) / 100)
    }.toMap
    val got = Windows.rollingWindow(spark, sfDir).collect()
    assert(got.length == events.length)
    got.foreach { r =>
      val (n, s) = expected(r.getLong(0))
      assert(r.getLong(3) == n, s"n_1h mismatch for event ${r.getLong(0)}")
      assert(math.abs(r.getDouble(4) - s) < 1e-9,
        s"sum_1h mismatch for event ${r.getLong(0)}: got ${r.getDouble(4)}, want $s")
    }
  }

  test("funnel stage counts are positive and non-increasing") {
    val rows = Windows.eventFunnel(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    val counts = rows.map(_.getLong(2))
    assert(counts.head > 0)
    counts.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    val signupUsers = graft.core.Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(counts.head == signupUsers)
  }

  test("z-score outliers all exceed the cut and match a recompute") {
    val rows = Windows.zscoreOutliers(spark, sfDir).collect()
    assert(rows.forall(r => math.abs(r.getDouble(3)) > Windows.ZCut))
    // recompute one group's stats exactly
    val vals = graft.core.Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select("value").collect().map(_.getDouble(0))
    val mean = vals.map(BigDecimal(_)).sum.toDouble / vals.length
    val std = math.sqrt(
      vals.map(v => BigDecimal(v) * BigDecimal(v)).sum.toDouble / vals.length
        - mean * mean)
    rows.filter(_.getString(1) == "purchase").foreach { r =>
      val z = math.floor((r.getDouble(2) - mean) / std * 1e4 + 0.5) / 1e4
      assert(math.abs(r.getDouble(3) - z) < 1e-9)
    }
  }

  test("doc chunks cover every token with the declared stride and overlap") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(expr(graft.functions.TextFunctions.wordsExpr("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = LlmQueries.docChunks(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (docId, cs) =>
      val n = docs(docId)
      val k = math.max(0,
        math.ceil((n - LlmQueries.ChunkTokens).toDouble / LlmQueries.ChunkStride).toInt)
      assert(cs.length == k + 1, s"doc $docId: ${cs.length} chunks, want ${k + 1}")
      val sorted = cs.sortBy(_.getInt(1))
      sorted.dropRight(1).foreach(c => assert(c.getInt(2) == LlmQueries.ChunkTokens))
      // last chunk reaches the end of the document exactly
      val lastStart = k * LlmQueries.ChunkStride
      assert(sorted.last.getInt(2) == math.min(LlmQueries.ChunkTokens, n - lastStart))
    }
  }

  test("tf-idf top terms are rank-consistent and match a manual recompute") {
    val rows = LlmQueries.tfidfTerms(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRk = rs.sortBy(_.getInt(1))
      assert(byRk.map(_.getInt(1)).toSeq == (1 to byRk.length))
      byRk.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(5) >= b.getDouble(5))
        case _ =>
      }
    }
    // manual: tfidf = tf * ln((N+1)/(df+1)) rounded half-up at 6 dp
    val nDocs = graft.core.Tables.load(spark, sfDir, "documents").count()
    rows.take(20).foreach { r =>
      val want = math.floor(
        r.getLong(3) * math.log((nDocs + 1).toDouble / (r.getLong(4) + 1)) * 1e6
          + 0.5) / 1e6
      assert(math.abs(r.getDouble(5) - want) < 1e-9)
    }
  }

  test("dedup corpus keeps exactly the exact-min + component-representative docs") {
    val d = graft.core.Tables.load(spark, sfDir, "documents")
    val survivors = LlmQueries.dedupCorpus(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    // no two survivors share a bag fingerprint
    val fps = d.select(col("doc_id"),
      graft.functions.TextFunctions.bagFingerprint("text").as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val survivorFps = fps.filter(p => survivors(p._1)).map(_._2)
    assert(survivorFps.distinct.length == survivorFps.length)
    // every non-representative component member is gone
    val comp = graft.llm.Dedup.connectedComponents(
      graft.llm.Dedup.minhashLshPairs(d, "doc_id", "text",
        LlmQueries.WordShingleN, LlmQueries.MinhashK, LlmQueries.MinhashBands,
        LlmQueries.MinhashTau)).collect()
    comp.filter(r => r.getLong(0) != r.getLong(1))
      .foreach(r => assert(!survivors(r.getLong(0)),
        s"near-dup non-representative ${r.getLong(0)} survived"))
    assert(survivors.nonEmpty && survivors.size < fps.length)
  }
}
