package graft

import org.apache.spark.sql.SparkSession

/** The HammingJoinBlocking optimizer rule: a naive
  * `bit_count(a.sig ^ b.sig) <= k` join must come back with identical
  * rows AND multiplicities, but planned as block equi-joins instead of a
  * nested-loop cartesian comparison. */
class HammingJoinSpec extends SparkSpec {

  private def withExtSession[A](f: SparkSession => A): A = {
    val shared = spark // force shared-session init first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try f(SparkSession.builder().master("local[4]")
      .withExtensions(new graft.GraftExtensions).getOrCreate())
    finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  // sig values chosen so pairs differ in low bits, high bits, and across
  // block boundaries; ids 5/6 share a sig (multiplicity check)
  private val sigs = Seq(
    1L -> 0x8000000000000L, 2L -> 0x0L,        // differ in a high bit only
    3L -> 0xE0AAL, 4L -> 0x00AAL,              // 3 bits in one byte
    5L -> 0x1234L, 6L -> 0x1234L, 7L -> 0x1235L, // identical + hamming 1
    8L -> 0x0F0F0F0FL)                         // far from everything

  private def naiveJoin(s: SparkSession) = {
    val sq = s; import sq.implicits._
    val df = sigs.toDF("id", "sig")
    val a = df.select(org.apache.spark.sql.functions.col("id").as("id_a"),
      org.apache.spark.sql.functions.col("sig").as("sig_a"))
    val b = df.select(org.apache.spark.sql.functions.col("id").as("id_b"),
      org.apache.spark.sql.functions.col("sig").as("sig_b"))
    a.join(b, org.apache.spark.sql.functions.expr(
      "bit_count(sig_a ^ sig_b) <= 3 AND id_a < id_b"))
      .selectExpr("id_a", "id_b", "CAST(bit_count(sig_a ^ sig_b) AS INT) AS hamming")
  }

  test("rule preserves rows and multiplicities of the naive hamming join") {
    val expected = naiveJoin(spark) // shared session: no rule injected
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(expected.toSeq === Seq((1L, 2L, 1), (3L, 4L, 3), (5L, 6L, 0),
      (5L, 7L, 1), (6L, 7L, 1)))
    val got = withExtSession { s =>
      naiveJoin(s).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    }
    assert(got.toSeq === expected.toSeq)
  }

  test("rule replaces the nested-loop plan with block equi-joins") {
    // without the rule: only a nested-loop/cartesian join can run this
    val naivePlan = naiveJoin(spark).queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
    withExtSession { s =>
      val p = naiveJoin(s).queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"rule must eliminate the O(n^2) join:\n$p")
      assert(p.contains("Union"), s"expected disjoint block-join union:\n$p")
      assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin") ||
        p.contains("BroadcastHashJoin"),
        s"branches must plan as equi-joins on the block keys:\n$p")
    }
  }

  test("rewritten join equals the pigeonhole dedup operator on fixture sigs") {
    // ground truth from the shared session's operator (explicit blocking)
    val docs = graft.core.Tables.load(spark, sfDir, "documents").limit(200)
    val expected = graft.llm.Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(expected.nonEmpty)
    // same result from a NAIVE bit_count join, auto-rewritten by the rule
    val got = withExtSession { s =>
      val sig = graft.llm.Dedup.withSimhash(
        graft.core.Tables.load(s, sfDir, "documents").limit(200), "doc_id", "text")
      val a = sig.select(org.apache.spark.sql.functions.col("id").as("id_a"),
        org.apache.spark.sql.functions.col("sig").as("sig_a"))
      val b = sig.select(org.apache.spark.sql.functions.col("id").as("id_b"),
        org.apache.spark.sql.functions.col("sig").as("sig_b"))
      a.join(b, org.apache.spark.sql.functions.expr(
        "bit_count(sig_a ^ sig_b) <= 3 AND id_a < id_b"))
        .selectExpr("id_a", "id_b", "CAST(bit_count(sig_a ^ sig_b) AS INT) AS hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    }
    assert(got.toSeq === expected.toSeq)
  }

  test("rule leaves joins with existing equi-keys alone") {
    withExtSession { s =>
      val sq = s; import sq.implicits._
      val df = sigs.toDF("id", "sig")
      val joined = df.as("a").join(df.as("b"), org.apache.spark.sql.functions.expr(
        "a.id = b.id AND bit_count(a.sig ^ b.sig) <= 3"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(!p.contains("Union"), s"equi-keyed join must not be rewritten:\n$p")
      assert(joined.count() === sigs.length)
    }
  }
}
