package graft

import org.apache.spark.sql.functions._
import graft.operators.AnalyticsOps

/** Round-5 operators: prefix-filtered set-similarity join, grouped OLS,
  * level-synchronous BFS, key-skew profiler. The oracle gate proves the
  * sf0.01 results; these specs prove the semantics on adversarial
  * hand-built fixtures the fixture corpus may not contain. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("target encoding: LOO excludes the row, singletons fall to the prior, smoothing shrinks") {
    val A = graft.operators.AnalyticsOps
    // cat 1: y = 100, 200, 300 cents; cat 2 singleton: y = 1000.
    // prior = 1600/4 = 400 exactly, so every expectation is integral
    // except the smoothed mid rows, which pin the floor.
    Seq((1L, 1L, 1.0), (2L, 1L, 2.0), (3L, 1L, 3.0), (4L, 2L, 10.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView("te_t")
    val out = spark.sql(A.targetEncodeSql("te_t")).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(1L) == (3L, 250000000L, 375000000L), s"row 1: ${out(1L)}")
    assert(out(2L) == (3L, 200000000L, 366666666L), s"row 2: ${out(2L)}")
    assert(out(3L) == (3L, 150000000L, 358333333L), s"row 3: ${out(3L)}")
    // the singleton: LOO undefined -> global prior; smoothing is pure
    // prior at weight m/(0 + m)
    assert(out(4L) == (1L, 400000000L, 400000000L), s"singleton: ${out(4L)}")
  }

  test("set-sim join finds exactly the pairs at / above the Jaccard threshold") {
    // doc 10 ∩ doc 15: 3 of union 4 (J=3/4 ≥ 1/2 — kept);
    // doc 20 vs doc 10: 1 of union 5 (J=1/5 — dropped);
    // doc 25 ∩ doc 30: 2 of union 4 (J=2/4 = boundary — kept: 3·2 ≥ 2+4...
    //   sizes m=3,m=3, 3·2=6 ≥ 6 ✓ exactly at τ).
    Seq(
      (10L, "alpha beta gamma delta"),
      (15L, "alpha beta gamma"),
      (20L, "alpha zeta eta theta"),
      (25L, "kappa lambda mu"),
      (30L, "kappa lambda nu")
    ).toDF("doc_id", "text").createOrReplaceTempView("documents")
    // the operator's own plan, without the doc_id % mod restriction
    val out = AnalyticsOps.setSimJoinOf(spark.table("documents"))
      .select("id_a", "id_b", "inter_n", "union_n").as[(Long, Long, Long, Long)]
      .collect().toSet
    assert(out === Set((10L, 15L, 3L, 4L), (25L, 30L, 2L, 4L)))
    graft.core.EngineCache.releaseAll()
  }

  test("OLS recovers a planted exact linear relation") {
    // y = 300x + 500 cents exactly: slope 300, icept 500, r = 1
    Seq((1, 1.0, 8.00), (2, 2.0, 11.00), (3, 3.0, 14.00), (4, 4.0, 17.00))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
      .createOrReplaceTempView("lineitem")
    Seq((1, "B1"), (2, "B1"), (3, "B1"), (4, "B1"))
      .toDF("p_partkey", "p_brand").createOrReplaceTempView("part")
    val r = spark.sql(AnalyticsOps.olsSql).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Double]("slope") === 300.0)
    assert(row.getAs[Double]("icept") === 500.0)
    assert(row.getAs[Double]("r") === 1.0)
  }

  test("BFS hop distances are exact on a chain and bounded by the iteration cap") {
    // chain 0-1-2-3-4-5, seed {0}: hops = node index, capped at 3 iters
    val e0 = (0L to 4L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = Seq(0L).toDF("node")
    val got = AnalyticsOps.bfsFrom(e, seeds, iters = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
    graft.core.EngineCache.releaseAll()
  }

  test("BFS stops expanding once the frontier empties, well under the cap") {
    // chain 0-1-2-3 (diameter 3), cap 20: rounds = 4 (3 growth + 1 empty)
    val e0 = (0L to 2L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = Seq(0L).toDF("node")
    val (res, rounds) = AnalyticsOps.bfsFromWithRounds(e, seeds, iters = 20)
    assert(res.as[(Long, Int)].collect().toMap ===
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
    assert(rounds === 4, s"expected early termination at round 4, ran $rounds")
    graft.core.EngineCache.releaseAll()
  }

  test("record linkage: every planted twin links; scoring survives the mangled name") {
    val out = graft.operators.AnalyticsOps.recordLinkage(spark, sfDir).collect()
    val nDirty = graft.core.Tables.load(spark, sfDir, "customer")
      .filter("c_custkey % 7 = 1").count()
    val twins = out.filter(r => r.getLong(0) == r.getLong(1))
    assert(twins.length == nDirty,
      "ground truth is the identity mapping; every dirty record must link")
    twins.foreach { r =>
      assert(r.getString(6) == "match", s"twin must classify as match: $r")
      assert(r.getLong(4) == 1L, "balance always agrees on a true twin")
    }
    // the mangled half links WITHOUT name equality — the point of scoring
    val mangled = twins.filter(_.getLong(3) == 0L)
    val exact = twins.filter(_.getLong(3) == 1L)
    assert(mangled.nonEmpty && exact.nonEmpty)
    assert(exact.map(_.getDouble(5)).min > mangled.map(_.getDouble(5)).max,
      "an agreeing near-unique field must dominate the score")
    out.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) >= 2,
        "sub-threshold agreement pairs are pruned before scoring")
    }
  }

  test("linkage EM discovers the planted mangling rate without labels") {
    val rows = graft.operators.AnalyticsOps.linkageEm(spark, sfDir).collect()
    val out = rows
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val lam = rows.head.getDouble(3)
    // keys ≡ 1 mod 14 within the ≡ 1 mod 7 dirty set: exactly ~half the
    // true twins carry a mangled name — EM must recover that rate
    assert(out("a_name")._1 > 0.3 && out("a_name")._1 < 0.7,
      s"EM must find the ~0.5 name agreement among matches: $out")
    assert(out("a_seg")._1 > 0.9 && out("a_bal")._1 > 0.9,
      s"segment and balance agree on essentially all matches: $out")
    assert(out("a_name")._2 < 0.05 && out("a_bal")._2 < 0.05,
      s"near-unique fields rarely agree on random pairs: $out")
    assert(out("a_seg")._2 > 0.1 && out("a_seg")._2 < 0.4,
      s"a ~5-value field agrees on ~1/5 of random pairs: $out")
    // lambda tracks the true match prevalence among blocked pairs
    val nDirty = graft.core.Tables.load(spark, sfDir, "customer")
      .filter("c_custkey % 7 = 1").count().toDouble
    val nPairs = graft.core.Tables.load(spark, sfDir, "customer")
      .selectExpr("c_nationkey AS blk")
      .groupBy("blk").count()
      .selectExpr("sum(count * count) / 7").collect().head.getDouble(0)
    val trueRate = nDirty / nPairs
    assert(lam > trueRate / 3 && lam < trueRate * 3,
      s"lambda $lam must track the true prevalence ~$trueRate")
  }

  test("theil-sen holds the planted slope where OLS provably bends") {
    val sq = spark
    import sq.implicits._
    // group L: y = 1000 + 7x cents per month x = 1..11, month 12 a 1e7
    // outlier. 55 of 66 pair slopes are exactly 7 -> both medians sit in
    // the 7-block; OLS over the same points is dragged far off
    val lRows = (1 to 11).map(m => ("L", m, 1000L + 7L * m)) :+
      (("L", 12, 10000000L))
    // group O: 3 months -> odd pair count, median is the middle slope
    val oRows = Seq(("O", 1, 0L), ("O", 2, 300L), ("O", 4, 600L))
    (lRows ++ oRows).map { case (g, m, cents) =>
      (g, java.sql.Date.valueOf(f"1995-$m%02d-15"), cents.toDouble / 100.0)
    }.toDF("o_orderpriority", "o_orderdate", "o_totalprice")
      .createOrReplaceTempView("ts_t")
    val got = spark.sql(AnalyticsOps.theilSenSql("ts_t")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // one order per month -> monthly mean == the order, y in centi-cents
    // = (1000+7m)*100, clean slope 700/month -> s6 = 7e8, doubled 1.4e9
    assert(got("L") == ((12L, 66L, 1400000000L)),
      s"theil-sen must hold slope 7 under the outlier: ${got("L")}")
    // O: y = 0/30000/60000 at x = 1/2/4 -> slopes 30000/20000/15000,
    // median 20000 on the 1e6 grid doubled
    assert(got("O") == ((3L, 3L, 40000000000L)),
      s"odd-count median drifted: ${got("O")}")
    // the wedge: OLS on L's points is dragged by the outlier
    val xs = (1 to 12).map(_.toDouble)
    val ys = lRows.map(_._3.toDouble)
    val n = 12.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(ols - 7.0) > 100000.0,
      s"the outlier must provably bend OLS for the wedge to mean anything: $ols")
    graft.core.EngineCache.releaseAll()
  }

  test("skew profiler ranks the heavy key first with exact share") {
    // key 7 has 6 of 10 rows across 3 keys: share .6, 1.8x mean
    (Seq.fill(6)(7) ++ Seq(8, 8, 9, 9)).toDF("l_partkey")
      .createOrReplaceTempView("lineitem")
    val top = spark.sql(
      AnalyticsOps.skewProfileSql("lineitem", "l_partkey")).collect().head
    assert(top.getAs[Int]("k") === 7)
    assert(top.getAs[Long]("c") === 6L)
    assert(top.getAs[Double]("row_share") === 0.6)
    assert(top.getAs[Double]("x_mean") === 1.8)
  }
}
