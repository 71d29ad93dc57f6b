package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-attribution / A-B measurement harness behind the numbers in
  * OPTIMIZATION_r13.md (guide §1.1's empirical loop, run as same-JVM
  * A/Bs with output cross-checks because this host's cross-run noise
  * is ±50% on single samples). Cases: `lp` (q213 round shapes:
  * max-struct vs encoded-long top-1), `pr` (q104 iteration join: plain
  * vs broadcast sums), `edges` (co-purchase edge-build variants),
  * `walk` (NSW walk: persist-chained vs localCheckpoint-barriered),
  * `nsw` (q264 phase split), `stats`/`aqe`/`micro` (q212 aggregate
  * shapes and primitive costs). Tooling only — not part of the driver
  * contract; env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SCRATCH_WHAT. */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val what = sys.env.getOrElse("SCRATCH_WHAT", "lp")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    what match {
      case "lp" =>
        // q213 phase split, current spelling
        val li = graft.core.Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        val e0 = li.alias("a")
          .join(li.alias("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct()
        val e = t("edges build+persist") {
          val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
            .repartition(col("dst"))
            .persist()
          e.count()
          e
        }
        var lab = e.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("lab"))
        for (i <- 1 to 4) {
          lab = t(s"iter $i (max-struct)") {
            val nxt = e.join(lab, e("dst") === lab("node"))
              .groupBy(e("src").as("node"), col("lab"))
              .agg(count(lit(1)).as("c"))
              .groupBy("node")
              .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
              .select(col("node"), (-col("m.nl")).as("lab"))
              .persist()
            nxt.count()
            nxt
          }
        }
        t("final window+sort+noop") {
          import org.apache.spark.sql.expressions.Window
          noop(lab.select(col("node"), col("lab").as("community"),
            count(lit(1)).over(Window.partitionBy("lab"))
              .cast("long").as("comm_size"))
            .orderBy("node"))
        }
        // variant: encoded-long top-1 (hash-aggregable)
        var lab2 = e.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("lab"))
        for (i <- 1 to 4) {
          lab2 = t(s"iter $i (encoded-long)") {
            val B = 4294967296L
            val nxt = e.join(lab2, e("dst") === lab2("node"))
              .groupBy(e("src").as("node"), col("lab"))
              .agg(count(lit(1)).as("c"))
              .groupBy("node")
              .agg(max(col("c") * lit(B) - col("lab")).as("enc"))
              .select(col("node"),
                (floor((col("enc") + lit(B) - 1) / lit(B)) * lit(B) -
                  col("enc")).cast("long").as("lab"))
              .persist()
            nxt.count()
            nxt
          }
        }
        t("final2 window+sort+noop") {
          import org.apache.spark.sql.expressions.Window
          noop(lab2.select(col("node"), col("lab").as("community"),
            count(lit(1)).over(Window.partitionBy("lab"))
              .cast("long").as("comm_size"))
            .orderBy("node"))
        }
        // cross-check: identical labelings
        val diff = lab.withColumnRenamed("lab", "l1")
          .join(lab2.withColumnRenamed("lab", "l2"), "node")
          .filter(col("l1") =!= col("l2")).count()
        println(s"[scratch] label mismatches: $diff")

      case "pr" =>
        // q104 phase split
        val li = graft.core.Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        val e0 = li.alias("a")
          .join(li.alias("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct()
        val e = t("edges build+persist") {
          val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).persist()
          e.count(); e
        }
        val deg = t("deg build") {
          val d = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")).persist()
          d.count(); d
        }
        val n = deg.count()
        val d = "0.85"
        var r = deg.select(col("node"), col("deg"),
          expr(s"floor(1e12 / CAST($n AS DOUBLE) + 0.5) / 1e12").as("r"))
        for (i <- 1 to 3) {
          r = t(s"iter $i (plain left join)") {
            val contrib = e.join(r, e("src") === r("node"))
              .select(col("dst").as("node"),
                expr("CAST(floor(r / CAST(deg AS DOUBLE) * 1e12 + 0.5) " +
                  "AS DECIMAL(38,0))").as("c"))
            val sums = contrib.groupBy("node").agg(sum("c").as("sc"))
            val nr = deg.join(sums, Seq("node"), "left")
              .select(col("node"), col("deg"),
                expr(s"floor((((1.0 - $d) / CAST($n AS DOUBLE)) + " +
                  s"$d * (CAST(coalesce(sc, 0) AS DOUBLE) / 1e12)) * 1e12 + 0.5) " +
                  "/ 1e12").as("r")).persist()
            nr.count(); nr
          }
        }
        t("final noop") {
          noop(r.select(col("node"),
            graft.core.Determinism.dround(col("r"), 9).as("pagerank")).orderBy("node"))
        }
        var r2 = deg.select(col("node"), col("deg"),
          expr(s"floor(1e12 / CAST($n AS DOUBLE) + 0.5) / 1e12").as("r"))
        for (i <- 1 to 3) {
          r2 = t(s"iter $i (broadcast sums)") {
            val contrib = e.join(r2, e("src") === r2("node"))
              .select(col("dst").as("node"),
                expr("CAST(floor(r / CAST(deg AS DOUBLE) * 1e12 + 0.5) " +
                  "AS DECIMAL(38,0))").as("c"))
            val sums = contrib.groupBy("node").agg(sum("c").as("sc"))
            val nr = deg.join(broadcast(sums), Seq("node"), "left")
              .select(col("node"), col("deg"),
                expr(s"floor((((1.0 - $d) / CAST($n AS DOUBLE)) + " +
                  s"$d * (CAST(coalesce(sc, 0) AS DOUBLE) / 1e12)) * 1e12 + 0.5) " +
                  "/ 1e12").as("r")).persist()
            nr.count(); nr
          }
        }
        t("final2 noop") {
          noop(r2.select(col("node"),
            graft.core.Determinism.dround(col("r"), 9).as("pagerank")).orderBy("node"))
        }
        val diff = r.withColumnRenamed("r", "ra")
          .join(r2.withColumnRenamed("r", "rb"), "node")
          .filter(col("ra") =!= col("rb")).count()
        println(s"[scratch] rank mismatches: $diff")

      case "stats" =>
        // q212 shapes: A = current union-of-11-aggregates, B = one wide
        // agg (Expand), each run twice
        graft.core.Tables.load(spark, dir, "lineitem")
          .createOrReplaceTempView("lineitem")
        for (round <- 1 to 2) {
          t(s"A union-of-aggs (round $round)") {
            noop(graft.operators.ScaleOps.colStats(spark, dir))
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          }
          t(s"B wide-agg Expand (round $round)") {
            val num = Seq("l_orderkey", "l_partkey", "l_suppkey",
              "l_linenumber", "l_quantity", "l_extendedprice",
              "l_discount", "l_tax")
            val aggs = (num.map(c => s"count(DISTINCT $c) AS ndv_$c, " +
              s"count($c) AS nn_$c, CAST(min($c) AS DOUBLE) AS mn_$c, " +
              s"CAST(max($c) AS DOUBLE) AS mx_$c") ++
              Seq("l_returnflag", "l_linestatus").map(c =>
                s"count(DISTINCT $c) AS ndv_$c, count($c) AS nn_$c, " +
                  s"min($c) AS mns_$c, max($c) AS mxs_$c") :+
              "count(DISTINCT l_shipdate) AS ndv_ship").mkString(", ")
            noop(spark.sql(s"SELECT count(1) AS n, $aggs FROM lineitem"))
          }
        }

      case "micro" =>
        graft.core.Tables.load(spark, dir, "lineitem")
          .createOrReplaceTempView("lineitem")
        for (r <- 1 to 2) {
          t(s"count(*) (r$r)") {
            noop(spark.sql("SELECT count(1) FROM lineitem"))
          }
          t(s"1 countDistinct long (r$r)") {
            noop(spark.sql("SELECT count(DISTINCT l_orderkey) FROM lineitem"))
          }
          t(s"1 countDistinct double (r$r)") {
            noop(spark.sql("SELECT count(DISTINCT l_quantity) FROM lineitem"))
          }
          t(s"1 countDistinct ts (r$r)") {
            noop(spark.sql("SELECT count(DISTINCT l_shipdate) FROM lineitem"))
          }
          t(s"groupBy(l_orderkey).count (r$r)") {
            noop(spark.sql(
              "SELECT l_orderkey, count(1) FROM lineitem GROUP BY l_orderkey"))
          }
        }

      case "aqe" =>
        graft.core.Tables.load(spark, dir, "lineitem")
          .createOrReplaceTempView("lineitem")
        for (r <- 1 to 2) {
          t(s"colStats AQE on (r$r)") {
            noop(graft.operators.ScaleOps.colStats(spark, dir))
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          }
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          t(s"colStats AQE off (r$r)") {
            noop(graft.operators.ScaleOps.colStats(spark, dir))
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          }
          spark.conf.set("spark.sql.adaptive.enabled", "true")
        }

      case "edges" =>
        val li = graft.core.Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        def build(tag: String)(mk: => DataFrame): Unit = {
          for (round <- 1 to 2) {
            t(s"$tag (round $round)") {
              val e = mk.persist()
              val n = e.count()
              e.unpersist(true)
              n
            }
          }
        }
        // current spelling: self-join -> distinct -> union -> repartition
        build("self-join+distinct+union+repart") {
          val e0 = li.alias("a")
            .join(li.alias("b"),
              col("a.l_orderkey") === col("b.l_orderkey") &&
                col("a.l_partkey") < col("b.l_partkey"))
            .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
            .distinct()
          e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
            .repartition(col("dst"))
        }
        // no repartition
        build("self-join+distinct+union") {
          val e0 = li.alias("a")
            .join(li.alias("b"),
              col("a.l_orderkey") === col("b.l_orderkey") &&
                col("a.l_partkey") < col("b.l_partkey"))
            .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
            .distinct()
          e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        }
        // grouped-pairs: one shuffle of (orderkey -> parts set), pairs by
        // codegen explode, then distinct
        build("collect_set+explode pairs") {
          val sets = li.groupBy("l_orderkey")
            .agg(collect_set(col("l_partkey")).as("ps"))
            .select(expr("array_sort(ps)").as("ps"))
          val e0 = sets
            .select(explode(expr(
              "flatten(transform(ps, (x, i) -> " +
                "transform(slice(ps, i + 2, size(ps) - i - 1), " +
                "y -> struct(x AS src, y AS dst))))")).as("p"))
            .select(col("p.src"), col("p.dst"))
            .distinct()
          e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        }

      case "walk" =>
        import org.apache.spark.sql.expressions.Window
        graft.functions.GraftFunctions.register(spark)
        val vecs = graft.core.Tables.load(spark, dir, "embeddings")
        val baseV = vecs.filter("vec_id % 10 != 3")
        val baseSigs = graft.operators.ScaleOps.nswSigsOf(baseV).persist()
        baseSigs.count()
        val baseAdj = graft.operators.ScaleOps.nswGraphOf(baseV).persist()
        baseAdj.count()
        val maintained = graft.operators.ScaleOps.nswGraphAppendOf(
          vecs, baseSigs, baseAdj, "vec_id % 10 = 3")
        // A: current walk (shared helper), straight over the repair DAG
        val a = t("walk A (current, over repair DAG)") {
          val r = graft.operators.ScaleOps.nswSearchOf(
            vecs, maintained, "vec_id < 8")
          r.persist(); r.count(); r
        }
        // B: same walk but g and per-hop visited eagerly checkpointed
        val b = t("walk B (localCheckpoint barriers)") {
          val NswG = 8; val NswBeam = 16; val NswHops = 4; val NswK = 5
          val v = vecs.select(col("vec_id"), col("embedding")).persist()
          val probes = v.filter("vec_id < 8")
            .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
            .localCheckpoint(true)
          val g = maintained.select("src", "dst").localCheckpoint(true)
          def score(cands: DataFrame): DataFrame = cands
            .join(v.select(col("vec_id").as("cand_id"),
              col("embedding").as("cv")), "cand_id")
            .join(broadcast(probes), "query_id")
            .withColumn("cos",
              expr(graft.llm.Similarity.cosineExpr("qv", "cv")))
            .select("query_id", "cand_id", "cos")
          var visited = probes.select(col("query_id"),
            col("query_id").as("cand_id"), lit(1.0).as("cos"))
            .localCheckpoint(true)
          val w = Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("cand_id"))
          for (_ <- 1 to NswHops) {
            val beam = visited.withColumn("rk", row_number().over(w))
              .filter(col("rk") <= NswBeam)
              .select(col("query_id"), col("cand_id").as("src"))
            val expanded = score(beam.join(g, "src")
              .select(col("query_id"), col("dst").as("cand_id")))
            visited = visited.unionByName(expanded)
              .groupBy("query_id", "cand_id").agg(max("cos").as("cos"))
              .localCheckpoint(true)
          }
          val r = visited.filter(col("cand_id") =!= col("query_id"))
            .withColumn("rnk", row_number().over(w).cast("int"))
            .filter(col("rnk") <= NswK)
            .select("query_id", "rnk", "cand_id", "cos")
            .orderBy("query_id", "rnk")
          r.persist(); r.count(); r
        }
        val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        println(s"[scratch] walk output mismatches: $diff")

      case "nsw" =>
        // q264 phase split: at-rest builds vs repair vs walk
        val vecs = graft.core.Tables.load(spark, dir, "embeddings")
        val baseV = vecs.filter("vec_id % 10 != 3")
        val baseSigs = t("base sigs build") {
          val s = graft.operators.ScaleOps.nswSigsOf(baseV).persist()
          s.count(); s
        }
        val baseAdj = t("base adj build (rebuild-scale)") {
          val a = graft.operators.ScaleOps.nswGraphOf(baseV).persist()
          a.count(); a
        }
        val maintained = t("append repair") {
          val m = graft.operators.ScaleOps.nswGraphAppendOf(
            vecs, baseSigs, baseAdj, "vec_id % 10 = 3").persist()
          m.count(); m
        }
        t("walk + noop") {
          noop(graft.operators.ScaleOps.nswSearchOf(
            vecs, maintained, "vec_id < 8"))
        }

      case "winsor" =>
        // q128 A/B: the double-scanned CTE spelling vs the cached-h
        // rewrite — alternated in one JVM, outputs cross-checked
        graft.core.Tables.load(spark, dir, "lineitem")
          .createOrReplaceTempView("lineitem")
        for (round <- 1 to 3) {
          t(s"A$round winsorSpark (h inlined twice)") {
            noop(spark.sql(graft.operators.StatsOps.winsorSpark))
          }
          t(s"B$round winsorMeans (h cached once)") {
            noop(graft.operators.StatsOps.winsorMeans(spark, dir))
            graft.core.EngineCache.releaseAll()
          }
        }
        val a = spark.sql(graft.operators.StatsOps.winsorSpark).collect().toSet
        val bres = graft.operators.StatsOps.winsorMeans(spark, dir).collect().toSet
        println(s"[scratch] winsor rows equal: ${a == bres} (${a.size} rows)")

      case "enc2" =>
        // q276 A/B: global-rank + rk-adjacency SMJ vs blocked-lag rewrite
        import graft.operators.DistributedRank
        for (round <- 1 to 3) {
          t(s"A$round rank+SMJ adjacency") {
            val li = graft.core.Tables.load(spark, dir, "lineitem")
              .select(col("l_orderkey"), col("l_linenumber"),
                col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
            val ranked = graft.core.EngineCache.persisted(
              DistributedRank.rankOnly(li, "rk", "l_orderkey", desc = false,
                col("l_orderkey"), col("l_linenumber"))
                .select("rk", "rf", "ls"))
            ranked.createOrReplaceTempView("enc_ranked_ab")
            noop(spark.sql(s"""
              WITH adj AS (
                SELECT a.rf, a.ls, b.rf AS prf, b.ls AS pls
                FROM enc_ranked_ab a LEFT JOIN enc_ranked_ab b ON b.rk = a.rk - 1),
              ch AS (
                SELECT CAST(sum(CASE WHEN prf IS NOT NULL AND rf <> prf
                         THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs_rf,
                  CAST(sum(CASE WHEN pls IS NOT NULL AND ls <> pls
                         THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs_ls
                FROM adj),
              ${graft.operators.ScaleOps.encodingTailSql(
                "enc_ranked_ab", ("ch.runs_rf", "ch.runs_ls"))}"""))
            graft.core.EngineCache.releaseAll()
          }
          t(s"B$round full encodingAdvisor (blocked lag)") {
            noop(graft.operators.ScaleOps.queries("q276_encoding_advisor")(spark, dir))
            graft.core.EngineCache.releaseAll()
          }
        }

      case "lp3" =>
        // q213 round A/B: plain cached edges (2 exchanges/round) vs
        // src-prehashed cached edges (0 exchanges/round)
        val li = graft.core.Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        val e0 = li.alias("a")
          .join(li.alias("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct()
        val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        def dumpRoundPlan(path: String, df: DataFrame): Unit =
          java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        def lpRounds(tag: String, e: DataFrame): DataFrame = {
          val B = 4294967296L
          var lab = t(s"$tag lab0 (distinct src)") {
            val l = e.select(col("src").as("node")).distinct()
              .select(col("node"), col("node").as("lab")).persist()
            l.count(); l
          }
          for (i <- 1 to 4) {
            lab = t(s"$tag iter $i") {
              val nxt = e.join(lab, e("dst") === lab("node"))
                .groupBy(e("src").as("node"), col("lab"))
                .agg(count(lit(1)).as("c"))
                .groupBy("node")
                .agg(max(col("c") * lit(B) - col("lab")).as("enc"))
                .select(col("node"),
                  expr(s"CAST(((enc + ${B - 1}) div $B) * $B - enc AS BIGINT)")
                    .as("lab"))
              if (i == 2) dumpRoundPlan(
                s"plans/r13/q213_round_${if (tag == "A") "plain" else "prehash"}.txt",
                nxt)
              val p = nxt.persist()
              p.count()
              p
            }
          }
          lab
        }
        val eA = t("A edges build+persist (plain)") {
          val e = sym.persist(); e.count(); e }
        val labA = lpRounds("A", eA)
        val eB = t("B edges build+persist (repartition src)") {
          val e = sym.repartition(col("src")).persist(); e.count(); e }
        val labB = lpRounds("B", eB)
        val diff = labA.withColumnRenamed("lab", "l1")
          .join(labB.withColumnRenamed("lab", "l2"), "node")
          .filter(col("l1") =!= col("l2")).count()
        println(s"[scratch] lp3 label mismatches: $diff " +
          s"(A=${labA.count()} B=${labB.count()})")

      case "pr3" =>
        // q104 iteration A/B: plain cached edges (1 exchange/iter) vs
        // dst-prehashed cached edges (0 exchanges/iter); sums broadcast
        // in both arms (the batch-1 state)
        val li = graft.core.Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        val e0 = li.alias("a")
          .join(li.alias("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct()
        val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        val dd = "0.85"
        def prIters(tag: String, e: DataFrame): DataFrame = {
          val deg = t(s"$tag deg build") {
            val dg = e.groupBy(col("src").as("node"))
              .agg(count(lit(1)).as("deg")).persist()
            dg.count(); dg
          }
          val n = deg.count()
          var r = deg.select(col("node"), col("deg"),
            expr(s"floor(1e12 / CAST($n AS DOUBLE) + 0.5) / 1e12").as("r"))
          for (i <- 1 to 4) {
            r = t(s"$tag iter $i") {
              val contrib = e.join(r, e("src") === r("node"))
                .select(col("dst").as("node"),
                  expr("CAST(floor(r / CAST(deg AS DOUBLE) * 1e12 + 0.5) " +
                    "AS DECIMAL(38,0))").as("c"))
              val sums = broadcast(
                contrib.groupBy("node").agg(sum("c").as("sc")))
              val nr = deg.join(sums, Seq("node"), "left")
                .select(col("node"), col("deg"),
                  expr(s"floor((((1.0 - $dd) / CAST($n AS DOUBLE)) + " +
                    s"$dd * (CAST(coalesce(sc, 0) AS DOUBLE) / 1e12)) * 1e12 + 0.5) " +
                    "/ 1e12").as("r"))
              if (i == 2) {
                java.nio.file.Files.writeString(java.nio.file.Paths.get(
                  s"plans/r13/q104_iter_${if (tag == "A") "plain" else "prehash"}.txt"),
                  nr.queryExecution.explainString(
                    org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
              }
              val p = nr.persist()
              p.count(); p
            }
          }
          r
        }
        val eA2 = t("A edges build+persist (plain)") {
          val e = sym.persist(); e.count(); e }
        val rA = prIters("A", eA2)
        val eB2 = t("B edges build+persist (repartition dst)") {
          val e = sym.repartition(col("dst")).persist(); e.count(); e }
        val rB = prIters("B", eB2)
        val diff2 = rA.select(col("node"), col("r").as("r1"))
          .join(rB.select(col("node"), col("r").as("r2")), "node")
          .filter(col("r1") =!= col("r2")).count()
        println(s"[scratch] pr3 rank mismatches: $diff2")

      case "hits2" =>
        // q149 A/B: one cached edge layout (each half-step exchanges)
        // vs dual cust/part layouts (each half-step single-stage)
        val o = graft.core.Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val l = graft.core.Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        val eDist = o.join(l, o("o_orderkey") === l("l_orderkey"))
          .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
          .distinct()
        def hitsLoop(tag: String, eC: DataFrame, eP: DataFrame,
                     bcast: Boolean): DataFrame = {
          def bc(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
          var a = eP.select(col("part")).distinct().withColumn("a", lit(1.0))
          var h: DataFrame = a
          def normalized(raw: DataFrame, key: String, out: String): DataFrame = {
            val mx = raw.agg(max(col("sc"))).head.getDecimal(0).doubleValue
            raw.select(col(key),
              (floor(col("sc").cast("double") / lit(mx) * lit(1e12) + lit(0.5)) /
                lit(1e12)).as(out))
          }
          for (i <- 1 to 3) {
            val (hraw, araw) = t(s"$tag iter $i") {
              val hr = eC.join(bc(a), "part").groupBy("cust")
                .agg(expr("sum(CAST(floor(a * 1e12 + 0.5) AS DECIMAL(38,0)))").as("sc"))
                .persist()
              h = normalized(hr, "cust", "h")
              val ar = eP.join(bc(h), "cust").groupBy("part")
                .agg(expr("sum(CAST(floor(h * 1e12 + 0.5) AS DECIMAL(38,0)))").as("sc"))
                .persist()
              a = normalized(ar, "part", "a")
              a.count()
              (hr, ar)
            }
          }
          h.select(lit("c").as("tp"), col("cust").as("id"), col("h").as("s"))
            .union(a.select(lit("p").as("tp"), col("part").as("id"),
              col("a").as("s")))
        }
        val eA3 = t("A edges build (single cache)") {
          val e = eDist.persist(); e.count(); e }
        val outA = hitsLoop("A", eA3, eA3, bcast = false)
        val eBc = t("B edges build byCust") {
          val e = eDist.repartition(col("cust")).persist(); e.count(); e }
        val eBp = t("B edges build byPart (from byCust)") {
          val e = eBc.repartition(col("part")).persist(); e.count(); e }
        val outB = hitsLoop("B", eBc, eBp, bcast = true)
        val d3 = outA.select(col("tp"), col("id"), col("s").as("s1"))
          .join(outB.select(col("tp"), col("id"), col("s").as("s2")),
            Seq("tp", "id"))
          .filter(col("s1") =!= col("s2")).count()
        println(s"[scratch] hits2 score mismatches: $d3 " +
          s"(A=${outA.count()} B=${outB.count()})")

      case "bfs2" =>
        // q125 A/B: seeds derived from the UNPERSISTED edge frame (the
        // old shape — edge build runs twice) vs seeds off the cache
        for (round <- 1 to 3) {
          t(s"A$round bfs (seeds rebuild edges)") {
            val li = graft.core.Tables.load(spark, dir, "lineitem")
              .select(col("l_orderkey"), col("l_partkey"))
            val e0 = li.alias("a")
              .join(li.alias("b"),
                col("a.l_orderkey") === col("b.l_orderkey") &&
                  col("a.l_partkey") < col("b.l_partkey"))
              .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
              .distinct()
            val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
            val seeds = e.select(col("src").as("node")).distinct()
              .filter(col("node") % 100 === 0)
            noop(graft.operators.AnalyticsOps.bfsFrom(e, seeds, 2))
            graft.core.EngineCache.releaseAll()
          }
          t(s"B$round bfs (seeds off cache)") {
            noop(graft.operators.AnalyticsOps.queries("q125_bfs_hops")(spark, dir))
            graft.core.EngineCache.releaseAll()
          }
        }

      case "mink2" =>
        // q249 A/B: separate count-agg + join vs window-carried count
        val docsF = graft.core.Tables.load(spark, dir, "documents")
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("doc_id").orderBy("l8")
        val wc = Window.partitionBy("doc_id")
        for (round <- 1 to 3) {
          t(s"A$round mink (agg+join)") {
            val scored = graft.operators.CorpusFilterOps
              .backoffScoredOf(docsF).persist()
            val m = scored.groupBy("doc_id")
              .agg(count(lit(1)).cast("int").as("n_tri"))
              .withColumn("m", greatest(lit(1),
                expr("CAST(floor(n_tri * 20 / 100) AS INT)")))
            noop(scored.withColumn("rn", row_number().over(w))
              .join(m, "doc_id")
              .filter(col("rn") <= col("m"))
              .groupBy("doc_id")
              .agg(first("n_tri").as("n_tri"), first("m").as("k_used"),
                sum("l8").as("s8"))
              .orderBy("doc_id"))
            scored.unpersist()
            graft.core.EngineCache.releaseAll()
          }
          t(s"B$round mink (window count)") {
            noop(graft.operators.CorpusFilterOps.queries("q249_mink_prob")(spark, dir))
            graft.core.EngineCache.releaseAll()
          }
        }

      case "win2" =>
        // q207 fingerprint-stage A/B: exploded rows + per-doc window min
        // (the old spelling — a full corpus-gram Exchange + Sort +
        // WindowExec + distinct exchange) vs the shipped in-scan array
        // spelling (zero exchanges). Output cross-checked as sets.
        import org.apache.spark.sql.expressions.Window
        import graft.operators.CorpusFilterOps.{WinK, WinW}
        val docsF = graft.operators.LlmQueries.docs(spark, dir)
        for (round <- 1 to 3) {
          val a = t(s"A$round winnowFps (window)") {
            val g = docsF
              .filter(length(col("text")) >= WinK)
              .select(col("doc_id"),
                explode(expr(s"sequence(1, length(text) - ${WinK - 1})")).as("pos"),
                col("text"))
              .select(col("doc_id"), col("pos"),
                graft.core.Determinism.xhash(
                  expr(s"substr(text, pos, $WinK)")).as("h"),
                (length(col("text")) - (WinK - 1)).as("ng"))
            val out = g.withColumn("fp",
                min("h").over(Window.partitionBy("doc_id").orderBy("pos")
                  .rowsBetween(0, WinW - 1)))
              .filter(col("pos") <= col("ng") - (WinW - 1))
              .select("doc_id", "fp").distinct().persist()
            noop(out); out
          }
          val b = t(s"B$round winnowFps (array)") {
            val out = graft.operators.CorpusFilterOps
              .winnowFps(docsF).persist()
            noop(out); out
          }
          println(s"[scratch] winnow fp mismatches: " +
            (a.exceptAll(b).count() + b.exceptAll(a).count()))
          a.unpersist(); b.unpersist(); graft.core.EngineCache.releaseAll()
        }

      case "rank2" =>
        // q117/q165 A/B: chained DistributedRank stages UNPERSISTED (the
        // old spelling — every downstream eager count/sample job
        // re-executes the earlier window chains) vs the shipped persisted
        // stages. Output cross-checked row-for-row.
        import graft.operators.DistributedRank
        for (round <- 1 to 3) {
          val a = t(s"A$round rfm (lazy chain)") {
            graft.core.Tables.load(spark, dir, "orders")
              .createOrReplaceTempView("orders")
            val r = graft.core.EngineCache.persisted(spark.sql(
              graft.operators.ScaleOps.rfmBaseSql(
                (from, to) => s"datediff($to, $from)")))
            val st = r.agg(count(lit(1)),
              min("recency_days").cast("double"), max("recency_days").cast("double"),
              min("frequency").cast("double"), max("frequency").cast("double"),
              min("monetary_cents").cast("double"), max("monetary_cents").cast("double")
            ).first()
            val n = st.getLong(0)
            val s1 = DistributedRank.rankOnlyBounded(
                r, "rk", "recency_days", desc = false, st.getDouble(1), st.getDouble(2),
                col("recency_days"), col("o_custkey"))
              .withColumn("r_score", DistributedRank.ntileFromRank("rk", n, 5))
              .drop("rk")
            val s2 = DistributedRank.rankOnlyBounded(
                s1, "rk", "frequency", desc = true, st.getDouble(3), st.getDouble(4),
                col("frequency").desc, col("o_custkey"))
              .withColumn("f_score", DistributedRank.ntileFromRank("rk", n, 5))
              .drop("rk")
            val out = DistributedRank.rankOnlyBounded(
                s2, "rk", "monetary_cents", desc = true, st.getDouble(5), st.getDouble(6),
                col("monetary_cents").desc, col("o_custkey"))
              .withColumn("m_score", DistributedRank.ntileFromRank("rk", n, 5))
              .select(col("o_custkey"), col("recency_days"), col("frequency"),
                col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"))
              .orderBy("o_custkey").persist()
            noop(out); out
          }
          val b = t(s"B$round rfm (persisted stages)") {
            val out = graft.operators.ScaleOps.queries("q117_rfm")(spark, dir).persist()
            noop(out); out
          }
          println(s"[scratch] rfm mismatches: " +
            (a.exceptAll(b).count() + b.exceptAll(a).count()))
          a.unpersist(); b.unpersist(); graft.core.EngineCache.releaseAll()
        }
        for (round <- 1 to 3) {
          val a = t(s"A$round curriculum (lazy chain)") {
            val d = graft.core.EngineCache.persisted(
              graft.operators.LlmQueries.docs(spark, dir)
                .select(col("doc_id"), col("source"),
                  graft.operators.LlmQueries.qualityCol.as("quality")))
            val ranked = DistributedRank.rankWithin(
              d, "source", "src_rank", "quality", desc = true,
              col("quality").desc, col("doc_id"))
            val out = DistributedRank.rankOnly(
                ranked, "global_pos", "src_rank", desc = false,
                col("src_rank"), col("source"))
              .select(col("global_pos"), col("doc_id"), col("source"),
                col("src_rank"), col("quality"))
              .orderBy("global_pos").persist()
            noop(out); out
          }
          val b = t(s"B$round curriculum (persisted stages)") {
            val out = graft.operators.LlmQueries
              .queries("q165_curriculum_order")(spark, dir).persist()
            noop(out); out
          }
          println(s"[scratch] curriculum mismatches: " +
            (a.exceptAll(b).count() + b.exceptAll(a).count()))
          a.unpersist(); b.unpersist(); graft.core.EngineCache.releaseAll()
        }
      case "pca2" =>
        // q170/q181 round-shape A/B: the exploded power-iteration round
        // (xc(vec_id, dim, x) — s via broadcast-join + GROUP BY vec_id
        // exchange, then xc ⋈ s corpus join, then the 64-row dim agg)
        // vs the shipped PACKED round (one cache scan, in-scan array
        // projection, 64-row agg). g values cross-checked bit-exact.
        val vecs = graft.core.Tables.load(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        def bridge(e: String, grid: String) =
          s"CAST(sum(CAST(floor(($e) * $grid + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / $grid"
        // exploded arm
        val xd = vecs.selectExpr("vec_id", "posexplode(embedding) AS (dim, xf)")
          .selectExpr("vec_id", "CAST(dim AS INT) AS dim", "CAST(xf AS DOUBLE) AS x")
        xd.createOrReplaceTempView("sc_xd")
        val mu = spark.sql(
          s"""SELECT dim, floor((CAST(sum(CAST(x AS DECIMAL(30,8))) AS DOUBLE)
              / count(x)) * 1e8 + 0.5) / 1e8 AS mu FROM sc_xd GROUP BY dim""").persist()
        mu.createOrReplaceTempView("sc_mu")
        val xcE = spark.sql(
          """SELECT sc_xd.vec_id, sc_xd.dim, sc_xd.x - sc_mu.mu AS xc
             FROM sc_xd JOIN sc_mu ON sc_xd.dim = sc_mu.dim""").persist()
        xcE.createOrReplaceTempView("sc_xce")
        println(s"[scratch] exploded rows: ${xcE.count()}")
        // packed arm
        val muRows = mu.collect()
        val muArr = new Array[Double](muRows.map(_.getInt(0)).max + 1)
        muRows.foreach(r => muArr(r.getInt(0)) = r.getDouble(1))
        def alit(a: Array[Double]) =
          s"array(${a.map(d => s"CAST('${d}' AS DOUBLE)").mkString(", ")})"
        val muLit = alit(muArr)
        val xcP = vecs.filter("embedding IS NOT NULL AND size(embedding) > 0")
          .selectExpr("vec_id",
            s"transform(embedding, (xf, i) -> CAST(xf AS DOUBLE) - element_at($muLit, i + 1)) AS xc")
          .persist()
        xcP.createOrReplaceTempView("sc_xcp")
        println(s"[scratch] packed rows: ${xcP.count()}")
        var vArr = muArr.map(_ => 1.0 / math.sqrt(muArr.length))
        for (round <- 1 to 3) {
          spark.catalog.dropTempView("sc_v")
          spark.createDataFrame(
            spark.sparkContext.parallelize(
              vArr.zipWithIndex.map { case (v, i) =>
                org.apache.spark.sql.Row(i, v) }.toIndexedSeq, 1),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("dim",
                org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("v",
                org.apache.spark.sql.types.DoubleType))))
            .createOrReplaceTempView("sc_v")
          val gE = t(s"A$round g round (exploded)") {
            spark.sql(s"""
              SELECT c.dim, ${bridge("s.s * c.xc", "1e9")} AS g
              FROM sc_xce c JOIN (
                SELECT c2.vec_id, ${bridge("c2.xc * v.v", "1e12")} AS s
                FROM sc_xce c2 JOIN sc_v v ON c2.dim = v.dim
                GROUP BY c2.vec_id) s ON c.vec_id = s.vec_id
              GROUP BY c.dim""").collect()
          }
          val vLit = alit(vArr)
          val sExpr = s"CAST(aggregate(transform(xc, (cx, i) -> " +
            s"CAST(floor((cx * element_at($vLit, i + 1)) * 1e12 + 0.5) AS DECIMAL(38,0))), " +
            s"CAST(0 AS DECIMAL(38,0)), (acc, e) -> acc + e) AS DOUBLE) / 1e12"
          val gP = t(s"B$round g round (packed)") {
            spark.sql(s"""
              SELECT dim, ${bridge("t1.s * t1.x", "1e9")} AS g
              FROM (SELECT s, posexplode(xc) AS (dim, x)
                    FROM (SELECT $sExpr AS s, xc FROM sc_xcp) t0) t1
              GROUP BY dim""").collect()
          }
          val eMap = gE.map(r => r.getInt(0) -> r.getDouble(1)).toMap
          val mism = gP.count(r => eMap(r.getInt(0)) != r.getDouble(1))
          println(s"[scratch] round $round g mismatches: $mism")
          val nrm = math.sqrt(gP.map(r =>
            math.floor(r.getDouble(1) * r.getDouble(1) * 1e12 + 0.5)).sum / 1e12)
          val next = new Array[Double](vArr.length)
          gP.foreach(r => next(r.getInt(0)) = r.getDouble(1) / nrm)
          vArr = next
        }
    }
    spark.stop()
    sys.exit(0)
  }
}
