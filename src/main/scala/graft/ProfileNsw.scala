package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixed-size-cohort soak harness for the NSW maintenance verbs — the
  * honesty leg the corpus-proportional q264/q265/q279 cohorts cannot
  * provide: those grow WITH the corpus (vec_id % 10), so their 10×
  * soak lines cannot distinguish "linear in batch" from "linear in
  * corpus". This main holds the cohort FIXED (default: the 200 ids in
  * [200, 400), present verbatim at sf0.1 and in the 10× soak fixture's
  * copy 0) and times one verb per fresh JVM against pre-built at-rest
  * artifacts, printing wall seconds plus the two quantities the
  * O(batch + affected) claim is actually about: the AFFECTED-set size
  * (near-constant for the edge trigger when the batch is fixed — it is
  * bounded by the cohort's in-degree, not the corpus) and the
  * candidate-row count the keep-side generation materializes (affected
  * × bucket population — the term that scales with bucket OCCUPANCY,
  * i.e. stays O(batch) exactly when band geometry is sized to the
  * corpus). The geometry IS the knob here: SPARK_GRAFT_NSW_GEOM=frozen
  * replays the registry 60/10 constants (the r12 leg, saturated at the
  * 10× fixture by design), =scaled sizes buckets to the corpus via
  * [[graft.operators.NswGeometry.forCorpus]] — the production claim
  * the r13 soak leg demonstrates. Not part of the driver contract;
  * tooling only.
  *
  * env: SPARK_GRAFT_SF_DIR (fixture), SPARK_GRAFT_NSW_OP
  * (prep|rebuild|append|delete|update), SPARK_GRAFT_NSW_COHORT
  * (SQL predicate over vec_id), SPARK_GRAFT_NSW_WORKDIR (artifact
  * cache, per-scale AND per-geometry — artifacts signed under one
  * geometry must never feed a verb run under another),
  * SPARK_GRAFT_NSW_GEOM (frozen|scaled|B:R). `prep` builds the
  * at-rest inputs untimed; the verb runs then read them like any
  * serve would. */
object ProfileNsw {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val op = sys.env.getOrElse("SPARK_GRAFT_NSW_OP", "delete")
    val cohort = sys.env.getOrElse("SPARK_GRAFT_NSW_COHORT",
      "vec_id >= 200 AND vec_id < 400")
    val work = sys.env.getOrElse("SPARK_GRAFT_NSW_WORKDIR", "/tmp/nswprof")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val S = graft.operators.ScaleOps
    val vecs = graft.core.Tables.load(spark, dir, "embeddings")
    // SPARK_GRAFT_NSW_GEOM: "frozen" (registry 60/10 — the r12 leg),
    // "scaled" (NswGeometry.forCorpus on this fixture's corpus count —
    // the production sizing the soak demonstrates), or explicit "B:R"
    // (bitsPerBand:bands). Prep and verb runs on the same fixture see
    // the same count, so artifacts and repairs share one geometry.
    val geom = sys.env.getOrElse("SPARK_GRAFT_NSW_GEOM", "frozen") match {
      case "frozen" => graft.operators.NswGeometry.frozen
      case "scaled" => graft.operators.NswGeometry.forCorpus(vecs.count())
      case s => val Array(b, r) = s.split(":").map(_.toInt)
        graft.operators.NswGeometry(b, r)
    }
    println(s"[nswprof] geom bitsPerBand=${geom.bitsPerBand} " +
      s"bands=${geom.bands} buckets=${geom.bucketsPerBand}")
    def sigsOf(df: DataFrame): DataFrame = S.nswSigsOf(df, geom)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[nswprof] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val updated = vecs.selectExpr("vec_id",
      s"CASE WHEN $cohort THEN transform(embedding, x -> -x) " +
        "ELSE embedding END AS embedding")
    op match {
      case "prep" => // untimed: the frozen at-rest inputs every verb reads
        sigsOf(vecs).write.mode("overwrite").parquet(s"$work/sigs")
        S.nswGraphOf(vecs, geom).write.mode("overwrite").parquet(s"$work/adj")
        sigsOf(vecs.filter(s"NOT ($cohort)")).write.mode("overwrite")
          .parquet(s"$work/bsigs")
        S.nswGraphOf(vecs.filter(s"NOT ($cohort)"), geom).write.mode("overwrite")
          .parquet(s"$work/badj")
        println(s"[nswprof] prep done: ${vecs.count()} vectors, cohort " +
          s"${vecs.filter(cohort).count()}")
      case "rebuild" =>
        time("rebuild")(noop(S.nswGraphOf(updated, geom)))
      case "append" =>
        val (bs, ba) = (spark.read.parquet(s"$work/bsigs"),
          spark.read.parquet(s"$work/badj"))
        time("append")(noop(S.nswGraphAppendOf(vecs, bs, ba, cohort, geom)))
        val aff = S.nswAppendAffectedOf(bs, sigsOf(vecs.filter(cohort)), geom)
        println(s"[nswprof] append affected=${aff.count()}")
      case "delete" =>
        val (fs, fa) = (spark.read.parquet(s"$work/sigs"),
          spark.read.parquet(s"$work/adj"))
        time("delete")(noop(S.nswGraphDeleteOf(fs, fa, vecs, cohort, geom)))
        val aff = S.nswDeleteAffectedOf(fa,
          fs.filter(cohort).select("vec_id"))
        println(s"[nswprof] delete affected=${aff.count()}")
      case "update" =>
        val (fs, fa) = (spark.read.parquet(s"$work/sigs"),
          spark.read.parquet(s"$work/adj"))
        time("update")(noop(S.nswGraphUpdateOf(updated, fs, fa, cohort, geom)))
        val affD = S.nswDeleteAffectedOf(fa,
          fs.filter(cohort).select("vec_id"))
        val affA = S.nswAppendAffectedOf(fs.filter(s"NOT ($cohort)"),
          sigsOf(updated.filter(cohort)), geom)
        println(s"[nswprof] update affected=" +
          affD.unionByName(affA).distinct().count())
      case other => sys.error(s"unknown SPARK_GRAFT_NSW_OP: $other")
    }
    graft.core.EngineCache.releaseAll()
    spark.stop()
    sys.exit(0)
  }
}
