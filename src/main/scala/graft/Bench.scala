package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}.
  *
  * Each query is forced through a `noop`-format write — unlike `count()`,
  * which lets Catalyst prune every computed column and skip the actual
  * work, noop materializes every row of the real result (full expression
  * evaluation, joins, windows) with zero sink I/O, so the timing is the
  * query, not the measurement harness. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // per-query isolation: operators persist intermediates (LSH
      // signatures, component-label rounds) for the duration of their
      // query; dropping them between timings keeps query N's storage
      // from evicting query N+1's working set (the timing should be the
      // query, not neighbors' leftover cache pressure)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      // Spark frees broadcast/shuffle blocks via the ContextCleaner, which
      // only fires when the JVM happens to GC; across 100+ queries in one
      // JVM the blocks otherwise pile up until the heap thrashes (observed:
      // queries 60+ running 10-80x slower). One explicit GC per query keeps
      // the cleaner draining at a steady ~100ms cost.
      System.gc()
    }
    // JVM + parquet-footer warmup on the flagship query (excluded from timing)
    try run(SparkEntry.queries("q01_agg_summary")) catch { case _: Throwable => () }
    // dev loop: SPARK_GRAFT_QUERIES=q46,q51 benches only matching prefixes
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { run(fn); None } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        Some(e.getClass.getSimpleName)
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // The harness captures only the tail of this process's output, so the
    // summary line must stay short: keys are the unambiguous qNN prefix of
    // each query name ("q10_window_running" -> "q10"), keeping the whole
    // JSON line within the capture window even at 100+ queries.
    def short(name: String): String = name.takeWhile(_ != '_')
    // a failed query reports -1, never a normal-looking (fast) timing
    val qs = results.map { case (k, v, err) =>
      "\"" + short(k) + "\":" + (if (err.isDefined) "-1" else f"$v%.3f")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => "\"" + short(k) + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":$sfNum}""")
    spark.stop()
  }
}
