package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * oracle_sql.json is written FIRST: if the harness's wall-clock timeout
  * kills this process mid-run, the already-dumped queries still get
  * compared (observed failure mode: timeout before the trailing json
  * write → the whole round's correctness artifact came back empty).
  * Each query also runs under a watchdog (SPARK_GRAFT_QUERY_TIMEOUT,
  * default 120 s) and the loop under a global deadline
  * (SPARK_GRAFT_VERIFY_DEADLINE, default 900 s) so one wedged query
  * cannot eat the remaining queries' budget. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // default 8 (not 4): at 122 queries the dump is query-bound, not
    // startup-bound, and the driver box has 32 cores — halving the loop
    // time is what keeps the full suite inside the harness wall clock
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val perQueryTimeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "120").toLong
    val deadlineSec =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_DEADLINE", "900").toLong
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    def newWorker() = java.util.concurrent.Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "verify-query"); t.setDaemon(true); t }
    var worker = newWorker()
    // dev loop: SPARK_GRAFT_QUERIES=q46,q51 dumps only matching prefixes
    // (oracle_sql.json always carries every oracle; tools/check.py skips
    // result dirs that weren't dumped)
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSeq)
    val loopStart = System.nanoTime()
    // numeric order (q01..q122): if the deadline ever hits, what gets
    // skipped is the newest-query suffix, never the core suite
    def qnum(n: String): Int =
      n.drop(1).takeWhile(_.isDigit) match { case "" => Int.MaxValue; case d => d.toInt }
    SparkEntry.queries.toSeq.sortBy { case (n, _) => (qnum(n), n) }
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .foreach { case (name, fn) =>
        if ((System.nanoTime() - loopStart) / 1e9 > deadlineSec) {
          System.err.println(s"[verify] $name SKIPPED: past ${deadlineSec}s deadline")
        } else {
          val fut = worker.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = {
              spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
              try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
                .parquet(s"$outDir/$name")
              finally spark.sparkContext.clearJobGroup()
            }
          })
          try fut.get(perQueryTimeoutSec, java.util.concurrent.TimeUnit.SECONDS)
          catch {
            case _: java.util.concurrent.TimeoutException =>
              spark.sparkContext.cancelJobGroup(name)
              try fut.get(10, java.util.concurrent.TimeUnit.SECONDS)
              catch { case _: Throwable =>
                // thread may be wedged pre-submission where cancelJobGroup
                // can't reach it — interrupt and start the next query on a
                // fresh thread (see Bench.run)
                worker.shutdownNow()
                worker = newWorker()
              }
              System.err.println(s"[verify] $name TIMEOUT after ${perQueryTimeoutSec}s")
            case e: java.util.concurrent.ExecutionException =>
              System.err.println(s"[verify] $name failed: ${e.getCause.getMessage}")
            case e: Throwable =>
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
          // same hygiene as Bench: engine persists + broadcast/shuffle
          // blocks pile up across 122 queries in one JVM unless dropped
          // and the ContextCleaner is given a GC to drain on
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          spark.catalog.clearCache()
          System.gc()
        }
      }
    spark.stop()
    sys.exit(0)
  }
}
