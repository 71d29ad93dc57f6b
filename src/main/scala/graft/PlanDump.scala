package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-capture tooling for the optimization rounds (guide §1/§7.2):
  * writes `.explain("formatted")` for each named query to
  * `<outdir>/<query>_<tag>.txt` so plan-shape claims in
  * OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Not part of the driver contract; tooling only.
  *
  * env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_QUERIES (comma prefixes, default: all),
  * SPARK_GRAFT_PLAN_OUT (default plans/r13), SPARK_GRAFT_PLAN_TAG
  * (suffix, default "before").
  *
  * The capture is the ANALYZED+planned initial plan (AQE's
  * `isFinalPlan=false` form — what `df.explain` prints before
  * execution); queries whose construction itself runs jobs (at-rest
  * builds, iteration barriers) execute those exactly as the bench
  * would, so the dumped plan is the final serve stage's.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "plans/r13")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSeq)
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), txt)
        println(s"[plandump] wrote $name ($tag)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      } finally {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(true))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
