package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profiler for the q195 z-order planner path.
  * Not part of the driver contract. */
object ProfileZorder {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val r0 = graft.core.Tables.load(spark, dir, "lineitem")
      .selectExpr("l_partkey AS p", "l_suppkey AS s",
        "l_orderkey AS o", "CAST(l_linenumber AS BIGINT) AS ln")
      .cache()
    time("load+persist")(r0.count())
    val b = time("bounds")(
      r0.agg(min("p"), max("p"), min("s"), max("s"), count(lit(1))).head())
    val (pmn, pmx, smn, smx, n) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4))
    val zb = 16
    val zcol = (0 until zb).flatMap { i =>
      Seq(s"shiftleft((shiftright(ps, $i) & 1), ${2 * i + 1})",
        s"shiftleft((shiftright(ss, $i) & 1), ${2 * i})")
    }.mkString("(", " + ", ")")
    val rows = r0
      .withColumn("ps", expr(s"((p - $pmn) * ${1L << zb}) div ${pmx - pmn + 1}"))
      .withColumn("ss", expr(s"((s - $smn) * ${1L << zb}) div ${smx - smn + 1}"))
      .withColumn("z", expr(zcol))
      .cache()
    time("zscaled+persist")(rows.count())
    val ranked = time("rank_z_plan")(graft.operators.DistributedRank
      .rankOnly(rows, "rk", "z", desc = false, col("z"), col("o"), col("ln")))
    time("rank_z_exec")(ranked.write.format("noop").mode("overwrite").save())
    val stats = time("filestats_z")(
      ranked.withColumn("file_id", expr(s"((rk - 1) * 64) div $n"))
        .groupBy("file_id")
        .agg(min("p"), max("p"), min("s"), max("s")).count())
    val rankedP = graft.operators.DistributedRank
      .rankOnly(rows, "rk", "p", desc = false, col("p"), col("o"), col("ln"))
    time("rank_p_exec")(rankedP.write.format("noop").mode("overwrite").save())
    time("rowsmatch")(rows.filter(
      s"p between $pmn and $pmx and s between $smn and $smx").count())
    time("full_q195")(graft.operators.ScaleOps
      .queries("q195_zorder_layout")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("full_q195_again")(graft.operators.ScaleOps
      .queries("q195_zorder_layout")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    println("[prof] stats rows=" + stats)
    spark.stop()
  }
}
