package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Throwaway stage-by-stage profiler for the LSH dedup path. Not part of
  * the driver contract. */
object ProfileDedup {
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
    val docs = graft.core.Tables.load(spark, dir, "documents").cache()
    println("[prof] docs=" + docs.count())
    println("[prof] " + docs.selectExpr("avg(length(text))", "max(length(text))",
      "avg(size(split(trim(text), '\\\\s+')))").head)
    val sh = docs.selectExpr("doc_id AS id", "char_shingles(text, 4) AS sh")
      .filter("size(sh) > 0")
    time("warm")(sh.count())
    time("shingles")(sh.selectExpr("sum(size(sh))").head)
    val hs = sh.selectExpr("id", "md5_i64(sh) AS hs")
    time("shingles+hs")(hs.selectExpr("sum(size(hs))").head)
    val sig = hs.selectExpr("id", "hs", "minhash_sig(hs, 16) AS sig")
    time("shingles+hs+sig")(sig.selectExpr("sum(element_at(sig, 1))").head)
    val bandKeys = (0 until 2).map { b =>
      val slice = (0 until 8).map(r => s"CAST(element_at(sig, ${b * 8 + r + 1}) AS STRING)")
        .mkString(", ',', ")
      s"concat('b$b:', $slice)"
    }.mkString(", ")
    val banded = sig.selectExpr("id", "hs", s"explode(array($bandKeys)) AS bk")
    time("banded")(banded.count())
    val bucketStats = banded.groupBy("bk").count()
    println("[prof] buckets: " + bucketStats.selectExpr("count(1)", "max(count)",
      "sum(count*(count-1)/2)").head)
    val a = banded.select(col("id").as("id_a"), col("hs").as("hs_a"), col("bk"))
    val bb = banded.select(col("id").as("id_b"), col("hs").as("hs_b"),
      col("bk").as("bk_b"))
    val joined = a.join(bb, col("bk") === col("bk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("hs_a"), col("hs_b"))
    time("join")(joined.count())
    val dd = joined.dropDuplicates("id_a", "id_b")
    time("join+dropDup")(dd.count())
    time("full")(graft.operators.LlmQueries.queries("q35_dedup_minhash")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("full_ngram")(graft.operators.LlmQueries.queries("q37_dedup_ngram")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
