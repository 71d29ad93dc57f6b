package graft.sources

import org.apache.spark.sql.SparkSession

/** Object-store destinations for the archive. The reference carries two
  * parallel sink implementations — S3 multipart upload (s3.clj:40-80) and
  * Azure block blobs (azureblob.clj:20-46) — because it hand-rolls each
  * store's upload protocol. On Spark both stores are Hadoop filesystem
  * schemes behind the SAME parquet/checkpoint sink, so "Azure parity" is
  * a URI + credential configuration, not a second sink: every
  * `ArchiveConfig(outputPath = …)` works unchanged with an `s3a://`,
  * `abfss://`, or `file://` path.
  */
object ObjectStore {

  /** `s3a://bucket/prefix` — the S3 destination (reference s3.clj:15-20
    * key layout; the s3a committer does the multipart upload the
    * reference hand-rolled). */
  def s3aPath(bucket: String, prefix: String): String =
    s"s3a://$bucket/${strip(prefix)}"

  /** `abfss://container@account.dfs.core.windows.net/prefix` — the Azure
    * Data Lake Gen2 destination (reference azureblob.clj:20-46; the ABFS
    * connector replaces its hand-rolled block-blob client). */
  def abfssPath(container: String, account: String, prefix: String): String =
    s"abfss://$container@$account.dfs.core.windows.net/${strip(prefix)}"

  /** Static-key S3 credentials (reference reads them from its config edn,
    * etc/config.example.edn). Prefer instance/role credentials in
    * production — then no call is needed at all. */
  def configureS3(spark: SparkSession, accessKey: String, secretKey: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.access.key", accessKey)
    conf.set("fs.s3a.secret.key", secretKey)
  }

  /** Storage-account key for ABFS — the `:account-name`/`:account-key`
    * pair of the reference's azure config (azureblob.clj:20-29). */
  def configureAzure(spark: SparkSession, account: String, accountKey: String): Unit =
    spark.sparkContext.hadoopConfiguration.set(
      s"fs.azure.account.key.$account.dfs.core.windows.net", accountKey)

  private def strip(prefix: String): String = prefix.stripPrefix("/")
}
