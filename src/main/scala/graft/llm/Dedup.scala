package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.core.Determinism.{xhashSql, xhashSeededSql}

/** Deduplication operators for training-data pipelines: exact (hash
  * group-by), MinHash+LSH, SimHash, and character-n-gram Jaccard.
  *
  * Scale design (the whole point of LSH): candidate generation is a
  * shuffle-join on (band_id, band_hash) — O(n·bands) rows exchanged, never
  * the O(n²) pair space. Exact Jaccard runs only on LSH candidates. At
  * 100 TB: signatures are one codegen'd projection over the corpus scan,
  * the band join shuffles ~bands× the doc-id space (tiny vs the text), and
  * skewed buckets (boilerplate docs) are handled by AQE skew-join splitting.
  *
  * Every hash is the cross-engine md5-based family from
  * [[graft.core.Determinism]], so the DuckDB oracle reproduces the exact
  * candidate sets and scores.
  */
object Dedup {

  /** Cross-engine seeded hash of a string expr — Spark SQL side. */
  private def hashExpr(seed: Int, s: String): String =
    s"CAST(conv(substr(md5(concat('s$seed:', $s)), 1, 15), 16, 10) AS BIGINT)"

  /** Exact dedup by content hash: group on a fingerprint, keep the lowest
    * id as the cluster representative. `keyExpr` picks the normalization
    * (raw text / bag-of-words / lowercase-collapsed). */
  def exactClusters(docs: DataFrame, idCol: String, keyCol: Column): DataFrame =
    docs.select(col(idCol), keyCol.as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** MinHash signature columns mh0..mh{k-1} over a shingle array column. */
  def withMinhash(docs: DataFrame, shingleExpr: String, numHashes: Int): DataFrame =
    (0 until numHashes).foldLeft(docs) { (df, i) =>
      df.withColumn(s"mh$i",
        expr(s"array_min(transform($shingleExpr, s -> ${hashExpr(i, "s")}))"))
    }

  /** LSH banding: one row per (doc, band), band hash = md5 of the band's
    * minhash slice. bandsRows = (bands, rowsPerBand). */
  def withBands(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandStructs = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => s"CAST(mh${b * rows + r} AS STRING)")
        .mkString(", ',', ")
      struct(lit(b).as("band_id"), expr(s"md5(concat($slice))").as("band_hash"))
    }
    sig.withColumn("band", explode(array(bandStructs: _*)))
      .withColumn("band_id", col("band.band_id"))
      .withColumn("band_hash", col("band.band_hash"))
      .drop("band")
  }

  /** Candidate pairs from shared LSH buckets (distinct over bands), with
    * exact Jaccard on the distinct shingle arrays, thresholded.
    *
    * The self-join shuffles both sides on (band_id, band_hash) — co-located
    * buckets, no broadcast of the corpus. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int, numHashes: Int, bands: Int,
                      tau: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      expr(wordShinglesExpr(textCol, shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = withBands(withMinhash(sh, "sh", numHashes), numHashes, bands)
    val a = banded.select(col("id").as("id_a"), col("sh").as("sh_a"),
      col("band_id"), col("band_hash"))
    val b = banded.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("band_id").as("band_id_b"), col("band_hash").as("band_hash_b"))
    a.join(b,
        col("band_id") === col("band_id_b") &&
        col("band_hash") === col("band_hash_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("inter",
        expr("size(filter(sh_a, x -> array_contains(sh_b, x)))"))
      .withColumn("jaccard",
        expr("CAST(inter AS DOUBLE) / (size(sh_a) + size(sh_b) - inter)"))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** DuckDB oracle for [[minhashLshPairs]] — built from the same constants
    * so candidate sets match exactly. */
  def minhashLshPairsSql(table: String, idCol: String, textCol: String,
                         shingleN: Int, numHashes: Int, bands: Int,
                         tau: Double, orderBy: String): String = {
    val rows = numHashes / bands
    val mh = (0 until numHashes).map(i =>
      s"list_min(list_transform(sh, s -> ${xhashSeededSql("s", i)})) AS mh$i").mkString(",\n    ")
    val bandCases = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => s"mh${b * rows + r}::VARCHAR").mkString(" || ',' || ")
      s"WHEN $b THEN md5($slice)"
    }.mkString(" ")
    val bandVals = (0 until bands).map(b => s"($b)").mkString(",")
    s"""
    WITH t AS (
      SELECT $idCol AS id, ${wordShinglesSql(textCol, shingleN)} AS sh
      FROM $table
      WHERE len(${wordsSql(textCol)}) >= $shingleN),
    sig AS (SELECT id, sh, $mh FROM t),
    banded AS (
      SELECT id, sh, b.band_id,
        CASE b.band_id $bandCases END AS band_hash
      FROM sig, (VALUES $bandVals) b(band_id)),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.id < b.id),
    scored AS (
      SELECT id_a, id_b,
        len(list_filter(ta.sh, x -> list_contains(tb.sh, x))) * 1.0 /
        (len(ta.sh) + len(tb.sh) - len(list_filter(ta.sh, x -> list_contains(tb.sh, x))))
          AS jaccard
      FROM cand JOIN t ta ON cand.id_a = ta.id JOIN t tb ON cand.id_b = tb.id)
    SELECT id_a, id_b, jaccard FROM scored
    WHERE jaccard >= $tau
    ORDER BY $orderBy"""
  }

  /** 16-bit SimHash from per-token hashes: per bit, sum ±1 contributions
    * over all tokens (duplicates weighted); bit set iff the sum is
    * positive. Integer arithmetic end-to-end → exact cross-engine. */
  def simhash16(textCol: String): Column = {
    val whs = s"transform(${wordsExpr(textCol)}, w -> ${hashExpr(99, "w")})"
    val bits = (0 until 16).map { b =>
      s"(CASE WHEN aggregate($whs, 0L, (acc, h) -> acc + (shiftright(h, $b) & 1) * 2 - 1) > 0 " +
        s"THEN ${1 << b}L ELSE 0L END)"
    }.mkString(" + ")
    expr(bits)
  }

  def simhash16Sql(textCol: String): String = {
    val whs = s"list_transform(${wordsSql(textCol)}, w -> ${xhashSeededSql("w", 99)})"
    val bits = (0 until 16).map { b =>
      s"(CASE WHEN list_sum(list_transform($whs, h -> ((h >> $b) & 1) * 2 - 1)) > 0 " +
        s"THEN ${1 << b} ELSE 0 END)"
    }.mkString(" + ")
    s"($bits)::BIGINT"
  }

  /** SimHash near-dup pairs: bucket on the high byte (LSH-style prefix
    * blocking), verify with Hamming distance on the full signature. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val sig = docs.select(col(idCol).as("id"), simhash16(textCol).as("sig"))
    val a = sig.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sig.select(col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b,
        expr("shiftright(sig_a, 8) = shiftright(sig_b, 8)") && col("id_a") < col("id_b"))
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  def simhashPairsSql(table: String, idCol: String, textCol: String,
                      maxHamming: Int, orderBy: String): String = s"""
    WITH sig AS (SELECT $idCol AS id, ${simhash16Sql(textCol)} AS sig FROM $table)
    SELECT a.id AS id_a, b.id AS id_b, bit_count(xor(a.sig, b.sig))::INT AS hamming
    FROM sig a JOIN sig b ON (a.sig >> 8) = (b.sig >> 8) AND a.id < b.id
    WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming
    ORDER BY $orderBy"""

  /** Character-n-gram Jaccard near-dup: same LSH skeleton as
    * [[minhashLshPairs]] but over char shingles (catches small edits that
    * word shingles miss). */
  def charNgramPairs(docs: DataFrame, idCol: String, textCol: String,
                     n: Int, numHashes: Int, bands: Int, tau: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      expr(charShinglesExpr(textCol, n)).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = withBands(withMinhash(sh, "sh", numHashes), numHashes, bands)
    val a = banded.select(col("id").as("id_a"), col("sh").as("sh_a"),
      col("band_id"), col("band_hash"))
    val b = banded.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("band_id").as("band_id_b"), col("band_hash").as("band_hash_b"))
    a.join(b,
        col("band_id") === col("band_id_b") &&
        col("band_hash") === col("band_hash_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("inter",
        expr("size(filter(sh_a, x -> array_contains(sh_b, x)))"))
      .withColumn("jaccard",
        expr("CAST(inter AS DOUBLE) / (size(sh_a) + size(sh_b) - inter)"))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  def charNgramPairsSql(table: String, idCol: String, textCol: String,
                        n: Int, numHashes: Int, bands: Int, tau: Double,
                        orderBy: String): String = {
    val rows = numHashes / bands
    val mh = (0 until numHashes).map(i =>
      s"list_min(list_transform(sh, s -> ${xhashSeededSql("s", i)})) AS mh$i").mkString(",\n    ")
    val bandCases = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => s"mh${b * rows + r}::VARCHAR").mkString(" || ',' || ")
      s"WHEN $b THEN md5($slice)"
    }.mkString(" ")
    val bandVals = (0 until bands).map(b => s"($b)").mkString(",")
    s"""
    WITH t AS (
      SELECT $idCol AS id, ${charShinglesSql(textCol, n)} AS sh
      FROM $table WHERE length($textCol) >= $n),
    sig AS (SELECT id, sh, $mh FROM t),
    banded AS (
      SELECT id, sh, b.band_id, CASE b.band_id $bandCases END AS band_hash
      FROM sig, (VALUES $bandVals) b(band_id)),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.id < b.id),
    scored AS (
      SELECT id_a, id_b,
        len(list_filter(ta.sh, x -> list_contains(tb.sh, x))) * 1.0 /
        (len(ta.sh) + len(tb.sh) - len(list_filter(ta.sh, x -> list_contains(tb.sh, x))))
          AS jaccard
      FROM cand JOIN t ta ON cand.id_a = ta.id JOIN t tb ON cand.id_b = tb.id)
    SELECT id_a, id_b, jaccard FROM scored
    WHERE jaccard >= $tau
    ORDER BY $orderBy"""
  }
}
