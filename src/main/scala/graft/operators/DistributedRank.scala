package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank / ntile — the scale-safe replacement for
  * `row_number() OVER (ORDER BY ...)` and `ntile(k) OVER (ORDER BY ...)`
  * with no PARTITION BY, which Spark plans as a SINGLE-partition window
  * (every row through one task's sort — correct at sf0.1, dead at 100×).
  *
  * Bucketed two-pass scheme, every step a PURE FUNCTION OF THE DATA:
  *   1. bucket each row by an equal-width split of the primary sort
  *      column's exact [min, max] (one cheap aggregate — deterministic,
  *      unlike `repartitionByRange`, whose RangePartitioner SAMPLES with
  *      an RDD-id-derived seed: two executions of the same lineage can
  *      disagree on boundaries, and any consistency scheme built on it
  *      inherits that fragility under cache eviction / plan nesting);
  *   2. rank within each bucket with a bucket-PARTITIONED window over
  *      the full sort key (distributed: ~n/B rows per bucket);
  *   3. exact per-bucket counts (B scalars) prefix-summed on the driver
  *      into rank offsets, broadcast back.
  *
  * global rank = bucket offset + in-bucket rank. The full sort key MUST
  * be a total order (include a unique tiebreak, as every oracle here
  * already does); the result is then bit-identical to the
  * single-partition window's, under ANY recomputation, cache drop, or
  * partial re-execution — there is no sampled state to drift.
  *
  * Caveat: a (near-)constant primary column degenerates to few buckets
  * (the ties all share one bucket); give the helper the highest-
  * cardinality leading sort column. A total one-bucket collapse above
  * `graft.rank.degenerateRowLimit` rows (default 8M) now throws rather
  * than silently re-creating the single-partition window — the failure
  * is loud at scale, while small inputs stay correct (one bucket is one
  * keyed partition). Cost: two light passes over the
  * input (min/max + counts; both collapse map-side) plus one keyed
  * window — a distributed sort's price.
  */
object DistributedRank {

  private val BCol = "__graft_bucket"

  /** Buckets: several per shuffle partition so bucket-size variance
    * smooths out across tasks; capped so the driver-side offset array
    * stays trivial. */
  private def numBuckets(df: DataFrame): Int = {
    val p = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    math.min(4096, p * 8)
  }

  /** Append `rankCol` = the global 1-based rank of each row.
    * `primary` is the leading sort column (numeric), `desc` its
    * direction; `sortCols` is the FULL sort order including `primary`
    * and a unique tiebreak, exactly as the equivalent window would
    * spell it. Fully lazy except two small deterministic aggregates
    * (min/max, per-bucket counts). */
  def rankOnly(df: DataFrame, rankCol: String, primary: String, desc: Boolean,
               sortCols: Column*): DataFrame = {
    val mm = df.agg(
      min(col(primary)).cast("double"), max(col(primary)).cast("double")).first()
    if (mm.isNullAt(0)) // empty input: nothing to rank
      return df.withColumn(rankCol, lit(1L)).limit(0)
    rankOnlyBounded(df, rankCol, primary, desc,
      mm.getDouble(0), mm.getDouble(1), sortCols: _*)
  }

  /** [[rankOnly]] with caller-supplied primary-column bounds: a caller
    * ranking several dimensions of one frame (q117's three scores) pays
    * ONE stats pass for all of them instead of a min/max action per
    * rank. Bounds may be loose (any [lo, hi] ⊇ the data range is
    * correct — out-of-range rows clamp into the edge buckets); only
    * bucket balance degrades with slack. */
  def rankOnlyBounded(df: DataFrame, rankCol: String, primary: String,
                      desc: Boolean, lo: Double, hi: Double,
                      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val nb = numBuckets(df)
    val span = hi - lo + 1.0
    // monotone in the primary (double conversion, positive scale, floor
    // all preserve order), so bucket order == sort order
    val raw = floor((col(primary).cast("double") - lit(lo)) / lit(span) * lit(nb))
      .cast("int")
    val flipped = if (desc) lit(nb - 1) - raw else raw
    val bucketed = df.withColumn(
      BCol, least(greatest(flipped, lit(0)), lit(nb - 1)))
    // exact counts -> offsets: B scalars, deterministic
    val counts = bucketed.groupBy(BCol).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // Degeneracy guard: a (near-)constant primary collapses every row
    // into one bucket, silently re-creating the single-partition window
    // this operator exists to avoid. Small inputs are still correct that
    // way (one bucket == one keyed partition), so only fail when the
    // collapsed bucket is big enough that the single-task sort is the
    // actual scale hazard. Tunable so specs can exercise the trip wire.
    if (counts.length == 1 && nb > 1) {
      val limit = spark.conf.getOption("graft.rank.degenerateRowLimit")
        .map(_.toLong).getOrElse(8000000L)
      if (counts.head._2 > limit) throw new IllegalArgumentException(
        s"DistributedRank: all ${counts.head._2} rows fell into one of $nb " +
        s"buckets — primary sort column '$primary' is (near-)constant. " +
        "Pass the highest-cardinality leading sort column as `primary`, " +
        "or raise graft.rank.degenerateRowLimit if a single-task sort of " +
        "this size is acceptable.")
    }
    var acc = 0L
    val offsets = counts.map { case (b, n) => val o = acc; acc += n; (b, o) }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF(BCol, "__off")
    val w = Window.partitionBy(col(BCol)).orderBy(sortCols: _*)
    bucketed
      .withColumn(rankCol, row_number().over(w).cast("long"))
      .join(broadcast(offDf), BCol)
      .withColumn(rankCol, col(rankCol) + col("__off"))
      .drop(BCol, "__off")
  }

  /** Keyed variant: rank within each `key` group — the scale-safe
    * replacement for `row_number() OVER (PARTITION BY key ORDER BY ...)`
    * when a single group can outgrow one task (a dominant source in a
    * 100 TB corpus is one window partition = one task's sort). Same
    * bucketed two-pass scheme with the count/offset step keyed: the
    * driver sees |key-cardinality| × B scalars, so this is for
    * DIMENSION-cardinality keys (sources, languages, shards) — for
    * per-user keys the plain keyed window is already distributed, use
    * that. Bit-identical to the keyed window under the same total sort
    * order (`sortCols` must include a unique tiebreak). */
  def rankWithin(df: DataFrame, key: String, rankCol: String,
                 primary: String, desc: Boolean,
                 sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val spark = df.sparkSession
    val mm = df.agg(
      min(col(primary)).cast("double"), max(col(primary)).cast("double")).first()
    if (mm.isNullAt(0)) return df.withColumn(rankCol, lit(1L)).limit(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val nb = numBuckets(df)
    val span = hi - lo + 1.0
    val raw = floor((col(primary).cast("double") - lit(lo)) / lit(span) * lit(nb))
      .cast("int")
    val flipped = if (desc) lit(nb - 1) - raw else raw
    val bucketed = df.withColumn(
      BCol, least(greatest(flipped, lit(0)), lit(nb - 1)))
    val counts = bucketed.groupBy(col(key), col(BCol))
      .agg(count(lit(1)).as("n")).collect()
    require(counts.length <= (1 << 20),
      s"DistributedRank.rankWithin: ${counts.length} (key, bucket) cells — " +
        "this helper is for dimension-cardinality keys; use a plain keyed " +
        "window for high-cardinality keys (it is already distributed)")
    val limit = spark.conf.getOption("graft.rank.degenerateRowLimit")
      .map(_.toLong).getOrElse(8000000L)
    val rows = counts.groupBy(_.get(0)).toSeq.flatMap { case (k, rs) =>
      if (rs.length == 1 && nb > 1 && rs.head.getLong(2) > limit)
        throw new IllegalArgumentException(
          s"DistributedRank.rankWithin: all ${rs.head.getLong(2)} rows of " +
            s"key $k fell into one of $nb buckets — primary '$primary' is " +
            "(near-)constant within that key")
      var acc = 0L
      rs.sortBy(_.getInt(1)).map { r =>
        val o = acc; acc += r.getLong(2); Row(k, r.getInt(1), o)
      }
    }
    val schema = StructType(Seq(
      df.schema(key).copy(nullable = true),
      StructField(BCol, IntegerType), StructField("__off", LongType)))
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    val w = Window.partitionBy(col(key), col(BCol)).orderBy(sortCols: _*)
    bucketed
      .withColumn(rankCol, row_number().over(w).cast("long"))
      .join(broadcast(offDf), Seq(key, BCol))
      .withColumn(rankCol, col(rankCol) + col("__off"))
      .drop(BCol, "__off")
  }

  /** Keyed rank + EXCLUSIVE running total in one bucketed pass — the
    * distributed prefix sum (scan). The scale-safe replacement for
    *   row_number() OVER (PARTITION BY key ORDER BY ...)   and
    *   sum(v) OVER (PARTITION BY key ORDER BY ...
    *                ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)
    * together: same bucket decomposition as [[rankWithin]], with the
    * per-(key, bucket) aggregate carrying an exact value sum next to
    * the row count, so the driver prefix-sums BOTH into offsets and
    * one keyed window serves rank and in-bucket running total. The
    * value column must be integral (LongType after cast) — the scan is
    * then exact int64 and order-independent, the same reason every
    * oracle bridge here is integer. `scanCol` is the sum of `valueCol`
    * over all STRICTLY EARLIER rows in the (key, sort) order — the
    * form token-budget sharding consumes (a row starts where its
    * predecessors end). */
  def rankAndScanWithin(df: DataFrame, key: String, rankCol: String,
                        scanCol: String, valueCol: String,
                        primary: String, desc: Boolean,
                        sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val spark = df.sparkSession
    val mm = df.agg(
      min(col(primary)).cast("double"), max(col(primary)).cast("double")).first()
    if (mm.isNullAt(0))
      return df.withColumn(rankCol, lit(1L))
        .withColumn(scanCol, lit(0L)).limit(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val nb = numBuckets(df)
    val span = hi - lo + 1.0
    val raw = floor((col(primary).cast("double") - lit(lo)) / lit(span) * lit(nb))
      .cast("int")
    val flipped = if (desc) lit(nb - 1) - raw else raw
    val bucketed = df.withColumn(
      BCol, least(greatest(flipped, lit(0)), lit(nb - 1)))
    val counts = bucketed.groupBy(col(key), col(BCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("long")).as("v")).collect()
    require(counts.length <= (1 << 20),
      s"DistributedRank.rankAndScanWithin: ${counts.length} (key, bucket) " +
        "cells — this helper is for dimension-cardinality keys")
    val limit = spark.conf.getOption("graft.rank.degenerateRowLimit")
      .map(_.toLong).getOrElse(8000000L)
    val rows = counts.groupBy(_.get(0)).toSeq.flatMap { case (k, rs) =>
      if (rs.length == 1 && nb > 1 && rs.head.getLong(2) > limit)
        throw new IllegalArgumentException(
          s"DistributedRank.rankAndScanWithin: all ${rs.head.getLong(2)} " +
            s"rows of key $k fell into one of $nb buckets — primary " +
            s"'$primary' is (near-)constant within that key")
      var accN = 0L
      var accV = 0L
      rs.sortBy(_.getInt(1)).map { r =>
        val (oN, oV) = (accN, accV)
        accN += r.getLong(2); accV += r.getLong(3)
        Row(k, r.getInt(1), oN, oV)
      }
    }
    val schema = StructType(Seq(
      df.schema(key).copy(nullable = true),
      StructField(BCol, IntegerType), StructField("__off", LongType),
      StructField("__voff", LongType)))
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    val w = Window.partitionBy(col(key), col(BCol)).orderBy(sortCols: _*)
    bucketed
      .withColumn(rankCol, row_number().over(w).cast("long"))
      .withColumn(scanCol,
        sum(col(valueCol).cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn(scanCol, coalesce(col(scanCol), lit(0L)))
      .join(broadcast(offDf), Seq(key, BCol))
      .withColumn(rankCol, col(rankCol) + col("__off"))
      .withColumn(scanCol, col(scanCol) + col("__voff"))
      .drop(BCol, "__off", "__voff")
  }

  /** `ntile(k)` from a global rank: first (n mod k) tiles get
    * ceil(n/k) rows, the rest floor(n/k) — the exact SQL-standard
    * semantics, so the result matches `ntile(k) OVER (ORDER BY ...)`
    * bit for bit. Pure integer arithmetic (`div`), no fp. */
  def ntileFromRank(rankCol: String, n: Long, k: Int): Column = {
    val q = n / k               // small-tile size
    val r = n % k               // number of large tiles
    val big = q + 1             // large-tile size
    val cut = r * big           // ranks <= cut live in large tiles
    val safeQ = math.max(q, 1L) // else-branch divisor; unreached when q=0
    expr(
      s"cast(case when `$rankCol` <= $cut then (`$rankCol` + ${big - 1}) div $big" +
      s" else $r + ((`$rankCol` - $cut + ${safeQ - 1}) div $safeQ) end as int)")
  }
}
