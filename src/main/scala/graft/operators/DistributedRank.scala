package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank / ntile — the scale-safe replacement for
  * `row_number() OVER (ORDER BY ...)` and `ntile(k) OVER (ORDER BY ...)`
  * with no PARTITION BY, which Spark plans as a SINGLE-partition window
  * (every row through one task's sort — correct at sf0.1, dead at 100×).
  *
  * Bucketed two-pass scheme:
  *   1. bucket each row by SAMPLED-QUANTILE boundaries of the primary
  *      sort column. The boundaries are computed ONCE, driver-side, and
  *      frozen into the plan as literals — so even though the sample is
  *      seeded-random, the bucketing expression the executors run is a
  *      pure deterministic function of the row. (This is the property
  *      `repartitionByRange` lacks: its RangePartitioner re-samples
  *      INSIDE the plan, so two executions of the same lineage can
  *      disagree on boundaries under cache eviction / partial
  *      re-execution.) Quantile (equal-ROWS) boundaries keep bucket
  *      sizes balanced under heavy-tailed primaries — the norm at
  *      100 TB (revenue, token counts) — where an equal-width
  *      [min, max] split concentrates the mass into a few buckets
  *      (one revenue outlier → everything else in bucket 0);
  *   2. rank within each bucket with a bucket-PARTITIONED window over
  *      the full sort key (distributed: ~n/B rows per bucket);
  *   3. exact per-bucket counts (B scalars) prefix-summed on the driver
  *      into rank offsets, broadcast back.
  *
  * global rank = bucket offset + in-bucket rank. The full sort key MUST
  * be a total order (include a unique tiebreak, as every oracle here
  * already does); the result is then bit-identical to the
  * single-partition window's, under ANY recomputation, cache drop, or
  * partial re-execution — the offsets are EXACT counts of the frozen
  * (deterministic) bucketing, so boundary placement affects only
  * balance, never the ranks.
  *
  * Caveat: the bucket is a function of the primary VALUE, so ties share
  * a bucket by construction — a point mass (one value holding a huge
  * share of rows) cannot be split by ANY value-based bucketing. A
  * bucket exceeding `graft.rank.degenerateRowLimit` rows (default 8M)
  * throws rather than silently running that bucket as one task's sort —
  * loud at scale, while small inputs stay correct (one bucket is one
  * keyed partition). The fix at the call site is a higher-cardinality
  * leading sort column. Cost: two light passes over the input (count +
  * bounded sample collect; per-bucket counts collapse map-side) plus
  * one keyed window — a distributed sort's price.
  */
object DistributedRank {

  private val BCol = "__graft_bucket"

  /** Driver-side sample cap for boundary estimation: 64k doubles
    * (~512 KB) bounds the collect regardless of input size, and gives
    * per-boundary placement error O(1/√(64k / B)) — irrelevant, since
    * boundaries affect only balance, never correctness. */
  private val SampleTarget = 1 << 16

  /** Buckets: several per shuffle partition so bucket-size variance
    * smooths out across tasks; capped so the binary-search bucketing
    * expression (2 CASE nodes per boundary) stays well inside codegen's
    * 64 KB method budget and the driver-side offset array stays
    * trivial. */
  private[operators] def numBuckets(df: DataFrame): Int = {
    val p = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    math.min(512, p * 8)
  }

  /** Strictly-increasing boundary values at the (i/nb)-quantiles of a
    * seeded sample of `primary` (nulls dropped — see [[bucketOf]] for
    * their bucket). May return fewer than nb-1 boundaries when the
    * sample has few distinct values; empty when the input is empty or
    * single-valued (one bucket). One count pass + one bounded
    * sample-collect. */
  private[operators] def sampledBoundaries(df: DataFrame, primary: String,
                                           nb: Int): (Array[Double], Long) = {
    val v = df.select(col(primary).cast("double").as("v")).na.drop()
    val n = v.count()
    if (n == 0) return (Array.empty, 0L)
    val frac = math.min(1.0, SampleTarget.toDouble / n)
    val s = (if (frac >= 1.0) v else v.sample(frac, 42)).collect()
      .map(_.getDouble(0))
    if (s.isEmpty) return (Array.empty, n) // sample miss → one bucket; counts guard below
    java.util.Arrays.sort(s)
    ((1 until nb)
      .map(i => s(math.min(s.length - 1, (s.length.toLong * i / nb).toInt)))
      .distinct.sorted.toArray, n)
  }

  /** bucket(v) = #{boundaries ≤ v}, as a balanced binary-search CASE
    * tree: ⌈log2 B⌉ comparisons per row, pure codegen-able arithmetic,
    * monotone in v — so bucket order == sort order. A null primary goes
    * to bucket 0, which the caller's desc flip sends to the LAST
    * bucket — matching Spark's window defaults (asc → NULLS FIRST,
    * desc → NULLS LAST) either way. */
  private[operators] def bucketOf(v: Column, bnds: Array[Double]): Column = {
    def go(lo: Int, hi: Int): Column =
      if (lo > hi) lit(lo)
      else {
        val mid = (lo + hi) >>> 1
        when(v < lit(bnds(mid)), go(lo, mid - 1)).otherwise(go(mid + 1, hi))
      }
    when(v.isNull, lit(0)).otherwise(go(0, bnds.length - 1))
  }

  /** Shared bucket-column construction from quantile boundaries:
    * returns (frame + BCol, count of non-null primary values — 0 means
    * "nothing to rank", the empty-frame contract every caller keeps). */
  private def bucketize(df: DataFrame, primary: String,
                        desc: Boolean): (DataFrame, Long) = {
    val (bnds, n) = sampledBoundaries(df, primary, numBuckets(df))
    val nbEff = bnds.length + 1
    val raw = bucketOf(col(primary).cast("double"), bnds)
    val flipped = if (desc) lit(nbEff - 1) - raw else raw
    (df.withColumn(BCol, flipped), n)
  }

  private def degenerateLimit(df: DataFrame): Long =
    df.sparkSession.conf.getOption("graft.rank.degenerateRowLimit")
      .map(_.toLong).getOrElse(8000000L)

  /** The single-task-sort trip wire: ANY bucket past the limit throws.
    * With quantile boundaries a heavy bucket means a point mass — the
    * primary is (near-)constant over those rows, and no value-based
    * bucketing can split ties. Tunable so specs can arm the wire. */
  private def guardBucket(rows: Long, limit: Long, what: String,
                          primary: String, keyDesc: String): Unit =
    if (rows > limit) throw new IllegalArgumentException(
      s"$what: a single bucket holds $rows rows$keyDesc — quantile " +
        s"boundaries could not split it, so primary sort column " +
        s"'$primary' is (near-)constant over them (ties share a bucket " +
        "by construction). Pass a higher-cardinality leading sort " +
        "column as `primary`, or raise graft.rank.degenerateRowLimit " +
        "if a single-task sort of this size is acceptable.")

  /** Append `rankCol` = the global 1-based rank of each row.
    * `primary` is the leading sort column (numeric), `desc` its
    * direction; `sortCols` is the FULL sort order including `primary`
    * and a unique tiebreak, exactly as the equivalent window would
    * spell it. Fully lazy except the boundary sample and one exact
    * per-bucket count aggregate. */
  def rankOnly(df: DataFrame, rankCol: String, primary: String, desc: Boolean,
               sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val (bucketed, nTotal) = bucketize(df, primary, desc)
    if (nTotal == 0) // empty input (or all-null primary): nothing to rank
      return df.withColumn(rankCol, lit(1L)).limit(0)
    // exact counts -> offsets: B scalars, deterministic
    val counts = bucketed.groupBy(BCol).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val limit = degenerateLimit(df)
    counts.foreach { case (_, n) =>
      guardBucket(n, limit, "DistributedRank", primary, "") }
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

  /** [[rankOnly]] with caller-supplied primary-column bounds and
    * EQUAL-WIDTH buckets: a caller ranking several dimensions of one
    * frame (q117's three scores) pays ONE stats pass for all of them
    * instead of a sample pass per rank — the right trade when the
    * caller KNOWS the primary is near-uniform over [lo, hi] (scores,
    * percent ranks). Bounds may be loose (any [lo, hi] ⊇ the data
    * range is correct — out-of-range rows clamp into the edge
    * buckets); only bucket balance degrades with slack. */
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
    val counts = bucketed.groupBy(BCol).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val limit = degenerateLimit(df)
    counts.foreach { case (_, n) =>
      guardBucket(n, limit, "DistributedRank.rankOnlyBounded", primary, "") }
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
    * that. Boundaries are GLOBAL (one sample pass serves every key);
    * per-key balance follows when keys draw from similar ranges, and
    * exactness never depends on balance. NULL keys are first-class: the
    * offset join is null-safe (`<=>`), matching the window's
    * treat-null-as-a-group semantics. Bit-identical to the keyed window
    * under the same total sort order (`sortCols` must include a unique
    * tiebreak). */
  def rankWithin(df: DataFrame, key: String, rankCol: String,
                 primary: String, desc: Boolean,
                 sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val spark = df.sparkSession
    val (bucketed, nTotal) = bucketize(df, primary, desc)
    if (nTotal == 0) return df.withColumn(rankCol, lit(1L)).limit(0)
    val counts = bucketed.groupBy(col(key), col(BCol))
      .agg(count(lit(1)).as("n")).collect()
    require(counts.length <= (1 << 20),
      s"DistributedRank.rankWithin: ${counts.length} (key, bucket) cells — " +
        "this helper is for dimension-cardinality keys; use a plain keyed " +
        "window for high-cardinality keys (it is already distributed)")
    val limit = degenerateLimit(df)
    val rows = counts.groupBy(_.get(0)).toSeq.flatMap { case (k, rs) =>
      rs.foreach(r => guardBucket(r.getLong(2), limit,
        "DistributedRank.rankWithin", primary, s" within key $k"))
      var acc = 0L
      rs.sortBy(_.getInt(1)).map { r =>
        val o = acc; acc += r.getLong(2); Row(k, r.getInt(1), o)
      }
    }
    val schema = StructType(Seq(
      df.schema(key).copy(name = "__k", nullable = true),
      StructField(BCol + "_o", IntegerType), StructField("__off", LongType)))
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    val w = Window.partitionBy(col(key), col(BCol)).orderBy(sortCols: _*)
    // null-safe key equality: a NULL key is one window group, and a
    // plain equi-join (null != null) would silently drop its rows
    bucketed
      .withColumn(rankCol, row_number().over(w).cast("long"))
      .join(broadcast(offDf),
        col(key) <=> col("__k") && col(BCol) === col(BCol + "_o"))
      .withColumn(rankCol, col(rankCol) + col("__off"))
      .drop(BCol, BCol + "_o", "__k", "__off")
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
    val (bucketed, nTotal) = bucketize(df, primary, desc)
    if (nTotal == 0)
      return df.withColumn(rankCol, lit(1L))
        .withColumn(scanCol, lit(0L)).limit(0)
    val counts = bucketed.groupBy(col(key), col(BCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("long")).as("v")).collect()
    require(counts.length <= (1 << 20),
      s"DistributedRank.rankAndScanWithin: ${counts.length} (key, bucket) " +
        "cells — this helper is for dimension-cardinality keys")
    val limit = degenerateLimit(df)
    val rows = counts.groupBy(_.get(0)).toSeq.flatMap { case (k, rs) =>
      rs.foreach(r => guardBucket(r.getLong(2), limit,
        "DistributedRank.rankAndScanWithin", primary, s" within key $k"))
      var accN = 0L
      var accV = 0L
      rs.sortBy(_.getInt(1)).map { r =>
        val (oN, oV) = (accN, accV)
        accN += r.getLong(2); accV += r.getLong(3)
        Row(k, r.getInt(1), oN, oV)
      }
    }
    val schema = StructType(Seq(
      df.schema(key).copy(name = "__k", nullable = true),
      StructField(BCol + "_o", IntegerType), StructField("__off", LongType),
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
      .join(broadcast(offDf),
        col(key) <=> col("__k") && col(BCol) === col(BCol + "_o"))
      .withColumn(rankCol, col(rankCol) + col("__off"))
      .withColumn(scanCol, col(scanCol) + col("__voff"))
      .drop(BCol, BCol + "_o", "__k", "__off", "__voff")
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
