package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed global rank / ntile — the scale-safe replacement for
  * `row_number() OVER (ORDER BY ...)` and `ntile(k) OVER (ORDER BY ...)`
  * with no PARTITION BY, which Spark plans as a SINGLE-partition window
  * (every row through one task's sort — correct at sf0.1, dead at 100×).
  *
  * Shape: the same two-pass scheme Spark itself uses for a distributed
  * global ORDER BY —
  *   1. `repartitionByRange` on the sort key (RangePartitioner samples
  *      boundaries; each of the P partitions holds a contiguous key range),
  *   2. local sort + per-partition 1-based index attached in ONE
  *      `mapPartitions` pass (no second shuffle — the index rides the
  *      range exchange's partitioning),
  *   3. per-partition counts (a P-row aggregate) prefix-summed on the
  *      driver into rank offsets, broadcast-joined back.
  *
  * global rank = partition offset + local index. The caller's sort key
  * MUST be a total order (include a unique tiebreak column, as every
  * oracle here already does): then the rank is unique and deterministic
  * REGARDLESS of where the sampled range boundaries fall, so the result
  * is bit-identical to the single-partition window's — same oracle, no
  * single-task bottleneck. Cost: one range shuffle + one P-row agg,
  * exactly a distributed sort's price.
  */
object DistributedRank {

  private val PidCol = "__graft_pid"

  /** Append `rankCol` = the global 1-based rank of each row under
    * `sortCols` (must include a unique tiebreak). Returns the ranked
    * frame and the total row count.
    *
    * The offsets are computed IN-PLAN (per-partition counts → non-equi
    * self-join over the P-row counts frame → broadcast back), NOT via a
    * driver collect: RangePartitioner samples boundaries with an
    * RDD-id-derived seed, so a SEPARATE action over the same lineage can
    * land rows in different partitions — offsets collected in action A
    * would not describe the partitions of action B. In one plan the
    * range exchange is a single reused stage (asserted in PlanSpec), so
    * the counts and the assignment always describe the same shuffle
    * output. The total row count is boundary-independent, so a plain
    * `df.count()` is safe for it. */
  def withGlobalRank(df: DataFrame, rankCol: String, sortCols: Column*): (DataFrame, Long) = {
    val spark = df.sparkSession
    val p = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val outSchema = ranged.schema
      .add(PidCol, IntegerType, nullable = false)
      .add(rankCol, LongType, nullable = false)
    val local = ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var i = 0L
      it.map { r => i += 1; Row.fromSeq(r.toSeq :+ pid :+ i) }
    }(Encoders.row(outSchema))
    // P rows after the partial agg: offset(pid) = Σ counts of prior pids
    val counts = local.groupBy(PidCol).agg(count(lit(1)).as("__n"))
    val prior = counts.select(col(PidCol).as("__ppid"), col("__n").as("__pn"))
    val offs = counts.join(prior, col("__ppid") < col(PidCol), "left")
      .groupBy(PidCol).agg(coalesce(sum("__pn"), lit(0L)).as("__off"))
    val ranked = local.join(broadcast(offs), PidCol)
      .withColumn(rankCol, col(rankCol) + col("__off"))
      .drop(PidCol, "__off")
    (ranked, df.count())
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
