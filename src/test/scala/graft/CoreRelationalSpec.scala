package graft

import graft.operators.CoreRelational
import org.apache.spark.sql.functions.col

/** Value-level properties of the relational operators that the DuckDB
  * hash gate can't express (approx paths with engine-specific sketches). */
class CoreRelationalSpec extends SparkSpec {

  test("approx_percentile scale path agrees with exact percentiles") {
    val exact = CoreRelational.statsAgg(spark, sfDir)
      .select("l_returnflag", "median_qty", "p90_qty").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = CoreRelational.statsAggApprox(spark, sfDir).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (med, p90) = exact(r.getString(0))
      // accuracy 10000 ≈ 1e-4 rank error; quantity spans 1..50, so even a
      // generous value tolerance is a few percent
      assert(math.abs(r.getDouble(2) - med) <= math.max(1.0, med * 0.05),
        s"median off for ${r.getString(0)}: got ${r.getDouble(2)}, exact $med")
      assert(math.abs(r.getDouble(3) - p90) <= math.max(1.0, p90 * 0.05),
        s"p90 off for ${r.getString(0)}: got ${r.getDouble(3)}, exact $p90")
    }
  }
}
