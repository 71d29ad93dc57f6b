package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Streaming telemetry — the engine analog of the reference's metering
  * (telemetry.clj:18-50,56-81 reports records/s and upload bytes/s per
  * topic to Riemann/StatsD; kafka.clj:53,59-60 and s3.clj:22,27,31-36 are
  * the instrumented call sites). Spark already fires the equivalent
  * events: every micro-batch ends with a `StreamingQueryProgress` whose
  * rates are measured at the same boundary the reference metered by hand.
  * This listener turns them into StatsD lines.
  *
  * Design:
  *  - [[Telemetry]] is a `StreamingQueryListener`: zero overhead on the
  *    data path (events ride the listener bus, not the query), works for
  *    every query on the session at once, no operator changes.
  *  - Metric lines use the StatsD wire protocol (`name:value|type`), so
  *    the `report` sink can be [[Telemetry.udpReporter]] pointed at any
  *    statsd/telegraf agent — operationally the reference's
  *    riemann/statsd split, minus the bespoke client.
  *  - [[Telemetry.snapshot]] keeps the latest per-query stats in memory
  *    for REPL/ops introspection (the reference's `(status)` REPL verb,
  *    user.clj) and for tests.
  *
  * Executor/JVM-level metrics (heap, GC, task counts) are NOT re-metered
  * here: Spark's built-in metrics system already ships a StatsD sink
  * (`spark.metrics.conf` → `*.sink.statsd.class`); this module covers the
  * per-query streaming progress that system does not emit.
  */
class Telemetry(prefix: String = "graft",
                report: String => Unit = _ => ())
    extends StreamingQueryListener {

  import Telemetry.QueryStats

  private val stats = new ConcurrentHashMap[java.util.UUID, QueryStats]()

  /** Latest stats per query name (falls back to the query id). */
  def snapshot: Map[String, QueryStats] =
    stats.asScala.values.map(s => s.name -> s).toMap

  private def gauge(name: String, metric: String, v: Double): String =
    f"$prefix.$name.$metric:$v%.2f|g"
  private def counter(name: String, metric: String, v: Long): String =
    s"$prefix.$name.$metric:$v|c"
  private def timer(name: String, metric: String, v: Long): String =
    s"$prefix.$name.$metric:$v|ms"

  override def onQueryStarted(event: QueryStartedEvent): Unit = {
    val name = Option(event.name).getOrElse(event.id.toString)
    report(counter(name, "started", 1))
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val prev = Option(stats.get(p.id)).getOrElse(QueryStats(name, 0, 0, 0, 0, 0))
    stats.put(p.id, QueryStats(
      name = name,
      batches = prev.batches + 1,
      totalRows = prev.totalRows + p.numInputRows,
      rowsPerSec = orZero(p.inputRowsPerSecond),
      processedPerSec = orZero(p.processedRowsPerSecond),
      batchDurationMs = p.batchDuration))
    report(counter(name, "input_rows", p.numInputRows))
    report(gauge(name, "rows_per_sec", orZero(p.inputRowsPerSecond)))
    report(gauge(name, "processed_rows_per_sec", orZero(p.processedRowsPerSecond)))
    report(timer(name, "batch_duration_ms", p.batchDuration))
    // bounded in-flight visibility: the reference metered its buffer sizes
    // (async.clj:8-14); the engine equivalent is stateful-operator state rows
    p.stateOperators.foreach { so =>
      report(gauge(name, s"state.${so.operatorName}.rows", so.numRowsTotal.toDouble))
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    val name = Option(stats.get(event.id)).map(_.name).getOrElse(event.id.toString)
    report(counter(name, if (event.exception.isDefined) "failed" else "stopped", 1))
  }

  private def orZero(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d
}

object Telemetry {

  final case class QueryStats(name: String, batches: Long, totalRows: Long,
                              rowsPerSec: Double, processedPerSec: Double,
                              batchDurationMs: Long)

  /** Attach a telemetry listener to every streaming query on the session.
    * Returns the listener so callers can read [[Telemetry.snapshot]] and
    * detach with `spark.streams.removeListener`. */
  def attach(spark: SparkSession, prefix: String = "graft",
             report: String => Unit = _ => ()): Telemetry = {
    val t = new Telemetry(prefix, report)
    spark.streams.addListener(t)
    t
  }

  /** Batch-job analog of the per-query progress metrics: named
    * `Observation` metrics ride the existing action (accumulator-backed —
    * NO extra job, unlike a count()), and land as the same StatsD lines
    * the streaming listener emits. The reference meters only its
    * streaming path; archive-adjacent batch jobs (compaction, dedup
    * sweeps) deserve the same records-processed visibility. Returns the
    * instrumented frame and a completion callback to invoke after the
    * action has run. */
  def observeBatch(df: org.apache.spark.sql.DataFrame, name: String,
                   prefix: String = "graft",
                   report: String => Unit = _ => ())
      : (org.apache.spark.sql.DataFrame, () => Map[String, Any]) = {
    import org.apache.spark.sql.functions._
    val obs = org.apache.spark.sql.Observation(name)
    val instrumented = df.observe(obs, count(lit(1)).as("rows"))
    val finish = () => {
      val metrics = obs.get
      metrics.foreach {
        case (k, v: Long) => report(s"$prefix.$name.$k:$v|c")
        case (k, v) => report(s"$prefix.$name.$k:$v|g")
      }
      metrics
    }
    (instrumented, finish)
  }

  /** StatsD UDP reporter — fire-and-forget datagrams, the protocol's
    * contract (a dead agent must never stall the pipeline; the reference
    * got the same decoupling from its dropping-buffer channel,
    * telemetry.clj:56-60). */
  def udpReporter(host: String, port: Int): String => Unit = {
    val socket = new DatagramSocket()
    val addr = InetAddress.getByName(host)
    line => {
      val bytes = line.getBytes(StandardCharsets.UTF_8)
      try socket.send(new DatagramPacket(bytes, bytes.length, addr, port))
      catch { case _: java.io.IOException => () } // never fail the pipeline
    }
  }
}
