package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}.
  *
  * Each query is forced through a `noop`-format write — unlike `count()`,
  * which lets Catalyst prune every computed column and skip the actual
  * work, noop materializes every row of the real result (full expression
  * evaluation, joins, windows) with zero sink I/O, so the timing is the
  * query, not the measurement harness.
  *
  * The run is bounded three ways, because the harness that invokes this
  * kills the process on a wall-clock timeout and an unbounded run loses
  * the WHOLE round's numbers (observed: one host-stalled query → rc=124,
  * no JSON line, empty bench artifact):
  *   1. per-query watchdog — each query runs in a worker thread under its
  *      own job group; past SPARK_GRAFT_QUERY_TIMEOUT (default 60 s) the
  *      group is cancelled and the query records -1 + "Timeout";
  *   2. global deadline — SPARK_GRAFT_BENCH_DEADLINE, defaulting to
  *      max(600, 5.5 × |queries|) seconds so it SCALES with the suite
  *      (a fixed 600 s DeadlineSkipped the newest 35/252 queries on a
  *      slower host); the main loop gets ~80% of it and the re-measure
  *      passes keep the reserved ~20%, so medians always run. Skipped
  *      queries record -1 + "DeadlineSkip" (never a fake timing);
  *   3. shutdown hook — if the process is SIGTERMed anyway, the JSON
  *      summary line for everything measured so far is still printed.
  *
  * After the loop, the slowest SPARK_GRAFT_BENCH_MEDIAN_TOP (default 5)
  * queries are re-measured up to twice more within the remaining deadline
  * and reported as the median of their samples — the host's ~2-4x
  * run-to-run noise otherwise turns one unlucky timing on a heavy query
  * into a phantom cross-round regression. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 90 s: the heaviest queries run 5-9 s in-suite, but this host has
    // shown rare one-off stalls (observed: q104 5 s standalone, 9 s
    // typical in-suite, one >60 s spike in ~10 full runs) — the wider
    // watchdog turns such a spike into a slow timing instead of a
    // recorded error, while still bounding a genuinely wedged query.
    val perQueryTimeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "90").toLong
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (name, seconds, error) — guarded by its own lock because the
    // shutdown hook reads it from another thread mid-run.
    val results = ArrayBuffer.empty[(String, Double, Option[String])]
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    // The harness captures only the tail of this process's output, so the
    // summary line must stay short: keys are the unambiguous qNN prefix of
    // each query name ("q10_window_running" -> "q10"), keeping the whole
    // JSON line within the capture window even at 100+ queries.
    def short(name: String): String = name.takeWhile(_ != '_')
    // Emitted cumulatively after EVERY query, not once at the end: the
    // harness parses the LAST complete JSON line from the output tail, so
    // a mid-run kill (observed rc=124 round 4 — whole artifact lost)
    // degrades to "timings up to the last finished query" instead of
    // nothing. Each line is complete and self-consistent.
    // Full-fidelity sidecar next to the stdout line: long query names,
    // 3-decimal timings, every error — written (best-effort) every emit.
    // The harness's artifact is built from a 2000-char stdout tail; at
    // 134 queries the cumulative line brushes that window, and this file
    // is where the complete numbers live regardless of truncation. The
    // driver runs sbt from the repo root, so the file lands in-tree and
    // rides the round commit.
    val fullDetailPath =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    // Previous round's per-query timings, read BEFORE this run's first
    // emit overwrites the sidecar: the drift re-measure pass compares
    // against these to catch "3x slower than last round" outliers that
    // the slowest-5 median pass misses (a 6 s reading in a 2 s query is
    // not top-5 in a suite whose heavies run 8-10 s, but it IS the
    // shape that masked-as-noise regressions take). Regex, not a JSON
    // lib: the file is this process's own single-line output format.
    val priorTxt: String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(fullDetailPath)), "UTF-8")
      catch { case _: Throwable => "" }
    val priorTimes: Map[String, Double] =
      "\"(q[0-9]+[^\"]*)\":(-?[0-9.]+)".r.findAllMatchIn(priorTxt)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .filter(_._2 > 0).toMap
    // Every prior entry including -1 failures — a partial run is one
    // that covers FEWER queries than the sidecar knows about.
    val priorQueryCount: Int =
      "\"(q[0-9]+[^\"]*)\":(-?[0-9.]+)".r.findAllMatchIn(priorTxt).size
    val priorSf: Option[String] =
      "\"sf\":([0-9.]+)".r.findFirstMatchIn(priorTxt).map(_.group(1))
    // Sidecar overwrite guard (round-11 lesson): a SPARK_GRAFT_QUERIES-
    // filtered dev run or an off-sf soak run must never REPLACE the
    // full-suite priors — one 1-query sf1 soak record committed over the
    // 278-query sidecar starved the next round's drift re-measure of
    // priors for every other query, and a 5-13x warmup cluster shipped
    // un-medianed. Decided after `selected` is known (below) via this
    // var: restricted or off-sf runs write their detail to a side path
    // and the full-suite sidecar survives untouched.
    @volatile var detailPath = fullDetailPath + ".partial"
    // Locale-pinned number formatting: on a comma-decimal-locale JVM the
    // default-locale f"" / String.format would print 1,23 and make the
    // bench line unparseable JSON — the whole round's numbers lost.
    def fmt(v: Double, dec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
    def emit(): Unit = {
      val snap = results.synchronized(results.toList)
      // a failed/skipped query reports -1, never a normal-looking timing.
      def qline(dec: Int) = snap.map { case (k, v, err) =>
        "\"" + short(k) + "\":" + (if (err.isDefined) "-1" else fmt(v, dec))
      }.mkString("{", ",", "}")
      def code(e: String): String = e match {
        case "Timeout" => "T"
        case "DeadlineSkip" => "S"
        case other => other.take(12)
      }
      // cap the error dict: -1 in queries already marks each failure, and
      // an unbounded dict (58 deadline skips) pushes the line past the
      // 2000-char tail window
      val allErrs = snap.collect { case (k, _, Some(e)) => (short(k), code(e)) }
      val errs = (allErrs.take(8).map { case (k, c) => "\"" + k + "\":\"" + c + "\"" } ++
        (if (allErrs.size > 8) Seq("\"more\":\"" + (allErrs.size - 8) + "\"") else Nil))
        .mkString("{", ",", "}")
      val total = snap.collect { case (_, v, None) => v }.sum
      def line(dec: Int) =
        s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":${qline(dec)},"errors":$errs,"sf":$sfNum}"""
      // 2-decimal timings normally; if the line would overflow the tail
      // window (leaving ~150 chars for sbt's trailing chatter), degrade to
      // 1 decimal — a truncated line parses as NOTHING and loses the round
      val out = { val l2 = line(2); if (l2.length <= 1850) l2 else line(1) }
      println(out)
      System.out.flush()
      try {
        val detail = snap.map { case (k, v, err) =>
          "\"" + k + "\":" + (if (err.isDefined) "-1" else fmt(v, 3))
        }.mkString("{", ",", "}")
        val allErrsFull = snap.collect { case (k, _, Some(e)) =>
          "\"" + k + "\":\"" + e.take(40) + "\"" }.mkString("{", ",", "}")
        java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath),
          s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":$detail,"errors":$allErrsFull,"sf":$sfNum}""")
      } catch { case _: Throwable => () } // sidecar is best-effort only
    }
    // On SIGTERM: first gag log4j so the dying SparkContext's error flood
    // (RejectedExecutionException storms from late task results) cannot
    // push the JSON line out of the harness's 2000-char tail window, then
    // emit the final cumulative line.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try org.apache.logging.log4j.core.config.Configurator
        .setRootLevel(org.apache.logging.log4j.Level.OFF)
      catch { case _: Throwable => () }
      emit()
    }))

    // One long-lived worker: queries run here under a per-query job group
    // so the main thread can cancel just that group's jobs on timeout.
    def newWorker() = java.util.concurrent.Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "bench-query"); t.setDaemon(true); t }
    var worker = newWorker()
    // Job groups abandoned on timeout: the interrupted-but-still-running
    // worker thread can submit NEW jobs after its cancelJobGroup (it was
    // mid-planning when cancelled), and those would compete for cores and
    // skew later timings. Re-cancel every abandoned group before each new
    // timing (cancelling an idle group is a no-op).
    val abandoned = scala.collection.mutable.Set.empty[String]
    def run(name: String,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            timeoutSec: Long = perQueryTimeoutSec): Option[String] = {
      abandoned.synchronized {
        abandoned.foreach(g => spark.sparkContext.cancelJobGroup(g))
      }
      val fut = worker.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          finally spark.sparkContext.clearJobGroup()
        }
      })
      val err =
        try { fut.get(timeoutSec, java.util.concurrent.TimeUnit.SECONDS); None }
        catch {
          case _: java.util.concurrent.TimeoutException =>
            spark.sparkContext.cancelJobGroup(name)
            // give the cancelled write a moment to unwind so the worker is
            // free for the next query (10 s, not more: unwind waits come
            // straight out of the global deadline's budget)
            try fut.get(10, java.util.concurrent.TimeUnit.SECONDS)
            catch { case _: Throwable =>
              // cancelJobGroup only reaches SUBMITTED jobs — a thread still
              // in analysis/planning never sees it (observed: "Cannot find
              // active jobs" for a timed-out warmup, then every later query
              // queued behind the wedged thread, corrupting its timing).
              // Interrupt it and replace the executor so the next query
              // starts on a free thread immediately; remember the group so
              // jobs it submits post-planning still get cancelled.
              worker.shutdownNow()
              worker = newWorker()
              abandoned.synchronized { abandoned += name }
            }
            System.err.println(s"[bench] $name TIMEOUT after ${timeoutSec}s")
            Some("Timeout")
          case e: java.util.concurrent.ExecutionException =>
            System.err.println(s"[bench] $name FAILED: ${e.getCause.getMessage}")
            Some(e.getCause.getClass.getSimpleName)
          case e: Throwable =>
            Some(e.getClass.getSimpleName)
        }
      // per-query isolation: operators persist intermediates (LSH
      // signatures, component-label rounds) for the duration of their
      // query; dropping them between timings keeps query N's storage
      // from evicting query N+1's working set (the timing should be the
      // query, not neighbors' leftover cache pressure)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      // Spark frees broadcast/shuffle blocks via the ContextCleaner, which
      // only fires when the JVM happens to GC; across 100+ queries in one
      // JVM the blocks otherwise pile up until the heap thrashes (observed:
      // queries 60+ running 10-80x slower). One explicit GC per query keeps
      // the cleaner draining at a steady ~100ms cost.
      System.gc()
      err
    }
    // JVM + parquet-footer warmup (excluded from timing), generous budget:
    // warmup isn't timed, and killing it just moves the cold-start cost
    // into the first timed queries. Three probes on the BENCH fixture
    // (footers + first shuffle + the agg/join/window codegen paths) —
    // round 10's driver box charged those first-use costs to q26/q29
    // (20.4/16.3 s vs 1.8/2.0 s builder) because warmup only ever
    // exercised the agg.
    run("warmup", SparkEntry.queries("q01_agg_summary"), timeoutSec = 120)
    run("warmup_join", SparkEntry.queries("q03_join_revenue"), timeoutSec = 60)
    run("warmup_window", SparkEntry.queries("q09_window_topk"), timeoutSec = 60)
    // ...and the remaining head-of-suite plan SHAPES on the TINY sibling
    // fixture (codegen + exchange setup are data-size-independent; the
    // point is to compile them, not to scan data): round 11's driver
    // artifact still charged first-use union/distinct, full-outer-join
    // and rollup codegen to q06-q32 (q13 set-ops read 10.7 s vs 0.8 s
    // builder-side — pure cold start at the suite head).
    locally {
      val warmDir = {
        val p = java.nio.file.Paths.get(sfDir).toAbsolutePath.getParent
        val c = if (p == null) null else p.resolve("sf0.001")
        if (c != null && java.nio.file.Files.isDirectory(c)) c.toString
        else sfDir
      }
      def warmShape(tag: String, q: String): Unit =
        SparkEntry.queries.get(q).foreach { fn =>
          run(tag, (s, _) => fn(s, warmDir), timeoutSec = 60)
        }
      warmShape("warmup_setops", "q13_set_ops")
      warmShape("warmup_fullouter", "q07_join_full_outer")
      warmShape("warmup_rollup", "q16_rollup")
    }
    // dev loop: SPARK_GRAFT_QUERIES=q46,q51 benches only matching prefixes.
    // Numeric order (q01..q122), not lexicographic — if the deadline hits,
    // the skipped suffix is the newest queries, never the core suite
    // (lexicographically "q42".."q99" sort AFTER "q122" and got skipped
    // while the exotic tail ran — observed once, wrong priority).
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSeq)
    def qnum(n: String): Int =
      n.drop(1).takeWhile(_.isDigit) match { case "" => Int.MaxValue; case d => d.toInt }
    val selected = SparkEntry.queries.toSeq.sortBy { case (n, _) => (qnum(n), n) }
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // Overwrite-guard decision (see detailPath above): only a run that
    // covers at least as many queries as the existing sidecar AND runs
    // at the same sf may claim the full-suite sidecar path; everything
    // else (dev-filtered runs, off-sf soaks) writes beside it.
    val fullRun = selected.size >= priorQueryCount &&
      priorSf.forall(_ == sfNum)
    if (fullRun) detailPath = fullDetailPath
    else System.err.println(s"[bench] restricted run (${selected.size} of " +
      s"$priorQueryCount prior queries, sf=$sfNum vs prior " +
      s"${priorSf.getOrElse("?")}) — detail goes to $detailPath; " +
      s"$fullDetailPath preserved")
    // Global deadline, SCALED WITH SUITE SIZE: a fixed 600 s default fit
    // the 227-query suite but silently DeadlineSkipped the newest 35 of
    // 252 on a ~30%-slower host (round 10: loop hit 600 s at q217, and
    // the median/drift re-measure passes — the whole defense against
    // this host's contiguous noise clusters — got zero budget). The
    // suite runs ~1.5-1.9 s/query healthy; 3.5 s/query (≈ 900 s at 252)
    // was sized to absorb a 2x-slower box — and round 12 measured that
    // margin exhausted: a full 294-query pass on a loaded host ran
    // ~2.4 s/query IN-QUERY plus scheduling overhead and DeadlineSkipped
    // the last 62 queries at 3.5 s/query. 4.5 s/query keeps ~30% headroom
    // over that worst measured pass (loop budget 0.8·4.5·294 ≈ 1058 s vs
    // 707 s in-query + overhead) while staying materially tighter than
    // the round-12 5.5 patch — BENCH_NOISE_r12.md confirmed the >2x
    // cluster that motivated 5.5 was host load, so the watchdog keeps
    // its teeth and the medians (below) absorb the noise instead.
    // Overshooting the harness's own wall clock stays non-fatal — the
    // cumulative per-query emission keeps everything measured so far.
    val deadlineSec = sys.env.get("SPARK_GRAFT_BENCH_DEADLINE").map(_.toLong)
      .getOrElse(math.max(600L, math.ceil(4.5 * selected.size).toLong))
    // Budget split: the main loop may consume at most ~80% of the
    // deadline; the remaining ~20% is RESERVED for the re-measure passes
    // below, so they always run even when the loop runs long. (Round 10:
    // loop exhausted the whole budget, re-measure fired zero times, and
    // a q89-q112 noise cluster shipped un-medianed.)
    val loopDeadlineSec = deadlineSec * 8 / 10
    val loopStart = System.nanoTime()
    selected.foreach { case (name, fn) =>
      val pastDeadline = (System.nanoTime() - loopStart) / 1e9 > loopDeadlineSec
      if (pastDeadline) {
        System.err.println(
          s"[bench] $name SKIPPED: past ${loopDeadlineSec}s loop deadline")
        results.synchronized { results += ((name, -1.0, Some("DeadlineSkip"))) }
      } else {
        val t0 = System.nanoTime()
        val err = run(name, fn)
        val sec = (System.nanoTime() - t0) / 1e9
        results.synchronized { results += ((name, sec, err)) }
        emit()
      }
    }
    // Noise control: this host's run-to-run variance is ~2-4x, and the
    // slowest queries dominate cross-round comparisons — one unlucky
    // timing reads as a regression. Re-measure the slowest successful
    // queries twice more (deadline budget permitting) and record each
    // query's MEDIAN of its up-to-3 samples. Medians only ever replace
    // the single-sample figure, so a query that times out on a re-run
    // keeps its original successful timing.
    val medianN =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MEDIAN_TOP", "5").toInt
    val slowest = results.synchronized {
      results.filter(_._3.isEmpty).sortBy(-_._2).take(medianN).toList
    }
    // Always-median set: queries under active cross-round drift scrutiny
    // get a median regardless of rank (round 8's q73/q63 apparent 3-4x
    // regressions were this host's noise band — a single sample cannot
    // distinguish that from a real regression, a median can).
    // q63/q73: round-8 drift suspects. q26/q29/q104: round-10 driver-host
    // outliers (20.4 s / 16.3 s / 43.4 s vs 1.8 / 2.0 / 7.6 s on the
    // builder box) — q26/q29 are the first heavy queries after warmup and
    // absorb residual cold-start; q104 sits in the host's noise band.
    // q03/q149/q159/q192/q193/q194: the round-12 loaded-host cluster
    // (BENCH_NOISE_r12.md) — confirmed noise, medianed at the source.
    val alwaysMedian = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_MEDIAN_ALWAYS",
        "q26,q29,q63,q73,q104,q03,q149,q159,q192,q193,q194")
      .split(",").filter(_.nonEmpty).toSet
    // EXACT short-name match, not startsWith: "q26" must watch q26 only
    // — as the suite grew, a prefix match silently swept q260-q269 and
    // q290-q294 into the watched set, spending the reserved re-measure
    // budget on ~16 queries nobody flagged.
    val watched = results.synchronized {
      results.filter(r => r._3.isEmpty &&
        alwaysMedian.contains(short(r._1)) &&
        !slowest.exists(_._1 == r._1)).toList
    }
    // Drift set: any query reading > 3x its previous-round time (and
    // > 1 s absolute — 0.2 s -> 0.7 s is pure scheduler noise) gets the
    // same median treatment, worst drift first so the deadline cuts the
    // mildest cases. Round 9 shipped a contiguous q77-q86 cluster
    // reading 4-8 s in-suite vs ~1.4 s soak medians; a 3x-vs-prior
    // trigger catches exactly that shape before it can mask a real
    // regression.
    val covered = (slowest ++ watched).map(_._1).toSet
    val drifted = results.synchronized {
      results.filter { r =>
        r._3.isEmpty && !covered(r._1) && r._2 > 1.0 &&
          priorTimes.get(r._1).exists(p => r._2 > 3 * p)
      }.sortBy(r => -(r._2 / priorTimes(r._1))).toList
    }
    if (drifted.nonEmpty) System.err.println("[bench] drift re-measure: " +
      drifted.map(r => f"${short(r._1)} ${priorTimes(r._1)}%.1f->${r._2}%.1f")
        .mkString(", "))
    (slowest ++ watched ++ drifted).foreach { case (name, first, _) =>
      val fn = SparkEntry.queries(name)
      val samples = scala.collection.mutable.ArrayBuffer(first)
      var tries = 0
      while (tries < 2 &&
             (System.nanoTime() - loopStart) / 1e9 < deadlineSec) {
        val t0 = System.nanoTime()
        if (run(name, fn).isEmpty)
          samples += (System.nanoTime() - t0) / 1e9
        tries += 1
      }
      if (samples.size == 3) {
        val med = samples.sorted.apply(1)
        results.synchronized {
          val i = results.indexWhere(_._1 == name)
          if (i >= 0) results(i) = ((name, med, None))
        }
        System.err.println(
          s"[bench] $name median of ${samples.map(s => f"$s%.2f").mkString("/")}")
        emit()
      }
    }
    emit()
    spark.stop()
    // worker is daemon; a still-wedged cancelled query must not block exit
    sys.exit(0)
  }
}
