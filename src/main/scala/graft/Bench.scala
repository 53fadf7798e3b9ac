package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.ExtractPipeline
import graft.sources.CrawlCorpus

/** Round benchmark (driver contract): prints ONE JSON line.
  *
  * Scaling evidence for the north rule's N -> 4N criterion (no real cluster
  * in this sandbox): the same extraction job over the same pre-materialized
  * synthesized corpus at several parallelism levels, with the whole JVM
  * CPU-pinned to N cores for the local[N] run (otherwise GC/JIT/shuffle
  * threads of the "small" configuration silently use the idle cores and the
  * comparison stops modelling two cluster sizes).
  *
  * Reported per level: docs/sec and executor CPU-seconds per 1k docs. The
  * CPU-seconds figure is the work-conservation check: the extraction is a
  * shuffle-free map, so if CPU-per-doc is flat across parallelism there is
  * no serial bottleneck and a real N -> 4N multi-NODE cluster (independent
  * memory buses) scales linearly. On one socket the wall-clock ratio is
  * bounded by shared L3/memory bandwidth — the measured hardware envelope
  * (see BENCH.md: ~0.5 for pure memcopy, ~0.9 for pure ALU at 8->32) — so
  * both the raw 8->32 ratio and the bandwidth-headroom 2->8 ratio are
  * reported.
  */
object Bench {

  /** Host CPU count captured BEFORE any pinning — availableProcessors()
    * reflects the current affinity mask once taskset has run. */
  private val HostCpus: Int = Runtime.getRuntime.availableProcessors()

  /** Realistic page weight: ~30 KB HTML bodies (htmlScale 20) so per-doc
    * kernel work dominates per-row framework overhead, as it does on a real
    * crawl (CommonCrawl pages average ~100 KB). */
  private val HtmlScale = sys.env.getOrElse("SPARK_GRAFT_HTML_SCALE", "20").toInt

  private val cpuNs = new AtomicLong(0L)

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
    })
    s
  }

  /** Pin the whole JVM (all threads) to the first nCpus CPUs (Linux;
    * silently skipped if taskset is unavailable).
    *
    * `taskset -a` exits non-zero when ANY thread of the process vanishes
    * while it iterates — a torn-down SparkSession from the previous
    * measurement round leaves exactly such dying threads, so the exit code
    * alone flags spurious failures (observed: pinned=false on an otherwise
    * clean run). Success is therefore judged by QUERYING the resulting
    * main-process mask, with a couple of retries for the racy case. */
  private def setAffinity(nCpus: Int): Boolean = {
    val expected = nCpus match {
      case 1 => "0"
      case 2 => "0,1"
      case n => s"0-${n - 1}"
    }
    def currentMask(pid: Long): String =
      try {
        val q = new ProcessBuilder("taskset", "-p", "-c", pid.toString)
          .redirectErrorStream(true).start()
        val out = new String(q.getInputStream.readAllBytes(), "UTF-8")
        q.waitFor()
        out.trim.split(": ").last
      } catch { case _: Throwable => "" }
    try {
      val pid = ProcessHandle.current().pid()
      var attempt = 0
      var ok = false
      while (!ok && attempt < 3) {
        val p = new ProcessBuilder("taskset", "-a", "-p", "-c", s"0-${nCpus - 1}", pid.toString)
          .redirectErrorStream(true).start()
        p.getInputStream.readAllBytes()
        val rc = p.waitFor()
        // the queried mask is authoritative WHEN READABLE: it must equal
        // the requested cpulist exactly (a cgroup cpuset that clips the
        // request must NOT count as pinned — the scaling ratios would be
        // computed from configs that never ran on the stated core counts).
        // Only when the query itself yields nothing (non-util-linux
        // taskset output) does the exit code decide.
        val mask = currentMask(pid)
        ok = if (mask.nonEmpty) mask == expected else rc == 0
        attempt += 1
      }
      ok
    } catch { case _: Throwable => false }
  }

  /** Force the full extraction over a pre-materialized corpus; returns
    * (wall seconds, executor cpu seconds). Corpus synthesis is excluded —
    * a real deployment reads the crawl table, it does not generate it. */
  private def timeExtraction(corpus: org.apache.spark.sql.Dataset[graft.sources.CrawlRow]): (Double, Double) = {
    val docs = ExtractPipeline.extractDocs(corpus).toDF()
    val c0 = cpuNs.get()
    val t0 = System.nanoTime()
    docs.agg(sum(length(col("contents"))), sum(col("n_errors")), count(lit(1))).collect()
    ((System.nanoTime() - t0) / 1e9, (cpuNs.get() - c0) / 1e9)
  }

  final case class Meas(dps: Double, cpuSecPer1k: Double, pinned: Boolean)

  /** Best-of-N wall time after warmup, JVM pinned to `cores` CPUs. */
  private def measure(cores: Int, nDocs: Long, reps: Int = 3): Meas = {
    val pinned = setAffinity(cores)
    val spark = session(cores)
    try {
      val corpus = CrawlCorpus.crawl(spark, nDocs, seed = 42L,
        numPartitions = cores * 2, htmlScale = HtmlScale).persist()
      corpus.count() // materialize the input before any timing
      timeExtraction(corpus) // warmup (JIT, codegen)
      val runs = (1 to reps).map { _ =>
        System.gc() // drain prior garbage so full GCs don't land mid-measurement
        timeExtraction(corpus)
      }
      corpus.unpersist()
      val best = runs.minBy(_._1)
      Meas(nDocs / best._1, best._2 * 1000.0 / nDocs, pinned)
    } finally {
      spark.stop()
      setAffinity(HostCpus)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "24000").toLong

    // three INTERLEAVED rounds, best per config: interleaving prevents a
    // fixed small-to-large order handing later configs a deeper JIT warmup;
    // three samples mean one noisy-neighbor episode (documented host
    // behavior) contaminates at most one of them
    val configs = Seq(2, 8, 32)
    val rounds = (1 to 3).flatMap(_ => configs.map(c => c -> measure(c, if (c == 2) benchDocs / 4 else benchDocs)))
    def best(c: Int): Meas = rounds.filter(_._1 == c).map(_._2).maxBy(_.dps)
    val m2 = best(2)
    val m8 = best(8)
    val m32 = best(32)

    // sustained leg: the same extraction at a 4x corpus, where per-session
    // fixed overhead (JIT, scheduler spin-up, stage launch) amortizes — the
    // machine-checkable round-over-round scale-trend point (BENCH.md's 96k
    // prose figure, now in the JSON). SPARK_GRAFT_SUSTAINED_DOCS=0 skips.
    val sustainedDocs =
      sys.env.getOrElse("SPARK_GRAFT_SUSTAINED_DOCS", (benchDocs * 4).toString).toLong
    val mSus: Option[Meas] =
      if (sustainedDocs > 0) Some(measure(cpus, sustainedDocs, reps = 2)) else None
    val eff8to32 = (m32.dps / m8.dps) / 4.0
    val eff2to8 = (m8.dps / m2.dps) / 4.0
    // work conservation: cpu-per-doc at 4N vs N (1.0 = perfectly parallel job)
    val workRatio8to32 = m32.cpuSecPer1k / m8.cpuSecPer1k

    // Part 2: headline queries at the driver-chosen scale factor.
    // One untimed warmup execution per query, then THREE timed runs
    // reported as {best, median}: the bench measures the query plan, not
    // HotSpot compilation (a cold first run of an interpreted-HOF query is
    // ~40x its warm cost), and the band keeps a single noisy-neighbor
    // sample (documented host behavior) from masquerading as a per-query
    // regression in round-over-round comparisons.
    val spark = session(cpus)
    val queryTimes: Seq[(String, Double, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val samples =
          try { once(); Seq(once(), once(), once()).sorted }
          catch { case _: Throwable => Seq(-1.0) }
        (name, samples.head, samples(samples.length / 2))
      }
    spark.stop()

    // The driver tail-captures only the LAST ~2,000 bytes of stdout and
    // parses the final JSON line, so that line must stay compact FOREVER as
    // the query count grows (the round-4 query_bands addition pushed it to
    // 4.7 KB and the driver recorded parsed:null — no machine-readable
    // bench for the round). Contract: stdout line keys queries by their
    // short qNN prefix and carries no bands; BENCH_OUT.json carries the
    // full names and {best,median} bands for round-over-round comparison.
    // stdout gets 2-decimal seconds (a 76-query map must stay well under
    // the tail capture as the surface keeps growing); BENCH_OUT.json keeps
    // the full 3-decimal resolution for round-over-round comparison
    def qJson(key: String => String, dp: Int): String = queryTimes.map { case (k, best, _) =>
      "\"" + key(k) + "\":" + s"%.${dp}f".format(best)
    }.mkString("{", ",", "}")
    val qs = qJson(_.takeWhile(_ != '_'), 2)
    val qBands = queryTimes
      .map { case (k, best, med) => "\"" + k + "\":{\"best\":" + f"$best%.3f" + ",\"median\":" + f"$med%.3f" + "}" }
      .mkString("{", ",", "}")
    val total = queryTimes.filter(_._2 >= 0).map(_._2).sum
    // the sustained leg's pinning counts too: an unpinned 4x-corpus run
    // must not hide under cpu_pinned=true
    val pinned = m2.pinned && m8.pinned && m32.pinned && mSus.forall(_.pinned)
    if (!pinned)
      System.err.println("[bench] WARNING: cpu_pinned=false — taskset unavailable, " +
        "the small-parallelism configs used idle cores; the N->4N wall-clock " +
        "ratios below do NOT model two cluster sizes (see BENCH.md protocol)")
    val sustained = mSus.map { m =>
      s""""sustained":{"docs":$sustainedDocs,"docs_per_sec":${f"${m.dps}%.1f"},"cpu_sec_per_1k_docs":${f"${m.cpuSecPer1k}%.3f"}},"""
    }.getOrElse("")
    val scaling =
      s""""scaling":{"bench_docs":$benchDocs,"html_scale":$HtmlScale,"cpu_pinned":$pinned,""" +
      s""""docs_per_sec_2":${f"${m2.dps}%.1f"},"docs_per_sec_8":${f"${m8.dps}%.1f"},"docs_per_sec_32":${f"${m32.dps}%.1f"},""" +
      s""""cpu_sec_per_1k_docs_8":${f"${m8.cpuSecPer1k}%.3f"},"cpu_sec_per_1k_docs_32":${f"${m32.cpuSecPer1k}%.3f"},""" +
      s""""work_conservation_8_to_32":${f"$workRatio8to32%.3f"},""" +
      s""""efficiency_2_to_8":${f"$eff2to8%.3f"},"efficiency":${f"$eff8to32%.3f"}}"""
    def assemble(queries: String, bands: String): String =
      s"""{"metric":"extraction docs/sec at local[32] (4N); warm query sec (detail: BENCH_OUT.json)","value":${f"${m32.dps}%.1f"},"unit":"docs/sec","queries":$queries,$bands"sf":"$sfDir","queries_total_sec":${f"$total%.3f"},$sustained$scaling}"""
    // the stdout line must stay comfortably inside the driver's 2,000-byte
    // tail capture FOREVER as the query count grows: degrade per-query
    // resolution (2dp -> 1dp) before ever risking the budget — the full
    // 3dp detail always lives in BENCH_OUT.json
    val stdoutLine = {
      val at2dp = assemble(qs, "")
      lazy val at1dp = assemble(qJson(_.takeWhile(_ != '_'), 1), "")
      if (at2dp.length <= 1500) at2dp
      else if (at1dp.length <= 1500) at1dp
      // last resort: drop the per-query map from stdout entirely rather
      // than ever risk the tail capture — the driver still gets the
      // headline metrics, and BENCH_OUT.json always has the full map
      else assemble("""{"see":"BENCH_OUT.json"}""", "")
    }
    val fileJson = assemble(qJson(identity, 3), s""""query_bands":$qBands,""")
    if (stdoutLine.length > 1500)
      System.err.println(s"[bench] WARNING: stdout JSON line is ${stdoutLine.length} bytes — " +
        "approaching the driver's 2,000-byte tail capture; trim it")
    // the full document lands in a bare file: the driver's stdout parse has
    // to fish the line out of sbt's [info]-prefixed tail and has failed on
    // both prefix noise (r3) and line length (r4)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_OUT.json"), fileJson + "\n")
    println(stdoutLine)
  }
}
