package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Round-6 optimization harness — measurement ONLY, separate from the
  * frozen driver bench (`graft.Bench`), per the optimization-round rules
  * (guide §1: measure first; §1.4: isolate with the noop sink).
  *
  * Times each selected query with Bench's exact methodology (one untimed
  * warmup, then three timed `fn(spark, sfDir).count()` runs including plan
  * construction — iterative operators run jobs while BUILDING the frame,
  * so construction must sit inside the timed region exactly as in Bench),
  * and can additionally:
  *   - dump `.explain("formatted")` per query (GRAFT_PLANS_DIR=<dir>),
  *   - time a noop-sink run (GRAFT_NOOP=1) that computes every output
  *     column, isolating computation from the count-prune fast path.
  *
  * Usage: sbt "runMain graft.BenchExtra [substr ...]" — positional args
  * filter query names by substring; none selects all queries.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_REPS", "3").toInt
    val plansDir = sys.env.get("GRAFT_PLANS_DIR")
    val planSuffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "")
    val useNoop = sys.env.get("GRAFT_NOOP").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // GRAFT_JOBS=1: per-job wall times for the final rep of each query —
    // pinpoints which materialization/action a multi-job operator spends
    // its time in (measurement-only; the frozen bench has no such hook)
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]()
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    if (sys.env.get("GRAFT_JOBS").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStarts.put(j.jobId, System.nanoTime())
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobStarts.remove(j.jobId)
          if (t0 != 0L) jobLog.add((j.jobId, System.nanoTime() - t0, 0))
        }
      })

    // fixed-work pure-ALU sentinel: a noisy-host sample is self-identifying
    // (normalize query seconds by sentinel seconds across sessions)
    def sentinel(): Double = {
      import org.apache.spark.sql.functions.{bit_xor, xxhash64, col => fcol}
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, cpus)
        .select(bit_xor(xxhash64(fcol("id")))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    sentinel() // warm
    val sent = (1 to 3).map(_ => sentinel()).min
    println(f"[bench-extra] sentinel_sec=$sent%.3f")

    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      args.isEmpty || args.exists(name.contains)
    }
    val results = selected.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      plansDir.foreach { d =>
        val dir = java.nio.file.Paths.get(d)
        java.nio.file.Files.createDirectories(dir)
        // execute FIRST so the dump is the AQE-finalized plan
        // (isFinalPlan=true: runtime join strategies, AQEShuffleRead),
        // not the pre-runtime initial plan
        val df = fn(spark, sfDir)
        // run THIS QueryExecution (df.count() would plan a separate
        // aggregate query and leave this one un-finalized)
        df.queryExecution.toRdd.count()
        val plan = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(s"$name$planSuffix.txt"), plan)
      }
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (useNoop) df.write.format("noop").mode("overwrite").save() else df.count()
        (System.nanoTime() - t0) / 1e9
      }
      val raw =
        try { once(); (1 to reps).map { _ => System.gc(); once() } }
        catch { case e: Throwable =>
          System.err.println(s"[bench-extra] $name failed: ${e.getMessage}")
          Seq(-1.0)
        }
      println(s"[bench-extra-samples] $name " + raw.map(s => f"$s%.3f").mkString(" "))
      if (sys.env.get("GRAFT_JOBS").contains("1")) {
        jobLog.clear(); jobStarts.clear()
        once() // one extra profiled rep
        val jobs = jobLog.toArray(Array.empty[(Int, Long, Int)]).sortBy(_._1)
        println(s"[bench-extra-jobs] $name n=${jobs.length} " +
          jobs.map { case (id, ns, _) => f"j$id=${ns / 1e9}%.2f" }.mkString(" "))
      }
      val samples = raw.sorted
      spark.sparkContext.setJobDescription(null)
      val best = samples.head
      val med = samples(samples.length / 2)
      println(f"[bench-extra] $name best=$best%.3f median=$med%.3f")
      (name, best, med)
    }
    val sentEnd = (1 to 3).map(_ => sentinel()).min
    println(f"[bench-extra] sentinel_end_sec=$sentEnd%.3f")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val qs = results.map { case (k, b, m) =>
      "\"" + k + "\":{\"best\":" + f"$b%.3f" + ",\"median\":" + f"$m%.3f" + "}"
    }.mkString("{", ",", "}")
    println(s"""{"bench_extra":{"sf":"$sfDir","noop":$useNoop,"total_best_sec":${f"$total%.3f"},"queries":$qs}}""")
    spark.stop()
  }
}
