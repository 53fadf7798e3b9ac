package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase

/** Streaming windowed score-distribution monitoring == the same sketch
  * aggregation in batch mode. Parity can be EXACT here by construction:
  * each window holds fewer values than the sketch's level-0 capacity, so
  * no compaction ever fires and the summary is the values themselves —
  * merge order (micro-batch vs executor) cannot matter. The bound-only
  * behavior at scale is QuantileSketchSpec's job. */
class StreamingStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("streaming windowed quantiles + CDF points across two deliveries == batch") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_stat_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_stat_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_stat_ck").toString

    // 3-day tumbling windows hold ~100 scores each — under the sketch's
    // level-0 capacity (K=256), the exactness regime; score = a
    // deterministic integral of the row
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("ts"), (pmod(col("event_id") * 31 + col("user_id"), lit(10000))).as("score"))
    val probes = Seq(2000L, 8000L)
    def distribution(df: org.apache.spark.sql.DataFrame) =
      StreamingStats.windowedScoreDistribution(df, "ts", "score",
        windowSeconds = 259200L, ps = Seq(0.5, 0.9), probes = probes)
    val batch = distribution(events)
      .collect().map(r => (String.valueOf(r.get(0)), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(batch.size >= 5, s"need several multi-value windows, got ${batch.size}")
    assert(batch.forall(_._2 > 10), "windows must hold real populations")
    val cut = events.agg(expr("percentile_approx(unix_timestamp(ts), 0.5)")).head().getLong(0)
    val maxTs = events.agg(max(unix_timestamp(col("ts")))).head().getLong(0)

    // two deliveries split mid-timeline: windows straddling the cut must
    // merge their partial sketches through the state store
    events.where(unix_timestamp(col("ts")) <= cut).write.mode("append").parquet(inDir)
    events.where(unix_timestamp(col("ts")) > cut).write.mode("append").parquet(inDir)
    // sentinel rows push the global watermark past every real window's end
    // (their own window stays unemitted behind the final watermark; its
    // score of -1 marks it for exclusion if it ever emitted)
    def sentinel(offsetSec: Long) =
      Seq((new java.sql.Timestamp((maxTs + offsetSec) * 1000L), -1L)).toDF("ts", "score")

    def run(expectRows: Int): Unit = {
      val stream = spark.readStream
        .schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
      val q = distribution(stream)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def count(): Long =
        try spark.read.parquet(outDir).count()
        catch { case _: org.apache.spark.sql.AnalysisException => -1L }
      while (System.nanoTime() < deadline && count() < expectRows) Thread.sleep(500)
      q.stop(); q.awaitTermination(30000)
    }

    // offsets comfortably beyond the 3-day window span so a sentinel can
    // never land inside (and contaminate) the last real window
    sentinel(864000L).write.mode("append").parquet(inDir)
    run(expectRows = 0)
    sentinel(10 * 864000L).write.mode("append").parquet(inDir)
    run(expectRows = batch.size)

    // sentinel windows (single score of -1) are recognizable by their
    // negative p50; real scores live in [0, 10000)
    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (String.valueOf(r.get(0)), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .filter(_._3 >= 0)
      .toSet
    assert(streamed == batch,
      s"streaming distribution must equal batch: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }
}
