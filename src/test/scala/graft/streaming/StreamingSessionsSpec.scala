package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase

/** Streaming sessionization == the same session_window aggregation in
  * batch mode, with sessions that SPAN micro-batch boundaries (the state
  * merge) and append-mode emission driven by sentinel watermark pushes. */
class StreamingSessionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("streaming sessions across two time-split deliveries == batch session_window") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_sess_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_sess_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_sess_ck").toString

    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("ts"))
    val batch = StreamingSessions.sessionize(events)
      .collect().map(r => (r.getLong(0), String.valueOf(r.get(1)), String.valueOf(r.get(2)), r.getLong(3)))
      .toSet
    assert(batch.nonEmpty)
    val cut = events.agg(expr("percentile_approx(unix_timestamp(ts), 0.5)")).head().getLong(0)
    val maxTs = events.agg(max(unix_timestamp(col("ts")))).head().getLong(0)

    // delivery 1: first half of the timeline; delivery 2: the rest —
    // sessions crossing the cut must merge through the keyed state
    events.where(unix_timestamp(col("ts")) <= cut).write.mode("append").parquet(inDir)
    events.where(unix_timestamp(col("ts")) > cut).write.mode("append").parquet(inDir)
    // sentinel users push the GLOBAL watermark past every real session's
    // end so append mode actually emits them (their own sessions stay
    // unemitted behind the final watermark and are filtered out below)
    def sentinel(offsetSec: Long) =
      Seq((-1L, new java.sql.Timestamp((maxTs + offsetSec) * 1000L))).toDF("user_id", "ts")

    def run(expectRows: Int): Unit = {
      val stream = spark.readStream
        .schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
      val q = StreamingSessions.sessionize(stream)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def count(): Long =
        try spark.read.parquet(outDir).where(col("user_id") >= 0).count()
        // only the expected "no files committed yet" case reads as no
        // data; a genuinely broken sink must surface, not spin the poll
        catch { case _: org.apache.spark.sql.AnalysisException => -1L }
      while (System.nanoTime() < deadline && count() < expectRows) Thread.sleep(500)
      q.stop(); q.awaitTermination(30000)
    }

    sentinel(100000L).write.mode("append").parquet(inDir)
    run(expectRows = 0) // processes deliveries; emission lags the watermark
    // a second sentinel delivers the batch that EMITS everything the first
    // sentinel's watermark unlocked
    sentinel(10000000L).write.mode("append").parquet(inDir)
    run(expectRows = batch.size)

    val streamed = spark.read.parquet(outDir).where(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), String.valueOf(r.get(1)), String.valueOf(r.get(2)), r.getLong(3)))
      .toSet
    assert(streamed == batch,
      s"streaming sessions must equal batch: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }
}
