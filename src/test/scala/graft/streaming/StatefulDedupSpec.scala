package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import graft.sources.{CrawlCorpus, CrawlRow}

/** Drives the stateful dedup through a real file-source stream across two
  * deliveries (second is a full re-fetch of the same urls + some new ones):
  * exactly one output row per url, state survives across micro-batches via
  * the checkpoint. */
class StatefulDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("flatMapGroupsWithState dedup: first seen wins across micro-batches") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft_sd_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_sd_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_sd_ck").toString

    def sinkCount(): Long =
      try spark.read.parquet(outDir).count() catch { case _: Throwable => -1L }

    def run(expectRows: Long): Unit = {
      val stream = StreamingExtract.readCrawlStream(spark, inDir)
      val deduped = StatefulDedup.firstSeenOnly(stream)
      val q = deduped.toDF()
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
      // a stateful query with processing-time timeouts never goes idle
      // (timeout batches keep scheduling), so poll the committed sink
      // count instead of processAllAvailable/self-termination
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline && sinkCount() < expectRows)
        Thread.sleep(500)
      q.stop()
      q.awaitTermination(30000)
    }

    // delivery 1: urls 0..19
    CrawlCorpus.crawl(spark, 20, 42L).toDF().write.mode("append").parquet(inDir)
    run(expectRows = 20)
    val after1 = spark.read.parquet(outDir)
    assert(after1.select("url").distinct().count() == 20)

    // delivery 2: re-fetch of urls 0..19 plus new urls 20..29
    CrawlCorpus.crawl(spark, 30, 42L).toDF().write.mode("append").parquet(inDir)
    run(expectRows = 30)
    val after2 = spark.read.parquet(outDir)
    assert(after2.count() == 30, "each url exactly once despite the re-fetch")
    assert(after2.select("url").distinct().count() == 30)
  }
}
