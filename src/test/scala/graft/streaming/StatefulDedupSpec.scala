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

  test("streaming near-dup: chunk-blocked simhash matches across micro-batches, bounded state") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val inDir = java.nio.file.Files.createTempDirectory("graft_nd_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_nd_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_nd_ck").toString

    def sinkCount(): Long =
      try spark.read.parquet(outDir).count() catch { case _: Throwable => -1L }

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("sh", LongType)))

    def run(expectRows: Long): Unit = {
      val stream = spark.readStream.schema(schema).parquet(inDir)
        .as[(Long, Long)]
      val matches = StatefulDedup.nearDupMatches(stream, maxHamming = 3, maxBlock = 8)
      val q = matches.toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline && sinkCount() < expectRows)
        Thread.sleep(500)
      q.stop()
      q.awaitTermination(30000)
    }

    // delivery 1: two far-apart documents (hamming 64) -> no matches
    Seq((1L, 0L), (2L, -1L)).toDF("id", "sh").write.mode("append").parquet(inDir)
    run(expectRows = 0)
    assert(sinkCount() <= 0)

    // delivery 2: doc 3 at hamming 1 from doc 1 (state crossed the batch
    // boundary via the checkpoint); doc 4 far from everything.
    // sh=1 vs sh=0 share chunks 1..3 (chunk 0 differs: 1 vs 0) -> one
    // match event per shared block = 3 rows, one distinct pair
    Seq((3L, 1L), (4L, 0x00ff00ff00ff00ffL)).toDF("id", "sh")
      .write.mode("append").parquet(inDir)
    run(expectRows = 3)
    val out = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.length == 3, out.mkString(","))
    assert(out.toSet == Set((3L, 1L, 1)), out.mkString(","))
  }

  test("streaming near-dup == batch simhashPairs on the same corpus (ring never evicts)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val inDir = java.nio.file.Files.createTempDirectory("graft_par_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_par_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_par_ck").toString

    // real corpus + injected duplicates (the q13/q17/q18 pattern)
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val docs = base.unionByName(
      base.where(col("doc_id") < 20).withColumn("doc_id", col("doc_id") + 100000L))

    // the batch miner's answer: canonical (min, max, hamming) pair set
    val batch = graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "injected duplicates must produce hamming-0 pairs")

    // the same (id, simhash) rows through the stream in TWO deliveries
    // (evens, then odds) so cross-delivery pairs must travel through the
    // checkpointed keyed state
    val hashed = docs.select(col("doc_id").as("id"),
      graft.functions.SketchFunctions.simhash64(col("text")).as("sh"))
    hashed.where(col("id") % 2 === 0).write.mode("append").parquet(inDir)

    def distinctPairs(): Set[(Long, Long, Long)] =
      try spark.read.parquet(outDir)
        .select(least(col("id"), col("matched_id")).as("a"),
          greatest(col("id"), col("matched_id")).as("b"),
          col("hamming").cast("long").as("h"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      catch { case _: Throwable => Set.empty }

    def run(expectPairs: Int): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sh", org.apache.spark.sql.types.LongType))))
        .parquet(inDir).as[(Long, Long)]
      // maxBlock larger than the corpus: the FIFO ring never evicts, so the
      // stream must find EXACTLY the batch pair set
      val q = StatefulDedup.nearDupMatches(stream, maxHamming = 3, maxBlock = 1024).toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline && distinctPairs().size < expectPairs)
        Thread.sleep(500)
      q.stop()
      q.awaitTermination(30000)
    }

    val evenBatch = batch.filter(p => p._1 % 2 == 0 && p._2 % 2 == 0)
    run(expectPairs = evenBatch.size)
    assert(distinctPairs() == evenBatch,
      "after delivery 1 the stream must know exactly the even-id pairs")

    hashed.where(col("id") % 2 =!= 0).write.mode("append").parquet(inDir)
    run(expectPairs = batch.size)
    assert(distinctPairs() == batch,
      "the streaming state path must equal the batch chunk-blocked miner")
  }
}
