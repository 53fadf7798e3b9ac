package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import graft.operators.WebCuration

/** Streaming latest-capture == batch `WebCuration.latestCapture`: the
  * append-only re-versioned winner log's latest-version view per url must
  * converge to the batch operator over the same capture rows, with winners
  * that FLIP across micro-batch boundaries (the state merge). */
class StreamingRecrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("latest-version view over two deliveries == batch latestCapture; winners flip across batches") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_rc_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_rc_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_rc_ck").toString

    // synthesized capture history off the documents table: ~50 urls,
    // several captures each, ts scrambled so delivery order != ts order,
    // every 13th ts NULL (the null-loses rule crosses batches too)
    val caps = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"),
        concat(lit("u"), (col("doc_id") % 50).cast("string")).as("url"),
        when(col("doc_id") % 13 === 9, lit(null).cast("long"))
          .otherwise((col("doc_id") * 2654435761L) % 100000L).as("ts"))
    val batch = WebCuration.latestCapture(caps, "url", "ts", "id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      .toSet
    assert(batch.size == 50)

    // delivery 1: low ids; delivery 2: high ids — both deliveries touch
    // every url (id RANGES are url-parity-neutral; an even/odd id split
    // would partition the url space too, since url = id % 50 with an even
    // modulus), so the second batch must dethrone first-batch winners
    // through the keyed state. One file per delivery (coalesce): with
    // maxFilesPerTrigger=1 each delivery is exactly one micro-batch
    val cut = 250L
    caps.where(col("id") < cut).select("url", "ts", "id")
      .coalesce(1).write.mode("append").parquet(inDir)
    caps.where(col("id") >= cut).select("url", "ts", "id")
      .coalesce(1).write.mode("append").parquet(inDir)

    // urls touched per delivery = appended winner rows per delivery
    val expectRows =
      caps.where(col("id") < cut).select("url").distinct().count() +
      caps.where(col("id") >= cut).select("url").distinct().count()

    val stream = spark.readStream
      .schema("url string, ts bigint, id bigint")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .as[StreamingRecrawl.Capture]
    val q = StreamingRecrawl.latestCaptureVersions(stream)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .start()
    // a stateful query with processing-time timeouts never goes idle
    // (timeout batches keep scheduling), so poll the committed sink count
    // instead of awaiting self-termination (the StatefulDedupSpec rule)
    def sinkCount(): Long =
      try spark.read.parquet(outDir).count() catch { case _: Throwable => -1L }
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (System.nanoTime() < deadline && sinkCount() < expectRows)
      Thread.sleep(500)
    q.stop(); q.awaitTermination(30000)

    val log = spark.read.parquet(outDir)
    // per-url versions are contiguous from 0: every touched batch appended
    val perUrl = log.groupBy("url")
      .agg(count(lit(1)).as("n"), max(col("version")).as("maxv"))
      .collect()
    perUrl.foreach(r => assert(r.getLong(1) == r.getLong(2) + 1,
      s"versions not contiguous for ${r.getString(0)}"))
    // at least one url was re-versioned (its winner/count changed in batch 2)
    assert(perUrl.exists(_.getLong(1) == 2L),
      s"row-count distribution: ${perUrl.map(_.getLong(1)).groupBy(identity).view.mapValues(_.length).toMap}; total=${log.count()}")

    val latest = log.groupBy("url").agg(max(struct(col("version"),
        col("n_captures"), col("ts"), col("id"))).as("w"))
      .select(col("url"), col("w.n_captures"), col("w.ts"), col("w.id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      .toSet
    assert(latest == batch,
      s"latest-version view must equal batch: missing=${(batch -- latest).take(3)} extra=${(latest -- batch).take(3)}")
  }

  test("incrementalDelta is stream-ready: stream-static classification == batch over two deliveries") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_id_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_id_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_id_ck").toString

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val u = concat(lit("u"), col("doc_id").cast("string"))
    val base = docs.where(col("doc_id") % 3 =!= 0).select(u.as("url"), col("text"))
    val batchIn = docs.select(col("doc_id"), u.as("url"),
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
        .otherwise(col("text")).as("text"))
    val expected = WebCuration.incrementalDelta(batchIn, base, "url", "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet

    batchIn.where(col("doc_id") < 250).coalesce(1).write.mode("append").parquet(inDir)
    batchIn.where(col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(inDir)
    // the SAME batch operator over a streaming frame: the base side is
    // static (reduced to (url, md5) once), the classification is a
    // stateless stream-static left join — no state store, no watermark
    val stream = spark.readStream
      .schema("doc_id bigint, url string, text string")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val q = WebCuration.incrementalDelta(stream, base, "url", "doc_id", "text")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000)) // stateless: AvailableNow self-terminates
    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(streamed == expected,
      s"missing=${(expected -- streamed).take(3)} extra=${(streamed -- expected).take(3)}")
  }
}
