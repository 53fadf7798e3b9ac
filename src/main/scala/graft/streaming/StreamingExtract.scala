package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{ExtractPipeline, ExtractedDoc}
import graft.sources.{CrawlRow, ParquetManifestTable}

/** Structured Streaming facade over the extraction pipeline: the reference
  * is strictly batch (one file per run), but a crawl at 10^12 documents
  * arrives continuously, so the same map-local transform is exposed as
  * readStream -> extractDocs -> foreachBatch commit. Each micro-batch is
  * committed atomically through the snapshot table (TableIO), which is what
  * makes restart exactly-once per url even if the stream checkpoint and the
  * sink disagree (idempotent batch ids).
  */
object StreamingExtract {

  val CrawlSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[CrawlRow].schema

  /** File-source stream of crawl pages (parquet drops into `inputDir`). */
  def readCrawlStream(spark: SparkSession, inputDir: String): Dataset[CrawlRow] = {
    import spark.implicits._
    spark.readStream
      .schema(CrawlSchema)
      .option("maxFilesPerTrigger", "16")
      .parquet(inputDir)
      .as[CrawlRow]
  }

  /** Start the extraction stream: every micro-batch runs the shuffle-free
    * extraction and commits one table snapshot batch. */
  def start(spark: SparkSession, inputDir: String, tableRoot: String,
            checkpointDir: String, password: String = "",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val table = new ParquetManifestTable(tableRoot)
    readCrawlStream(spark, inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[CrawlRow], batchId: Long) =>
        val docs = ExtractPipeline.extractDocs(batch, password)
        table.commit(docs.toDF(), f"stream-$batchId%08d")
        ()
      }
      .start()
  }

  /** Watermarked per-hour extraction-lag metrics over the extracted stream
    * (windowed aggregation demo on the same source). */
  def hourlyMetrics(stream: Dataset[CrawlRow]): DataFrame =
    stream
      .withWatermark("warc_ts", "1 hour")
      .groupBy(window(col("warc_ts"), "1 hour"), col("lang"))
      .agg(count(lit(1)).as("n_pages"), sum(length(col("html"))).as("n_bytes"))
}
