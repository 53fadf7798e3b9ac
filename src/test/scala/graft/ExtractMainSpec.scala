package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.CrawlCorpus

/** Drives the production `graft.Extract` main end-to-end: fresh run commits
  * one batch + metrics + sinks, a re-run over the same input is a no-op
  * (exact resume), and a grown input commits only the delta. */
class ExtractMainSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("extract job: commit, exact resume no-op, incremental delta, sinks") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft_job_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_job_out").toString

    // delivery 1: 40 urls
    CrawlCorpus.crawl(spark, 40, 42L).toDF().write.mode("overwrite").parquet(inDir)
    Extract.main(Array(inDir, outDir, "--sinks", "--partitions", "4"))

    assert(new graft.sources.ParquetManifestTable(s"$outDir/documents").committedBatches.size == 1)
    val committed1 = new graft.sources.ParquetManifestTable(s"$outDir/documents").read(spark)
    assert(committed1.count() == 40)
    assert(committed1.select("url").distinct().count() == 40)
    // metrics carry the batch id + lineage rows
    val metrics = new graft.sources.ParquetManifestTable(s"$outDir/metrics").read(spark)
    assert(metrics.count() > 0)
    assert(metrics.columns.contains("batch_id") && metrics.columns.contains("url_min"))
    // sink tables committed
    val errors = new graft.sources.ParquetManifestTable(s"$outDir/sink_errors").read(spark)
    assert(errors.count() > 0) // the malformed fixtures produce error lines

    // re-run over the SAME input: exact resume -> no new batch
    Extract.main(Array(inDir, outDir, "--sinks", "--partitions", "4"))
    assert(new graft.sources.ParquetManifestTable(s"$outDir/documents").committedBatches.size == 1)

    // delivery 2: input grows to 60 urls -> exactly the 20-url delta commits
    CrawlCorpus.crawl(spark, 60, 42L).toDF().write.mode("overwrite").parquet(inDir)
    Extract.main(Array(inDir, outDir, "--partitions", "4"))
    val table = new graft.sources.ParquetManifestTable(s"$outDir/documents")
    assert(table.committedBatches.size == 2)
    val all = table.read(spark)
    assert(all.count() == 60, "each url exactly once across batches")
    assert(all.select("url").distinct().count() == 60)
  }
}
