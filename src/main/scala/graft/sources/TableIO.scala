package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import scala.jdk.CollectionConverters._

/** Snapshot-committed table storage with exact resume.
  *
  * The production design is an Iceberg table (atomic snapshot commits); this
  * sandbox has no Iceberg runtime jar, so the same contract is provided by a
  * Parquet+manifest backend: a batch is written to a staging directory, then
  * atomically renamed into the data area, then recorded by an atomic
  * manifest-entry file. Readers only see manifest-listed batches, so a
  * killed writer leaves no partial state — `read` + `left_anti` resume is
  * exactly-once per url. This is the transaction-log-as-source-of-truth
  * scheme of Delta Lake (Armbrust et al., "Delta Lake: High-Performance
  * ACID Table Storage over Cloud Object Stores", VLDB 2020) reduced to the
  * append-only case. An Iceberg-backed implementation slots behind the same
  * trait unchanged.
  */
trait TableIO {
  def commit(df: DataFrame, batchId: String): Unit
  def read(spark: SparkSession): DataFrame
  def committedBatches: Seq[String]
  def exists: Boolean
}

/** Manifest-committed table over a columnar file format. `format` picks the
  * batch file layout: `parquet` (default) or `orc` — the two binary-safe,
  * self-describing, splittable formats a 100 TB table can actually use
  * (CSV/JSON are rejected: they cannot round-trip the binary payload
  * columns or split compressed files, so they'd silently corrupt the
  * extracted tables). The commit protocol is format-agnostic. */
final class ParquetManifestTable(rootDir: String, format: String = "parquet") extends TableIO {
  require(ParquetManifestTable.Formats.contains(format),
    s"unsupported table format '$format' (supported: ${ParquetManifestTable.Formats.mkString(", ")})")
  private def root: Path = Paths.get(rootDir)
  private def stagingDir: Path = root.resolve("_staging")
  private def dataDir: Path = root.resolve("data")
  private def manifestDir: Path = root.resolve("_manifest")

  def exists: Boolean = Files.isDirectory(manifestDir)

  def committedBatches: Seq[String] =
    if (!exists) Seq.empty
    else {
      val listing = Files.list(manifestDir)
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".committed"))
        .map(_.stripSuffix(".committed"))
        .toSeq.sorted
      finally listing.close()
    }

  /** Write staging parquet, atomic-rename into data/, then atomic-create the
    * manifest entry. The manifest entry is the commit point. */
  def commit(df: DataFrame, batchId: String): Unit = {
    require(!batchId.contains('/') && batchId.nonEmpty, s"bad batchId: $batchId")
    Files.createDirectories(stagingDir)
    Files.createDirectories(dataDir)
    Files.createDirectories(manifestDir)
    val staged = stagingDir.resolve(batchId)
    val committed = dataDir.resolve(batchId)
    if (committedBatches.contains(batchId)) return // idempotent re-commit
    df.write.mode(SaveMode.Overwrite).format(format).save(staged.toString)
    // a writer that died between the data-dir move and the manifest move
    // leaves an orphaned (uncommitted, invisible to readers) data dir; a
    // retried commit must be able to replace it, not fail forever
    if (Files.exists(committed)) deleteRecursively(committed)
    Files.move(staged, committed, StandardCopyOption.ATOMIC_MOVE)
    val tmp = manifestDir.resolve(batchId + ".tmp")
    Files.writeString(tmp, batchId)
    Files.move(tmp, manifestDir.resolve(batchId + ".committed"), StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRecursively(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.delete)
    finally walk.close()
  }

  def read(spark: SparkSession): DataFrame = {
    val batches = committedBatches.map(b => dataDir.resolve(b).toString)
    require(batches.nonEmpty, s"no committed batches under $rootDir")
    spark.read.format(format).load(batches: _*)
  }

  /** The newest committed batch only — the read shape for REPLACE-style
    * tables (e.g. a curated snapshot recomputed per run), where `read`'s
    * union-of-batches semantics would duplicate rows. "Newest" is by
    * manifest-entry commit TIME at the filesystem's full resolution
    * (nanoseconds where supported — millisecond truncation made two
    * commits in the same tick resolve by NAME, which sorts arbitrarily
    * for content-hash batch ids), ties by name. */
  def readLatest(spark: SparkSession): DataFrame = {
    val batches = committedBatches
    require(batches.nonEmpty, s"no committed batches under $rootDir")
    val latest = batches.maxBy { b =>
      (Files.getLastModifiedTime(manifestDir.resolve(b + ".committed"))
        .to(java.util.concurrent.TimeUnit.NANOSECONDS), b)
    }
    spark.read.format(format).load(dataDir.resolve(latest).toString)
  }

  /** One specific committed batch. */
  def readBatch(spark: SparkSession, batchId: String): DataFrame = {
    require(committedBatches.contains(batchId), s"batch $batchId not committed under $rootDir")
    spark.read.format(format).load(dataDir.resolve(batchId).toString)
  }
}

object ParquetManifestTable {
  /** Binary-safe splittable columnar formats this sandbox's Spark build
    * carries natively. Iceberg remains the production target behind the
    * same trait (no runtime jar here). */
  val Formats: Set[String] = Set("parquet", "orc")
}

object Resume {
  /** Exact resume: input rows whose url has not been committed yet. A plain
    * left_anti join — Catalyst broadcasts the committed-url side when small,
    * shuffles both sides on url otherwise. */
  def pending(input: Dataset[CrawlRow], table: TableIO): Dataset[CrawlRow] = {
    val spark = input.sparkSession
    import spark.implicits._
    if (!table.exists || table.committedBatches.isEmpty) input
    else {
      val committedUrls = table.read(spark).select("url")
      input.join(committedUrls, Seq("url"), "left_anti").as[CrawlRow]
    }
  }

  /** The CURRENT row per url over an extracted-documents frame whose
    * append batches may hold several versions of a url (recrawl mode,
    * `Extract --recrawl`): newest `warc_ts` wins, `raw_md5` +
    * `md5(contents)` tiebreak — the same lexicographic winner rule as the
    * extract job's input dedup, and the same `max_by` AGGREGATE shape
    * (one winner payload per url per partition map-side; never a
    * row_number window sorting a hot url's full version history in one
    * task). Identity on a table that is already one-row-per-url. */
  def currentPerUrl(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val cols = docs.columns.toSeq
    require(Seq("url", "warc_ts", "raw_md5", "contents").forall(cols.contains),
      s"currentPerUrl needs url/warc_ts/raw_md5/contents columns, got: $cols")
    docs.groupBy(col("url"))
      .agg(max_by(struct(cols.map(col): _*),
        struct(col("warc_ts"), col("raw_md5"), md5(col("contents")))).as("__r"))
      .select(cols.map(c => col("__r." + c).as(c)): _*)
  }
}
