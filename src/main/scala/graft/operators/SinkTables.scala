package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Per-sink tables: the corpus-level equivalent of the reference's seven
  * output files (pdf/output.go:23-67), produced by exploding the
  * ExtractedDoc columns — one narrow append-friendly table per sink, so a
  * consumer tails urls.txt-at-corpus-scale without touching payload columns.
  *
  * Scale note: derive sinks from the COMMITTED parquet table, not from the
  * in-flight typed pipeline — parquet column pruning reduces the scan to
  * (url, <one array>) (asserted in SinkTablesSpec), whereas Catalyst does
  * not prune the object serializer under a Generate+Filter, so an in-flight
  * explode pays for all ExtractedDoc fields.
  */
object SinkTables {

  private def lines(docs: DataFrame, col_ : String): DataFrame =
    docs.select(col("url"), posexplode(col(col_)).as(Seq("line_no", "line")))

  /** urls.txt analogue: (url, line_no, line). */
  def urls(docs: Dataset[ExtractedDoc]): DataFrame = lines(docs.toDF(), "urls")

  /** files.txt analogue ("md5:name" manifest lines). */
  def files(docs: Dataset[ExtractedDoc]): DataFrame = lines(docs.toDF(), "files")

  /** commands.txt analogue. */
  def commands(docs: Dataset[ExtractedDoc]): DataFrame = lines(docs.toDF(), "commands")

  /** errors.txt analogue (the abnormality channel). */
  def errors(docs: Dataset[ExtractedDoc]): DataFrame = lines(docs.toDF(), "errors")

  /** embedded-file blob table: (url, md5, name, data) — the DumpFile
    * analogue (pdf/output.go:93-104, one disk file per embedded payload
    * named by its md5). `data` carries the payload bytes when the pipeline
    * ran with `includeEmbedded = true` (ExtractPipeline.extractDocs); under
    * the default it is null and the row is a manifest entry only. */
  def embedded(docs: Dataset[ExtractedDoc]): DataFrame =
    docs.toDF().select(col("url"),
        posexplode(arrays_zip(col("embedded_md5"), col("embedded_name"))).as(Seq("idx", "e")),
        col("embedded_data"))
      .select(col("url"), col("e.embedded_md5").as("md5"), col("e.embedded_name").as("name"),
        // get is 0-based and null-safe for both a null column and (should
        // the arrays ever disagree) an out-of-range index — never an ANSI
        // INVALID_ARRAY_INDEX task failure
        get(col("embedded_data"), col("idx")).as("data"))

  /** contents.txt analogue: (url, contents bytes + utf8 view). */
  def contents(docs: Dataset[ExtractedDoc]): DataFrame =
    docs.toDF().select(col("url"), col("contents"),
      decode(col("contents"), "UTF-8").as("text"))

  /** javascript.js analogue, non-empty only. */
  def javascript(docs: Dataset[ExtractedDoc]): DataFrame =
    docs.toDF().where(length(col("javascript")) > 0)
      .select(col("url"), col("javascript"),
        decode(col("javascript"), "UTF-8").as("js"))

  /** All seven sink tables keyed by name (for TableIO appends per batch). */
  def all(docs: Dataset[ExtractedDoc]): Map[String, DataFrame] = Map(
    "sink_contents" -> contents(docs),
    "sink_javascript" -> javascript(docs),
    "sink_urls" -> urls(docs),
    "sink_files" -> files(docs),
    "sink_commands" -> commands(docs),
    "sink_errors" -> errors(docs),
    "sink_embedded" -> embedded(docs))
}
