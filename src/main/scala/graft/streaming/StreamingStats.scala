package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{QuantileFunctions, QuantileNames}

/** Distribution-drift monitoring over a document/event stream: per
  * tumbling window, the count plus approximate quantiles and (optionally)
  * CDF points of an integral score column — the panel a 100 TB ingest
  * operator actually watches ("did the p50 quality of this hour's crawl
  * fall off a cliff? how many documents score under the gate?").
  *
  * Built on the MERGEABLE sketch aggregates ([[graft.functions.ApproxQuantiles]] /
  * [[graft.functions.ApproxRanks]]): partial summaries merge across
  * micro-batches in the state store exactly as they merge across
  * executors in batch, so state per open window is O(k log(n/k)) longs —
  * never the values. This is precisely the property that rules out
  * `Stats.exactQuantiles` here: its value histogram grows with distinct
  * values and its cumulative window needs the whole group at once.
  *
  * Works on a streaming OR batch frame (the parity spec runs both; the
  * batch run doubles as the backfill path). Windows close and emit as
  * the watermark passes window end (append mode); late rows beyond
  * `watermarkDelay` drop, the documented streaming-aggregation trade. */
object StreamingStats {

  /** One row per closed tumbling window:
    * (window_start, n, p50..., [r_<probe>...]).
    * `scoreCol` must be integral (the sketch contract); quantile columns
    * use the shared pXX naming, probe columns the shared r_<v> naming. */
  def windowedScoreDistribution(df: DataFrame, tsCol: String, scoreCol: String,
                                windowSeconds: Long = 3600L, k: Int = 256,
                                ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
                                probes: Seq[Long] = Seq.empty,
                                watermarkDelay: String = "1 hour"): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    // watermarks require TIMESTAMP (with zone); parquet event times often
    // load as TIMESTAMP_NTZ — cast in BOTH modes so parity holds
    val cast = df.withColumn("__ts", col(tsCol).cast("timestamp"))
    val base =
      if (cast.isStreaming) cast.withWatermark("__ts", watermarkDelay) else cast
    val aggs: Seq[Column] =
      QuantileFunctions.approxQuantiles(col(scoreCol), k, ps).as("q") +:
        (if (probes.nonEmpty)
          Seq(QuantileFunctions.approxRanks(col(scoreCol), k, probes).as("r"))
        else Seq.empty)
    val grouped = base
      .groupBy(window(col("__ts"), s"$windowSeconds seconds"))
      .agg(aggs.head, aggs.tail: _*)
    val out: Seq[Column] =
      Seq(col("window.start").as("window_start"), col("q.n").as("n")) ++
        ps.map(p => col("q." + QuantileNames.pName(p))) ++
        probes.map(v => col("r." + QuantileNames.rName(v)))
    grouped.select(out: _*)
  }
}
