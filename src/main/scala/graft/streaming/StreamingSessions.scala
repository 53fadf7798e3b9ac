package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization on the event stream with Spark's NATIVE
  * session-window state (merging windows + watermark eviction) — the
  * streaming counterpart of the batch q12 sessionize.
  *
  * Semantics note: `session_window` extends a session while the next
  * event starts strictly BEFORE prev_ts + gap, i.e. an event exactly
  * `gap` after its predecessor opens a NEW session — the batch q12
  * formulation (`ts - prev_ts > gap` starts new) keeps that boundary
  * event in the old session. The parity spec therefore compares the
  * stream against the SAME session_window aggregation run in batch mode:
  * what it proves is that the streaming machinery — keyed session state
  * merging across micro-batches, watermark-driven emission — reproduces
  * the batch answer exactly, not that two different gap conventions
  * coincide.
  *
  * Scale shape: one hash shuffle on user_id; per-key state is one open
  * session per user (bounded), closed sessions evict as the watermark
  * passes session_end, so an unbounded stream keeps bounded state. */
object StreamingSessions {

  /** One row per closed session: (user_id, session_start, session_end,
    * n_events). Works on a streaming OR batch frame with (user_id, ts)
    * columns — the parity spec runs it in both modes. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L,
                 watermarkDelay: String = "1 hour"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    // watermarks require TIMESTAMP (with zone); parquet event times often
    // load as TIMESTAMP_NTZ — cast in BOTH modes so parity holds
    val cast = events.withColumn("ts", col("ts").cast("timestamp"))
    val base =
      if (cast.isStreaming) cast.withWatermark("ts", watermarkDelay) else cast
    base
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }
}
