package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming keep-newest-per-url (the recrawl collapse,
  * `WebCuration.latestCapture`, lifted onto keyed stream state): captures
  * of the same url keep arriving across snapshots; the state remembers the
  * current winner and capture count per url, and every micro-batch that
  * touches a url APPENDS a re-versioned winner row — so the sink is an
  * append-only log (file-sink friendly) whose latest-version view per url
  * converges to the batch operator over the same rows, under ANY split of
  * the input into micro-batches (the StreamingCuration re-version
  * contract).
  *
  * Winner rule is identical to batch: greatest (ts, id), NULL ts loses to
  * any timestamped capture, all-NULL groups fall back to the greatest id —
  * Scala's `Ordering[Option]` (None first) mirrors Spark's null-first
  * struct ordering exactly.
  *
  * State per url: one (version, count, ts, id) tuple; processing-time
  * timeout expires idle urls so an unbounded crawl keeps bounded state
  * (an expired url restarts its count — the documented boundedness
  * trade, same as [[StatefulDedup]]). */
object StreamingRecrawl {

  /** One capture arrival. */
  final case class Capture(url: String, ts: Option[Long], id: Long)

  /** The winner row appended whenever a url's group receives data;
    * `version` increments per url per emitting micro-batch. */
  final case class CaptureVersion(url: String, version: Long,
                                  n_captures: Long, ts: Option[Long], id: Long)

  // state rides a plain tuple (version, n_captures, ts, id) — a nested
  // case-class state encoder trips Janino codegen in the state store path
  private type UrlState = (Long, Long, Option[Long], Long)

  private val winnerOrd: Ordering[(Option[Long], Long)] =
    Ordering.Tuple2(Ordering.Option(Ordering.Long), Ordering.Long)

  def latestCaptureVersions(stream: Dataset[Capture],
                            stateTimeout: String = "24 hours"): Dataset[CaptureVersion] = {
    import stream.sparkSession.implicits._
    stream
      .groupByKey(_.url)
      .flatMapGroupsWithState[UrlState, CaptureVersion](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (url: String, rows: Iterator[Capture], state: GroupState[UrlState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val arrivals = rows.toSeq
            val prev = state.getOption
            var best: Option[(Option[Long], Long)] = prev.map(s => (s._3, s._4))
            arrivals.foreach { c =>
              val cand = (c.ts, c.id)
              if (best.forall(b => winnerOrd.compare(cand, b) > 0)) best = Some(cand)
            }
            val (bts, bid) = best.get // arrivals is non-empty here
            val next: UrlState = (prev.map(_._1 + 1).getOrElse(0L),
              prev.map(_._2).getOrElse(0L) + arrivals.size, bts, bid)
            state.update(next)
            state.setTimeoutDuration(stateTimeout)
            Iterator.single(CaptureVersion(url, next._1, next._2, next._3, next._4))
          }
      }
  }
}
