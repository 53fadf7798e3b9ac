package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.sources.CrawlRow

/** Streaming first-seen-wins dedup with explicit keyed state: a continuously
  * arriving crawl re-fetches urls; only the first occurrence of each url may
  * flow into extraction (exactly-once per url even before the sink commit).
  * Implemented with flatMapGroupsWithState over KeyValueGroupedDataset — the
  * custom-state primitive — rather than dropDuplicates, so the state
  * contract (what is remembered per key, when it expires) is explicit and
  * testable. State per url is one boolean; with processing-time timeout the
  * state footprint is bounded for an unbounded crawl.
  */
object StatefulDedup {

  def firstSeenOnly(stream: Dataset[CrawlRow],
                    stateTimeout: String = "24 hours"): Dataset[CrawlRow] = {
    import stream.sparkSession.implicits._
    stream
      .groupByKey(_.url)
      .flatMapGroupsWithState[Boolean, CrawlRow](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (url: String, rows: Iterator[CrawlRow], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // url already seen: drop all re-fetches
          } else {
            state.update(true)
            state.setTimeoutDuration(stateTimeout)
            rows.take(1) // first occurrence wins, duplicates in-batch drop too
          }
      }
  }
}
