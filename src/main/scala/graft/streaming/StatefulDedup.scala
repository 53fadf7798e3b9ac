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

  /** A streaming near-duplicate match event: `id` (the arriving document)
    * matched `matched_id` (an earlier one) at the given simhash hamming
    * distance. */
  final case class NearDupMatch(id: Long, matched_id: Long, hamming: Int)

  /** Streaming NEAR-duplicate detection: the batch simhash chunk-blocking
    * scheme (radius <= 3 exact by pigeonhole, `Dedup.simhashPairs`) lifted
    * onto keyed stream state. Each arriving (id, simhash) emits its four
    * 16-bit chunks; per (chunk_idx, chunk) block the state remembers the
    * last `maxBlock` (id, simhash) entries (a FIFO ring — the streaming
    * analogue of the batch block-frequency star split: one over-popular
    * boilerplate block keeps a BOUNDED window instead of growing without
    * limit), and every arrival is hamming-verified against the remembered
    * entries. A doc matching in several chunks emits one event per chunk —
    * deduplicate downstream on (id, matched_id) if exact multiplicity
    * matters; first-match semantics only need any one event.
    *
    * Input must already carry the simhash (map-side:
    * `df.select($"id", SketchFunctions.simhash64($"text"))`) so the text
    * never enters the stateful exchange — mirroring the batch rule that
    * shuffles carry sketches, not documents.
    *
    * State per block: <= maxBlock (id, hash) pairs; processing-time timeout
    * expires idle blocks so an unbounded crawl keeps bounded state. */
  def nearDupMatches(hashed: Dataset[(Long, Long)],
                     maxHamming: Int = 3,
                     maxBlock: Int = 64,
                     stateTimeout: String = "24 hours"): Dataset[NearDupMatch] = {
    import hashed.sparkSession.implicits._
    hashed
      .flatMap { case (id, sh) =>
        (0 until 4).map(c => ((c, (sh >>> (c * 16)) & 0xffffL), id, sh))
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long)], NearDupMatch](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (key: (Int, Long), rows: Iterator[((Int, Long), Long, Long)],
         state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var ring = state.getOption.getOrElse(Nil) // newest first
            val out = List.newBuilder[NearDupMatch]
            // deterministic in-batch order: micro-batch iterators are not
            // ordered across partitions, so order arrivals by id
            rows.toSeq.sortBy(_._2).foreach { case (_, id, sh) =>
              ring.foreach { case (oid, osh) =>
                val ham = java.lang.Long.bitCount(sh ^ osh)
                if (ham <= maxHamming && oid != id) out += NearDupMatch(id, oid, ham)
              }
              ring = ((id, sh) :: ring).take(maxBlock)
            }
            state.update(ring)
            state.setTimeoutDuration(stateTimeout)
            out.result().iterator
          }
      }
  }
}
