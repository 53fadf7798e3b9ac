package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality over the crawl's hyperlink structure — the
  * crawl-prioritization / source-weighting signal a web-scale pipeline
  * computes next to its content operators (which pages are worth
  * re-crawling first, which hosts deserve mixture weight).
  *
  * No reference counterpart (the reference is a single-document parser);
  * this is corpus-level pipeline surface like the dedup/curation family.
  */
object LinkGraph {

  /** Fixed-iteration PageRank in PURE NON-NEGATIVE INTEGER arithmetic —
    * bit-for-bit reproducible under any partitioning and identical across
    * engines (every division has non-negative operands, where floor ==
    * truncate in all engine versions; no doubles anywhere, so no
    * summation-order drift).
    *
    * Formulation: each node starts with `totalMass div n`; per iteration
    * each node sends `rank div outdeg` along every out-edge and the next
    * rank is `base + (dampingPpm * inbound_sum) div 1e6` with
    * `base = ((1e6 - dampingPpm) * (totalMass div n)) div 1e6`. Dangling
    * nodes (no out-edges) simply retire their mass — the standard
    * simplification; total mass is monotonically non-increasing, which
    * also caps every intermediate: inbound sums never exceed `totalMass`,
    * so `dampingPpm * sum` fits a signed long by the `totalMass` guard.
    *
    * Contract mirrors [[Dedup.connectedComponents]]: `edges` has (src,
    * dst) with both endpoints drawn from `ids`' `id` universe (null
    * endpoints raise loudly; ids must be unique), `iters` is fixed —
    * centrality ranking stabilizes in a few rounds and a FIXED count is
    * what makes the result a frozen, replayable dataset artifact rather
    * than a convergence race.
    *
    * Scale shape: out-degree is one map-side-combined groupBy; the
    * per-iteration work is an (src, dst, od)-by-(id, rank) long-frame
    * join + a map-side-combined inbound sum + the node-anchored rebase —
    * compact longs on every exchange, no windows, no driver loops over
    * data (the only driver-side values are the node COUNT and the two
    * derived constants). The degree-annotated edge frame is persisted
    * once and reused by every iteration, and each iteration's rank frame
    * is checkpointed (`reliableCheckpoint` for executor-churn-proof
    * production runs) so lineage stays O(1)-deep exactly like the CC
    * rounds. Output: (id, rank_mass). */
  def pageRank(edges: DataFrame, ids: DataFrame, iters: Int,
               dampingPpm: Long = 850000L,
               totalMass: Long = 1000000000000L,
               reliableCheckpoint: Boolean = false): DataFrame = {
    val op = "LinkGraph.pageRank"
    require(iters >= 1 && iters <= 1000, s"$op: iters must be in [1, 1000], got $iters")
    require(dampingPpm >= 0L && dampingPpm <= 1000000L,
      s"$op: dampingPpm must be in [0, 1e6], got $dampingPpm")
    // dampingPpm * inbound_sum <= 1e6 * totalMass must fit a signed long
    require(totalMass > 0L && totalMass <= Long.MaxValue / 1000000L,
      s"$op: totalMass must be in (0, ${Long.MaxValue / 1000000L}], got $totalMass")
    val anchor = Dedup.checkedIdAnchor(ids, "id", op)
    val n = anchor.count()
    require(n > 0L, s"$op: needs at least one node")
    val init = totalMass / n
    val base = (1000000L - dampingPpm) * init / 1000000L
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(when(col("src").isNotNull && col("dst").isNotNull, lit(true))
        .otherwise(raise_error(concat(
          lit(s"$op: edge endpoints must be non-null, got src="),
          coalesce(col("src").cast("string"), lit("null")), lit(" dst="),
          coalesce(col("dst").cast("string"), lit("null")))).cast("boolean")))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val edgesOd = e.join(deg, Seq("src")).persist()
    try {
      edgesOd.count() // materialize once; reused every iteration
      var r = Dedup.checkpointDf(
        anchor.select(col("id"), lit(init).as("r")), reliableCheckpoint)
      var i = 0
      while (i < iters) {
        val contrib = edgesOd
          .join(r.withColumnRenamed("id", "src"), Seq("src"))
          .select(col("dst"), expr("r div od").as("c"))
        val inbound = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
        r = Dedup.checkpointDf(
          anchor.join(inbound.withColumnRenamed("dst", "id"), Seq("id"), "left")
            .select(col("id"),
              (lit(base) +
                expr(s"coalesce(s, 0L) * ${dampingPpm}L div 1000000L")).as("r")),
          reliableCheckpoint)
        i += 1
      }
      r.select(col("id"), col("r").as("rank_mass"))
    } finally edgesOd.unpersist()
  }
}
