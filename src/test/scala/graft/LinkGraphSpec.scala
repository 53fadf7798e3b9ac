package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LinkGraph

/** Integer PageRank: hand-computed fixed point, dangling mass retirement,
  * partitioning independence, loud guards. */
class LinkGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("pageRank: hand-computed two-iteration values on a 3-node graph") {
    import spark.implicits._
    // 0 -> {1, 2}, 1 -> {2}, 2 dangling; mass 300, damping 0.5:
    // init = 100, base = 50
    // iter1: contribs 0 sends 50 to 1 and 2; 1 sends 100 to 2
    //   r = (0: 50, 1: 50 + 25 = 75, 2: 50 + 75 = 125)
    // iter2: 0 sends 25 to 1 and 2; 1 sends 75 to 2
    //   r = (0: 50, 1: 50 + 12 = 62, 2: 50 + 50 = 100)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val ids = Seq(0L, 1L, 2L).toDF("id")
    val out = LinkGraph.pageRank(edges, ids, iters = 2,
        dampingPpm = 500000L, totalMass = 300L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 50L, 1L -> 62L, 2L -> 100L), s"got $out")
  }

  test("pageRank: mass never grows, deterministic across partitionings, isolated node keeps base") {
    import spark.implicits._
    val n = 60L
    val ids = (0L until n).toDF("id")
    // node 59 isolated (no in- or out-edges); the rest a mod ring with skew
    val edges = (0L until n - 1).flatMap(i =>
      Seq((i, (i * 7 + 1) % (n - 1)), (i, (i * 3 + 2) % (n - 1))))
      .toDF("src", "dst")
    val total = 1000000000000L
    val out = LinkGraph.pageRank(edges, ids, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 60)
    assert(out.values.sum <= total, "truncation + damping can only retire mass")
    assert(out.values.forall(_ >= 0L))
    // the isolated node holds exactly the teleport base
    val base = 150000L * (total / n) / 1000000L
    assert(out(59L) == base, s"isolated: ${out(59L)} vs base $base")
    val rep = LinkGraph.pageRank(edges.repartition(17), ids.repartition(5), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == out)
  }

  test("pageRank guards: null endpoints, duplicate ids, parameter ranges") {
    import spark.implicits._
    val ids = Seq(0L, 1L).toDF("id")
    val nullEdge = Seq((Some(0L), None: Option[Long])).toDF("src", "dst")
    val e = intercept[Exception] {
      LinkGraph.pageRank(nullEdge, ids, iters = 1).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("non-null"), e.getMessage)
    val dup = intercept[Exception] {
      LinkGraph.pageRank(Seq((0L, 1L)).toDF("src", "dst"),
        Seq(0L, 0L, 1L).toDF("id"), iters = 1).collect()
    }
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
    assert(intercept[IllegalArgumentException] {
      LinkGraph.pageRank(Seq((0L, 1L)).toDF("src", "dst"), ids, iters = 0)
    }.getMessage.contains("iters"))
    assert(intercept[IllegalArgumentException] {
      LinkGraph.pageRank(Seq((0L, 1L)).toDF("src", "dst"), ids, iters = 1,
        dampingPpm = 1000001L)
    }.getMessage.contains("dampingPpm"))
    assert(intercept[IllegalArgumentException] {
      LinkGraph.pageRank(Seq((0L, 1L)).toDF("src", "dst"), ids, iters = 1,
        totalMass = Long.MaxValue)
    }.getMessage.contains("totalMass"))
  }
}
