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

  test("pageRank teleport seeds: hand-computed trustrank; all-seed == unseeded; guards") {
    import spark.implicits._
    // nodes {0, 1}, edge 0 -> 1, seeds {0}, mass 400, damping 0.5:
    // nSeeds 1 -> init 400, base(0) = 200, base(1) = 0
    // r0 = (400, 0); it1: 0 sends 400 to 1 -> r = (200, 0 + 200 = 200)
    // it2: 0 sends 200 -> r = (200, 0 + 100 = 100)
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val ids = Seq(0L, 1L).toDF("id")
    val seeds = Seq(0L).toDF("id")
    val out = LinkGraph.pageRank(edges, ids, iters = 2, dampingPpm = 500000L,
        totalMass = 400L, teleportSeeds = Some(seeds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 200L, 1L -> 100L), s"got $out")
    // a non-seed node unreachable from any seed decays to exactly zero
    val iso = LinkGraph.pageRank(Seq((0L, 1L)).toDF("src", "dst"),
        Seq(0L, 1L, 2L).toDF("id"), iters = 3, teleportSeeds = Some(seeds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(iso(2L) == 0L, s"unreachable non-seed must decay to 0: $iso")
    // everyone-a-seed is bit-identical to the unseeded classic
    val n = 40L
    val bigIds = (0L until n).toDF("id")
    val bigEdges = (0L until n).map(i => (i, (i * 7 + 3) % n)).toDF("src", "dst")
    val classic = LinkGraph.pageRank(bigEdges, bigIds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allSeed = LinkGraph.pageRank(bigEdges, bigIds, iters = 3,
        teleportSeeds = Some(bigIds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(allSeed == classic)
    // a seed outside the id universe raises loudly
    val bad = intercept[Exception] {
      LinkGraph.pageRank(edges, ids, iters = 1,
        teleportSeeds = Some(Seq(9L).toDF("id"))).collect()
    }
    assert(bad.getMessage.contains("seed not in ids"), bad.getMessage)
  }

  test("pageRank weighted: hand-computed one-iteration values; weight guards") {
    import spark.implicits._
    // 0 -> 1 (w 3), 0 -> 0 (w 1), 1 -> 0 (w 1); mass 400, damping 0.5:
    // init 200, base 100; od(0) = 4, od(1) = 1
    // iter1 contribs: 0 sends (200*3)/4 = 150 to 1, (200*1)/4 = 50 to 0;
    //   1 sends 200 to 0 -> inbound (0: 250, 1: 150)
    //   r = (0: 100 + 125 = 225, 1: 100 + 75 = 175)
    val edges = Seq((0L, 1L, 3L), (0L, 0L, 1L), (1L, 0L, 1L))
      .toDF("src", "dst", "w")
    val ids = Seq(0L, 1L).toDF("id")
    val out = LinkGraph.pageRank(edges, ids, iters = 1, dampingPpm = 500000L,
        totalMass = 400L, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 225L, 1L -> 175L), s"got $out")
    val zeroW = intercept[Exception] {
      LinkGraph.pageRank(Seq((0L, 1L, 0L)).toDF("src", "dst", "w"), ids,
        iters = 1, weightCol = Some("w")).collect()
    }
    assert(zeroW.getMessage.contains("weights"), zeroW.getMessage)
    val bigW = intercept[Exception] {
      LinkGraph.pageRank(Seq((0L, 1L, Long.MaxValue / 2)).toDF("src", "dst", "w"),
        ids, iters = 1, weightCol = Some("w")).collect()
    }
    assert(bigW.getMessage.contains("weights"), bigW.getMessage)
  }

  test("domainAuthority: per-domain rank equals pageRank on the aggregated weighted graph; null domain is a node") {
    import spark.implicits._
    // domains: A {0,1}, B {2,3}, C {4,5}, null {6}
    val docDomains = Seq(
      (0L, Some("a.com")), (1L, Some("a.com")),
      (2L, Some("b.com")), (3L, Some("b.com")),
      (4L, Some("c.com")), (5L, Some("c.com")),
      (6L, None: Option[String])).toDF("id", "domain")
    // page edges -> domain edges: A->B w2, B->C w1, B->A w1, C->C w1, null->A w1
    val edges = Seq((0L, 2L), (1L, 3L), (2L, 4L), (3L, 0L), (5L, 5L), (6L, 1L))
      .toDF("src", "dst")
    val out = LinkGraph.domainAuthority(docDomains, edges, iters = 3)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(out.length == 7)
    val byDom = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    assert(byDom.values.forall(_.size == 1), s"domain members must share rank: $byDom")
    // parity: the hand-aggregated weighted domain graph through pageRank
    // (node ids = min member id: A=0, B=2, C=4, null=6)
    val domEdges = Seq((0L, 2L, 2L), (2L, 4L, 1L), (2L, 0L, 1L), (4L, 4L, 1L),
      (6L, 0L, 1L)).toDF("src", "dst", "w")
    val expected = LinkGraph.pageRank(domEdges, Seq(0L, 2L, 4L, 6L).toDF("id"),
        iters = 3, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDom(Some("a.com")).head == expected(0L))
    assert(byDom(Some("b.com")).head == expected(2L))
    assert(byDom(Some("c.com")).head == expected(4L))
    assert(byDom(None).head == expected(6L))
  }

  test("domainAuthority guards: duplicate ids and unknown edge endpoints raise") {
    import spark.implicits._
    val dd = Seq((0L, "a"), (1L, "a")).toDF("id", "domain")
    val dup = intercept[Exception] {
      LinkGraph.domainAuthority(Seq((0L, "a"), (0L, "a"), (1L, "b")).toDF("id", "domain"),
        Seq((0L, 1L)).toDF("src", "dst"), iters = 1).collect()
    }
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
    val unknown = intercept[Exception] {
      LinkGraph.domainAuthority(dd, Seq((0L, 9L)).toDF("src", "dst"), iters = 1).collect()
    }
    assert(unknown.getMessage.contains("endpoint"), unknown.getMessage)
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
