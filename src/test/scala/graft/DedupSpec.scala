package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Connected components over near-dup pairs: the transitive-closure step
  * that turns pairwise evidence into a dedup decision. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], ids: Seq[Long], parts: Int = 3) =
    Dedup.connectedComponents(
        pairs.toDF("id_a", "id_b").repartition(parts),
        ids.toDF("id").repartition(parts))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq

  test("chains close transitively; singletons keep themselves") {
    val out = cc(Seq((1L, 2L), (2L, 3L), (5L, 6L)), Seq(1L, 2L, 3L, 5L, 6L, 7L))
    assert(out == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (5L, 5L, true), (6L, 5L, false),
      (7L, 7L, true)))
  }

  test("long chain converges to one component (diameter rounds)") {
    val n = 40L
    val chain = (1L until n).map(i => (i, i + 1))
    val out = cc(chain, (1L to n).toSeq)
    assert(out.forall(_._2 == 1L))
    assert(out.count(_._3) == 1)
  }

  test("deterministic across partitionings") {
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L), (30L, 40L))
    val ids = Seq(10L, 20L, 30L, 40L, 50L, 60L)
    assert(cc(pairs, ids, 1) == cc(pairs, ids, 7))
  }
}
