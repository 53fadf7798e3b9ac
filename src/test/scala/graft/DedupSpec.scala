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

  test("empty id set yields an empty result (a fully-gated-out corpus must not crash)") {
    val out = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
      Seq.empty[Long].toDF("id"))
    assert(out.count() == 0)
  }

  test("non-convergence fails loudly instead of returning wrong labels") {
    val chain = (1L until 10L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain.toDF("id_a", "id_b"), (1L to 10L).toDF("id"), maxIter = 3)
        .collect()
    }
  }

  test("simhashPairs == brute-force all-pairs hamming (pigeonhole: 4-chunk blocking is EXACT for radius 3)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val withDups = docs.unionByName(
      docs.where(col("doc_id") < 20).withColumn("doc_id", col("doc_id") + 100000L))
    val blocked = Dedup.simhashPairs(withDups, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashed = withDups.select(col("doc_id").as("id"), Dedup.simhash(col("text")).as("sh"))
    val brute = hashed.as("a").crossJoin(hashed.as("b"))
      .where(col("a.id") < col("b.id") &&
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))) <= 3)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute, s"missing=${brute diff blocked} extra=${blocked diff brute}")
  }

  test("simhash frequency cap drops only over-popular blocks") {
    // 60 docs sharing a template prefix (popular chunks) + 2 true dups
    val docs = ((0 until 60).map(i => (i.toLong, s"shared template header words $i unique tail $i")) ++
      Seq((100L, "totally distinct duplicate pair body text"),
          (101L, "totally distinct duplicate pair body text")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3, maxBlock = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact-dup pair shares ALL four chunks; its block (size 2) is under
    // the cap, so the cap must keep it while pruning template-block pairs
    assert(uncapped.contains((100L, 101L)))
    assert(capped.contains((100L, 101L)))
    assert(capped.subsetOf(uncapped))
  }

  test("deterministic across partitionings") {
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L), (30L, 40L))
    val ids = Seq(10L, 20L, 30L, 40L, 50L, 60L)
    assert(cc(pairs, ids, 1) == cc(pairs, ids, 7))
  }
}
