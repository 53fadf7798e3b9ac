package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Multi-table LSH vs the exact brute-force baseline: recall@k at sf0.1 and
  * the occupancy-sizing math that keeps bucket populations constant as the
  * corpus grows.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sfDir = "/root/testdata/sf0.1"

  test("occupancy sizing: E[bucket] ~ target at any corpus size") {
    assert(Similarity.occupancySizedBits(1L << 30, 1024) == 20) // 10^9 rows -> 2^20 buckets
    assert(Similarity.occupancySizedBits(1L << 20, 1024) == 10)
    assert(Similarity.occupancySizedBits(500, 1024) == 1) // degrades gracefully at tiny n
  }

  test("lshTopK recall@5 >= 0.9 vs brute force at sf0.1 (occupancy-sized bits, 16 tables)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
    val k = 5
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nBits = Similarity.occupancySizedBits(emb.count())
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k, nBits, nTables = 16)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall nBits=$nBits")
    // at this corpus size the candidate union is effectively exhaustive, so
    // the approximate path must reproduce the exact top-k (the q22 oracle
    // depends on this equality)
    assert(approx == exact, s"recall=$recall")
  }

  test("embeddingNearDupPairs finds every injected duplicate pair") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val withDups = emb.unionByName(
      emb.where(col("vec_id") < 10).withColumn("vec_id", col("vec_id") + 100000L))
    val nBits = Similarity.occupancySizedBits(withDups.count(), targetOccupancy = 32)
    val pairs = Similarity.embeddingNearDupPairs(withDups, "vec_id", "embedding",
        minCos = 0.9999, nBits = nBits, nTables = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 10L).map(i => (i, i + 100000L)).toSet
    assert(expected.subsetOf(pairs), s"missing: ${expected diff pairs}")
  }

  test("cosine of a vector with itself is ~1 and symmetric in arguments") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val r = df.select(
      Similarity.cosine(col("a"), col("a")).as("self"),
      Similarity.cosine(col("a"), col("b")).as("ab"),
      Similarity.cosine(col("b"), col("a")).as("ba")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == r.getDouble(2))
  }
}
