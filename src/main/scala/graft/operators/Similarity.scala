package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>): brute-force
  * cosine top-k as the exact baseline, plus a deterministic random-hyperplane
  * LSH bucketing as the 100 TB scale path (candidates shrink by the bucket
  * factor before the exact re-rank). All scoring is native Catalyst
  * expressions (zip_with/aggregate — no UDFs, zero extra serialization);
  * the query side is broadcast so the corpus is scanned exactly once with
  * no shuffle of the embedding vectors.
  */
object Similarity {

  /** dot(a, b) via zip_with + aggregate (native expression, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact brute-force top-k neighbors for each query id.
    * queries is expected to be small: it is broadcast, so the plan is
    * one corpus scan -> broadcast nested loop -> per-query top-k. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        cosine(col("vec"), col("query_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim):
    * splitmix64 folded to [-0.5, 0.5). Same value on every executor/JVM. */
  private def coeff(plane: Column, dim: Column): Column =
    (pmod(xxhash64(plane, dim), lit(100000L)).cast("double") / lit(100000.0d)) - lit(0.5d)

  /** nBits-bit random-hyperplane signature of a vector: bit p is the sign of
    * dot(vec, plane_p). Buckets collide for nearby directions (cosine LSH). */
  def hyperplaneSignature(vec: Column, nBits: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(nBits - 1)), p => {
        val d = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => x * coeff(p, i)),
          lit(0.0d), (acc, v) => acc + v)
        when(d >= 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc + x)

  /** LSH-bucketed approximate top-k: candidates restricted to the query's
    * bucket (same nBits signature), then exact cosine re-rank. At corpus
    * scale the bucket join shuffles only (id, bucket) pairs plus the
    * in-bucket vectors, never the full cross product. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nBits: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      hyperplaneSignature(col(vecCol), nBits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
      hyperplaneSignature(col(vecCol), nBits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        cosine(col("vec"), col("query_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= minCos),
    * LSH-blocked then exactly verified. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            minCos: Double = 0.95, nBits: Int = 8): DataFrame = {
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      hyperplaneSignature(col(vecCol), nBits).as("bucket"))
    val a = sig.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = sig.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("cos"))
      .where(col("cos") >= minCos)
      .dropDuplicates("id_a", "id_b")
  }
}
