package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * Everything below is built from native Catalyst expressions
  * (transform/aggregate/zip_with/xxhash64) — no UDFs, no Python workers.
  * (Higher-order functions evaluate on the interpreted expression path, not
  * whole-stage codegen, but they read from the columnar batch directly and
  * add zero (de)serialization.) The only shuffles are the final groupBy /
  * self-join on compact keys (band hashes, simhash chunks, id pairs) —
  * never on document text.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup: one row per distinct text, keeping the smallest id.
    * Shuffle key is md5(text) (32 bytes), not the text itself. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("text_md5"), col(idCol))
      .groupBy(col("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ---------- shingles ----------

  /** Word n-gram shingles (array<string>) of the whitespace tokens. */
  def wordShingles(textCol: Column, n: Int): Column = {
    val tokens = split(textCol, " ")
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n),
        i => array_join(slice(tokens, i + 1, lit(n)), " ")))
      .otherwise(array(textCol))
  }

  /** Character n-gram shingles. */
  def charShingles(textCol: Column, n: Int): Column =
    when(length(textCol) >= n,
      transform(sequence(lit(0), length(textCol) - n),
        i => textCol.substr(i + 1, lit(n))))
      .otherwise(array(textCol))

  // ---------- MinHash + LSH ----------

  /** MinHash signature (array<bigint> of length k) over a shingle array.
    * Hash family: two xxhash64 draws per shingle combined by bit rotation —
    * h_j(s) = h1(s) XOR rot(h2(s), j) — the standard two-hash construction,
    * ANSI-safe (no overflowing arithmetic) and k/2 x fewer hash evaluations
    * than one xxhash64 per (shingle, j). One pass, map-local. */
  def minhashSignatureDeclarative(shinglesCol: Column, k: Int): Column = {
    // hash each shingle exactly twice (materialized via the struct array so
    // Catalyst cannot re-evaluate xxhash64 inside the k-wide inner loop)
    val hashed = transform(shinglesCol,
      s => struct(xxhash64(s, lit(1)).as("h1"), xxhash64(s, lit(2)).as("h2")))
    aggregate(
      hashed,
      transform(sequence(lit(1), lit(k)), _ => lit(Long.MaxValue)),
      (acc, h) =>
        zip_with(
          acc,
          transform(sequence(lit(1), lit(k)), j => {
            val rot = call_function("shiftrightunsigned", h.getField("h2"), j)
              .bitwiseOR(call_function("shiftleft", h.getField("h2"), lit(64) - j))
            h.getField("h1").bitwiseXOR(rot)
          }),
          (a, b) => least(a, b)))
  }

  /** LSH band keys: the signature split into `bands` bands of k/bands rows,
    * each hashed to one bigint. Docs sharing any (band_idx, band_hash) are
    * candidate near-duplicates. */
  def lshBands(sigCol: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    transform(sequence(lit(0), lit(bands - 1)), b => xxhash64(slice(sigCol, b * r + 1, lit(r))))
  }

  /** MinHash-LSH near-duplicate candidate pairs, verified by estimated
    * jaccard (signature agreement ratio).
    * Output: (id_a, id_b, est_jaccard) with id_a < id_b. The rows entering
    * dropDuplicates are identical per pair (est_jaccard is a function of
    * the two signatures), so the result is deterministic under ties. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleWords: Int = 3, k: Int = 64, bands: Int = 16,
                      minJaccard: Double = 0.5): DataFrame = {
    val banded = df.select(
        col(idCol).as("id"),
        graft.functions.SketchFunctions.minhashSig(col(textCol), shingleWords, k).as("sig"))
      .select(col("id"), col("sig"), posexplode(lshBands(col("sig"), k, bands)).as(Seq("band_idx", "band_hash")))

    val a = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(k)).as("est_jaccard"))
      .where(col("est_jaccard") >= minJaccard)
      .dropDuplicates("id_a", "id_b")
  }

  /** Banded-LSH candidate pairs (id_a < id_b) — the shared candidate
    * generator for the exact-verified dedup operators. Only
    * (band_idx, band_hash, id) triples cross the self-join exchange: 3
    * bigints per (row, band), never signatures, shingles, or text. */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
                           shingleWords: Int, k: Int, bands: Int): DataFrame = {
    val banded = df.select(
        col(idCol).as("id"),
        graft.functions.SketchFunctions.minhashSig(col(textCol), shingleWords, k).as("sig"))
      .select(col("id"), posexplode(lshBands(col("sig"), k, bands)).as(Seq("band_idx", "band_hash")))
    val a = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_a"))
    val b = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over whitespace tokens: per-bit vote of xxhash64(token),
    * folded into one bigint. Map-local, native expressions. */
  /** Fast path: native Catalyst expression (bit-identical to the
    * declarative formulation — see SketchExpressionsSpec). */
  def simhash(textCol: Column): Column =
    graft.functions.SketchFunctions.simhash64(textCol)

  def simhashDeclarative(textCol: Column): Column = {
    // hash each token once; the 64-bit vote loop then only shifts
    val tokenHashes = transform(split(textCol, " "), t => xxhash64(t))
    val votes = aggregate(
      tokenHashes,
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          b => when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)),
        (a, v) => a + v))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** SimHash near-duplicate pairs within a hamming radius, using 16-bit
    * chunk blocking (any pair at distance <= 3 shares one of 4 chunks —
    * pigeonhole) and bit_count verification.
    *
    * Skew: on template-heavy corpora one chunk value can dominate (e.g. a
    * boilerplate prefix fixing 16 simhash bits) and its block goes
    * quadratic. `maxBlock > 0` applies the standard blocking-key frequency
    * cap: (chunk_idx, chunk) blocks larger than maxBlock are dropped from
    * the self-join. A pair is then missed only if EVERY chunk the two
    * documents share is over-popular — exact duplicates additionally share
    * all four chunks, so a cap of maxBlock still finds a pair unless all
    * its shared chunks exceed the cap. AQE's skew-join split handles the
    * residual partition-level imbalance; the cap bounds the pair COUNT,
    * which no join strategy can. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBlock: Long = 0L): DataFrame = {
    val hashed = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val chunked = hashed.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftrightunsigned", col("sh"), c * 16).bitwiseAND(lit(0xffffL)))).as(Seq("chunk_idx", "chunk")))
    val blocked =
      if (maxBlock <= 0) chunked
      else {
        val counts = chunked.groupBy(col("chunk_idx"), col("chunk"))
          .agg(count(lit(1)).as("block_n"))
          .where(col("block_n") <= maxBlock)
          .select(col("chunk_idx"), col("chunk"))
        chunked.join(counts, Seq("chunk_idx", "chunk"), "left_semi")
      }
    val a = blocked.select(col("chunk_idx"), col("chunk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = blocked.select(col("chunk_idx"), col("chunk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  // ---------- duplicate clusters ----------

  /** Connected components over a near-duplicate pair set: every document
    * gets the minimum doc id of its component as `cluster_id` (`is_kept`
    * marks the representative). This is the step that turns pairwise
    * near-dup evidence into an actual dedup decision — transitive closure,
    * so A~B, B~C dedups C even when A!~C directly.
    *
    * Algorithm: iterative min-label propagation — each round every node
    * takes min(own label, neighbors' labels); converges in O(component
    * diameter) rounds (near-dup clusters are dense, so 2-4 in practice).
    * Each round is one shuffle join + partial-agg min, labels are
    * localCheckpoint'ed so the plan stays O(1) deep, and convergence is
    * detected by the (monotonically decreasing) label sum — no extra join.
    * For adversarial long-chain graphs the published alternating
    * large-star/small-star scheme (Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SoCC 2014) drops the round count to
    * O(log^2 n); dedup graphs do not need it. */
  def connectedComponents(pairs: DataFrame, ids: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    try {
      edges.count() // materialize once; reused every round

      // sum(label) is null on an empty frame — an empty id set must yield
      // an empty result, not an NPE (e.g. a curation run whose gates drop
      // every document)
      def labelSum(df: DataFrame): Long = {
        val r = df.agg(sum(col("label"))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }

      var labels = ids.select(col("id"), col("id").cast("long").as("label")).localCheckpoint()
      var prevSum = labelSum(labels)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val nbrMin = edges
          .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
          .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
        val next = labels
          .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
          .localCheckpoint()
        val nextSum = labelSum(next)
        converged = nextSum == prevSum
        prevSum = nextSum
        labels = next
        iter += 1
      }
      // an unconverged result is silently-wrong dedup — fail loudly instead.
      // maxIter bounds the component DIAMETER; graphs deeper than that want
      // the large-star/small-star scheme cited above.
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds (component diameter > $maxIter)")
      labels.select(col("id"), col("label").as("cluster_id"),
        (col("id") === col("label")).as("is_kept"))
    } finally edges.unpersist()
  }

  // ---------- n-gram Jaccard ----------

  /** Exact n-gram Jaccard similarity over banded-LSH candidates.
    *
    * The set algebra runs on 64-bit shingle hashes, not shingle strings —
    * identical jaccard up to hash collisions (~2^-64 per pair) at a
    * fraction of the compare and shuffle cost.
    *
    * Scale shape (replaces the old single-min-shingle blocking, which put
    * every document sharing one popular min-shingle into one quadratic
    * block and shuffled full shingle arrays with the rows):
    *  1. candidates from `minhashLshCandidates` — the self-join exchange
    *     carries only (band_idx, band_hash, id) triples;
    *  2. the (small) candidate pair set joins back to the per-id distinct
    *     shingle-hash arrays (broadcast when candidates fit, one O(N) hash
    *     join otherwise) and is verified with exact intersect/union.
    *
    * Recall for a pair at jaccard j is 1 - (1 - j^(k/bands))^bands
    * (identical docs are always candidates); with the defaults k=64,
    * bands=16 a j=0.9 pair is missed with probability 3.9e-8. For low
    * thresholds raise `bands` or lower `k/bands`. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleWords: Int = 3, minJaccard: Double = 0.5,
                        k: Int = 64, bands: Int = 16): DataFrame = {
    val cand = minhashLshCandidates(df, idCol, textCol, shingleWords, k, bands)
    val hashes = df.select(col(idCol).as("id"),
      graft.functions.SketchFunctions.shingleHashes(col(textCol), shingleWords).as("hashes"))
    cand
      .join(hashes.select(col("id").as("id_a"), col("hashes").as("sh_a")), Seq("id_a"))
      .join(hashes.select(col("id").as("id_b"), col("hashes").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }
}
