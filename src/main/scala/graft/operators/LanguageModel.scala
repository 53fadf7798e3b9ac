package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the CCNet/FineWeb-style
  * "perplexity" quality filter re-expressed for a distributed engine: train
  * token statistics on a (reference) corpus, then score every document by
  * how surprising its tokens are under that model. Low-surprisal documents
  * read like the training corpus; high-surprisal documents are gibberish,
  * boilerplate hash soup, or another language.
  *
  * Deliberately INTEGER-formulated (the [[TfIdf]] discipline): a token's
  * surprisal is quantized to whole BITS,
  * `bits(tok) = floor(log2(total_occurrences)) - floor(log2(cnt(tok)))`,
  * and `floor(log2(n)) == length(bin(n)) - 1` for n >= 1 — a pure integer
  * identity both Spark and DuckDB compute exactly (`bin()` exists in both),
  * so scores are bit-for-bit reproducible across engines. A float
  * `-sum(log p)` would hash-differ by libm ulps and summation order; whole
  * bits lose sub-bit resolution but keep the filter's ranking power (a
  * one-bit step is a 2x frequency ratio).
  *
  * Scale shape: per-doc term frequencies are MAP-ONLY via the native
  * `token_tf` expression (strings collapse in-row before any exchange);
  * the model and every scoring exchange live in (md5, long) space; the
  * model frame is vocabulary-sized (<< corpus) and joins md5-keyed, so a
  * hot stopword costs one model row, never a hot partition. No token
  * string ever rides a shuffle here at all — the output is per-document
  * numbers.
  */
object LanguageModel {

  /** Train the unigram model: one row per distinct token with its corpus
    * OCCURRENCE count (not doc frequency) and surprisal in whole bits.
    * Output: (tk = md5(token), cnt, bits) — compact md5 keys only; the
    * string never leaves the map side. `bits` is relative to the corpus
    * total: floor(log2(total)) - floor(log2(cnt)) >= 0, with the most
    * frequent tokens near 0 bits. */
  def unigramModel(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = TfIdf.termFrequencies(df, idCol, textCol)
      .groupBy(md5(col("token")).as("tk"))
      .agg(sum(col("tf")).as("cnt"))
    // corpus total as a 1-row broadcast frame — lazy/composable, no
    // driver-side action (the distinctiveTerms nRow rule)
    val totalRow = counts.agg(sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(totalRow))
      .select(col("tk"), col("cnt"),
        (floorLog2(col("total")) - floorLog2(col("cnt"))).as("bits"))
  }

  /** `floor(log2(n))` for n >= 1 as an exact integer: the bit length of n
    * minus one, via the binary-string rendering both engines share
    * (`bin(5) = '101'` in Spark AND DuckDB — no float log2 whose boundary
    * rounding differs across libm builds). */
  private[graft] def floorLog2(n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (length(bin(n)) - 1).cast("long")

  /** Score `df` against a trained model (any corpus — self or reference).
    * Tokens ABSENT from the model (OOV) are charged `oovBits(model) =
    * floor(log2(total)) + 1` — one bit beyond the rarest in-model token,
    * the integer analogue of add-one smoothing.
    *
    * Output: (id, n_tokens, surprisal_bits, mean_bits_x100) —
    * n_tokens counts token OCCURRENCES, surprisal_bits = sum of per-token
    * bits over occurrences, mean_bits_x100 = surprisal_bits * 100 div
    * n_tokens (pure integer division, cross-engine exact). Null-text
    * documents report (0, 0, 0). Ids must be unique (checked anchor
    * raise_errors on duplicates — copies would silently merge token
    * streams). */
  def surprisalStats(df: DataFrame, idCol: String, textCol: String,
                     model: DataFrame): DataFrame = {
    val tfc = TfIdf.termFrequencies(df, idCol, textCol)
      .select(col("id"), md5(col("token")).as("tk"), col("tf"))
    // OOV charge derived from the model itself: 1-row broadcast of
    // max(bits) + 1 == floor(log2(total)) + 1 (cnt = 1 rows carry the max)
    val oovRow = model.agg((max(col("bits")) + 1L).as("oov_bits"))
    val scored = tfc
      .join(model.select(col("tk"), col("bits")), Seq("tk"), "left")
      .crossJoin(broadcast(oovRow))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * coalesce(col("bits"), col("oov_bits"))).as("surprisal_bits"))
    Dedup.checkedIdAnchor(df, idCol, "LanguageModel.surprisalStats")
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("surprisal_bits"), lit(0L)).as("surprisal_bits"),
        when(col("n_tokens") > 0,
          expr("surprisal_bits * 100 div n_tokens")).otherwise(lit(0L)).as("mean_bits_x100"))
  }

  /** Self-scored convenience: train on `df` and score `df` — the
    * single-corpus quality signal (no OOV possible: every token is in its
    * own model). The model frame feeds one join; Spark plans the
    * tokenize pass twice (once for the model aggregate, once for the
    * scoring frame) — on a large corpus train once, persist the compact
    * model, and call [[surprisalStats]] directly. */
  def selfSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame =
    surprisalStats(df, idCol, textCol, unigramModel(df, idCol, textCol))
}
