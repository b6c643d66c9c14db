package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics quality scoring: unigram SURPRISAL — the
  * perplexity-style rarity filter (C4/Gopher-family pipelines score documents
  * against a language model; the unigram model is its scale-correct first
  * rung, derivable from the corpus itself in one pass).
  *
  * All arithmetic is INTEGER so any engine reproduces it bit-for-bit: a
  * word's surprisal is the bit-length of the integer ratio N / c(w)
  * (`length(bin(N DIV c))` = floor(log2(N/c)) + 1 — both Spark and DuckDB
  * ship `bin`), i.e. rarer words contribute more bits; out-of-vocabulary
  * words cost `length(bin(N)) + 1` bits — one more than the rarest possible
  * in-vocab word. No floating-point log whose last-ulp could differ between
  * engines' libm.
  *
  * Scale shape: ONE shuffle on word for the vocabulary count (map-side
  * combined), a 1-row total + driver-bounded top-V `TakeOrderedAndProject`
  * (V+1 rows by construction — the same bounded-collect contract as IVF
  * centroids), the corpus side then BROADCAST-joins the tiny vocab (never
  * shuffles on word again), and the per-doc rollup shuffles on doc_id with
  * partial aggregation. A 100 TB corpus pays two map-side-combined shuffles
  * and no global sort.
  */
object Quality {

  /** Per-document surprisal report: (idCol, n_tokens, n_oov, surprisal_bits).
    *
    * Vocabulary = the top `vocabSize` words of `df` itself by occurrence count
    * (ties broken by word ascending — total order, so reruns and engines agree
    * on the boundary), counted over lowercased whitespace tokens. Documents
    * with zero tokens report (0, 0, 0) — kept, not dropped (a quality filter
    * must SEE the empty doc to reject it).
    */
  def unigramSurprisal(
      df: DataFrame,
      textCol: String,
      idCol: String,
      vocabSize: Int
  ): DataFrame = {
    require(vocabSize > 0, s"vocabSize $vocabSize must be positive")
    val words = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
    val counts = words.groupBy("word").agg(count(lit(1)).as("c"))
    // total BEFORE the top-V cut: N is the corpus token count, so OOV cost and
    // in-vocab bits stay comparable however small vocabSize is. Collected as a
    // SINGLE row (bounded by construction — the same driver-collect contract
    // as IVF centroids) and inlined as a literal: attaching a 1-row scalar via
    // crossJoin(broadcast(...)) plans as a BroadcastNestedLoopJoin, which the
    // engine bans outright rather than whitelisting benign shapes.
    val nTotal: Long = {
      val r = counts.agg(sum(col("c"))).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val oovBits = java.lang.Long.toBinaryString(nTotal).length.toLong + 1
    val vocab = counts
      .orderBy(col("c").desc, col("word").asc)
      .limit(vocabSize)
      .select(
        col("word"),
        length(bin(expr(s"CAST($nTotal AS BIGINT) DIV c"))).as("bits"))
    val docTokens = df
      .select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
    val scored = docTokens
      .join(broadcast(vocab), Seq("word"), "left")
      .select(
        col(idCol),
        coalesce(col("bits"), lit(oovBits)).as("tok_bits"),
        when(col("bits").isNull, 1L).otherwise(0L).as("is_oov"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("is_oov")).as("n_oov"),
        sum(col("tok_bits").cast("long")).as("surprisal_bits"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("surprisal_bits"), lit(0L)).as("surprisal_bits"))
  }
}
