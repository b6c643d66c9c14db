package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-window document chunking: split each document into fixed-size
  * whitespace-token windows with overlap — the standard preprocessing step
  * between curation and sequence packing in an LLM data pipeline (a document
  * longer than the model context is cut into `maxTokens`-token windows whose
  * `overlap`-token prefix repeats the previous window's suffix, so no span of
  * text is ever split without context).
  *
  * Wholly column-expression (split → chunk-count arithmetic → posexplode over
  * a sequence of window indexes → slice → array_join): codegen'd and NARROW —
  * no shuffle, no UDF; a 100 TB corpus chunks inside the scan stage and the
  * output is ready for a downstream repartition/pack. Token = whitespace run
  * (the same convention as TextFunctions.tokenCount), exactly replayable in
  * SQL for the DuckDB oracle.
  */
object Chunking {

  /** One row per (doc, window): (idCol, chunk_idx, chunk_text, n_tokens).
    *
    * Window i covers tokens `[i*stride, i*stride + maxTokens)` with
    * `stride = maxTokens - overlap`; windows are generated while they add at
    * least one NEW token: `nChunks = 1 + ceil(max(0, n - maxTokens) / stride)`
    * — so the last window may be short but is never a pure suffix of its
    * predecessor. Documents with zero tokens (empty or all-whitespace text)
    * emit NO rows — the empty training window does not exist (documented
    * contract; filter upstream if empties must be observable).
    */
  def chunkDocs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxTokens: Int,
      overlap: Int
  ): DataFrame = {
    require(maxTokens > 0, s"maxTokens $maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap $overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val words = split(trim(col(textCol)), "\\s+")
    val n = size(words)
    // integer ceil((n - maxTokens) / stride) without overflow concerns: token
    // counts are bounded by the text length (an INT column)
    val extra = greatest(n - lit(maxTokens), lit(0))
    val nChunks = lit(1) + floor((extra + lit(stride - 1)).cast("double") / lit(stride.toDouble)).cast("int")
    df.select(col(idCol), words.as("w"), n.as("n"), nChunks.as("k"))
      .where(length(trim(col(textCol))) > 0) // zero-token docs emit no windows
      .select(col(idCol), col("w"), col("n"),
        posexplode(sequence(lit(0), col("k") - 1)).as(Seq("chunk_idx", "_c")))
      .select(
        col(idCol),
        col("chunk_idx"),
        array_join(slice(col("w"), col("chunk_idx") * stride + 1, lit(maxTokens)), " ").as("chunk_text"),
        least(col("n") - col("chunk_idx") * stride, lit(maxTokens)).as("n_tokens"))
  }

  /** DETERMINISTIC corpus shuffle for training-order randomization: every row
    * gets a pseudorandom 32-bit `pos` that is a pure function of
    * (id, seed) — rerun-, layout- and engine-invariant (unlike
    * `df.orderBy(rand(seed))`, whose draw depends on partitioning), so a
    * resumed or re-extracted shard lands in the SAME global order — and a
    * `shard` in [0, nShards) for bucketed writing. Sorting within each shard
    * by (pos, id) yields the training order; the shard assignment is a narrow
    * codegen'd map, and only the per-shard sort shuffles (by design — that IS
    * the shuffle being materialized).
    *
    * Hash: two multiply-fold-xor rounds built from the overflow-free Sampling
    * primitive (31-bit pre-fold keeps every product under 2^63 — ANSI-safe on
    * any BIGINT id). One Knuth round alone is a rotation on sequential ids
    * (structured within-shard order); the second round with an xor-shift in
    * between breaks the lattice. Exactly replayable in SQL (the twin must
    * spell pmod as ((x % m) + m) % m — SQL `%` is signed).
    */
  def shufflePosition(id: Column, seed: Long): Column =
    Sampling.saltedHash(id, seed)

  /** Adds (shard, pos) to `df`: shard = pos mod nShards, pos the shuffle
    * position. Write with `.repartition(nShards, col("shard"))` +
    * `.sortWithinPartitions("shard", "pos", idCol)` (or partitionBy on the
    * sink) for the materialized training order.
    */
  def deterministicShuffle(
      df: DataFrame,
      idCol: String,
      seed: Long,
      nShards: Int
  ): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    val pos = shufflePosition(col(idCol), seed)
    df.withColumn("pos", pos).withColumn("shard", pmod(col("pos"), lit(nShards.toLong)).cast("int"))
  }

  /** Sequence packing, the step after chunk+shuffle: lay the shard's chunks out
    * in training order and cut the concatenated token stream at fixed
    * `capacity`-token offsets — `seq_id = floor(tokens-before-this-chunk /
    * capacity)`, shard-local ("concat-then-split" packing; GPT-style pipelines
    * pack exactly this way before attention-mask sequence separation). A chunk
    * is assigned whole to the sequence its FIRST token falls in, so a sequence
    * holds at most `capacity + maxChunkTokens - 1` tokens — the documented
    * slack of boundary packing without chunk splitting; size `capacity` with
    * that headroom or pre-chunk at `maxTokens <=` the slack budget.
    *
    * Scale shape: ONE window cumsum partitioned by `shard` — each shard is a
    * bounded slice of the corpus (nShards chosen so a shard fits a task), so
    * there is no global sort and no unbounded partition; the only shuffle is
    * the hash exchange on `shard` that the materializing write needs anyway.
    * Deterministic because the order key (pos, id, ordCol) is total and every
    * component is a pure function of the data — a rerun or a resumed shard
    * packs identically. Exactly replayable in SQL as SUM(...) OVER (PARTITION
    * BY shard ORDER BY ... ROWS UNBOUNDED PRECEDING TO 1 PRECEDING).
    */
  def packSequences(
      chunks: DataFrame,
      idCol: String,
      ordCol: String,
      tokensCol: String,
      capacity: Int
  ): DataFrame = {
    require(capacity > 0, s"capacity $capacity must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("pos"), col(idCol), col(ordCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    chunks
      .withColumn("tokens_before", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("seq_id", (col("tokens_before") / lit(capacity.toLong)).cast("long"))
  }
}
