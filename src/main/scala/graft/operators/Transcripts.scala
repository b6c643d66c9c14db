package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-to-training-document rendering — the step between transcript
  * extraction and tokenization in an SFT pipeline: multi-turn conversations
  * become one rendered document per conversation under a fixed chat
  * template, with the per-turn CHARACTER-OFFSET + LOSS-MASK sidecar every
  * fine-tuning dataloader needs (loss computes on assistant turns only; the
  * mask must align with the rendered text to the character, or training
  * silently learns on prompts).
  *
  * Template (fixed, deliberately simple): each turn renders as
  * `<|role|>\n` + text + `\n`, concatenated in `turn_idx` order. The
  * template is a pure column expression, so offsets derive from the SAME
  * expression that renders — misalignment is structurally excluded.
  *
  * Scale shape: rendering is a groupBy on the conversation id with an
  * ordered in-group reassembly (sort_array over structs — conv-bounded, the
  * long-conversation skew bound is the input contract's, same as the
  * extraction pipeline's salted repartition handles); offsets are ONE
  * cumulative window per conversation (bounded by the conversation's own
  * turn count, never corpus-wide). No UDF anywhere.
  */
object Transcripts {

  /** The fixed chat template for one turn. */
  def renderTurn(role: Column, text: Column): Column =
    concat(lit("<|"), role, lit("|>\n"), text, lit("\n"))

  /** One rendered training document per conversation: (convCol, doc). */
  def renderDocs(
      df: DataFrame,
      convCol: String,
      idxCol: String,
      roleCol: String,
      textCol: String
  ): DataFrame =
    df.select(col(convCol), col(idxCol).as("_idx"),
        renderTurn(col(roleCol), col(textCol)).as("_seg"))
      .groupBy(col(convCol))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("_idx"), col("_seg")))),
        x => x.getField("_seg")), "").as("doc"))

  /** Per-turn offset/loss-mask sidecar over the SAME template: one row per
    * turn with (convCol, idxCol, roleCol, char_start, char_end, mask) —
    * [char_start, char_end) is the turn's rendered span inside the
    * conversation's document, mask = true for every non-assistant turn
    * (excluded from the loss).
    */
  def turnOffsets(
      df: DataFrame,
      convCol: String,
      idxCol: String,
      roleCol: String,
      textCol: String
  ): DataFrame = {
    val seg = renderTurn(col(roleCol), col(textCol))
    // order ties on a duplicate turn_idx by the rendered segment itself —
    // the SAME total order renderDocs' sort_array(struct(idx, seg)) uses,
    // so the sidecar can never disagree with the document on tie layout
    // (a window ordered by idx alone would leave tied rows in
    // partition-dependent order — rerun-nondeterministic offsets)
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol), col("_seg"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(convCol), col(idxCol), col(roleCol),
        seg.as("_seg"), length(seg).cast("long").as("_len"))
      .withColumn("char_start", coalesce(sum(col("_len")).over(w), lit(0L)))
      .select(col(convCol), col(idxCol), col(roleCol),
        col("char_start"),
        (col("char_start") + col("_len")).as("char_end"),
        (col(roleCol) =!= "assistant").as("mask"))
  }
}
