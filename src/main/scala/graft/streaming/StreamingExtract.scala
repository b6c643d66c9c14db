package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.pipeline.{ExtractJob, ExtractedTurn, Turn}

/** Structured Streaming face of the extraction pipeline: incremental transcript
  * ingest with exactly the same per-turn semantics as the batch job (the
  * extraction function is shared, so batch/stream parity is by construction).
  *
  * The reference is a batch CLI and the north rule specifies a batch backfill
  * (SURVEY §2.11), so this is an engine addition for continuous ingest: new turns
  * stream in, extracted rows stream out, plus a watermarked per-conversation
  * windowed metric stream (late turns beyond the watermark are dropped).
  */
object StreamingExtract {

  /** Per-turn extraction over any streaming Dataset[Turn] — a stateless map, so
    * it composes with every sink/trigger and never needs state-store tuning.
    */
  def extractStream(turns: Dataset[Turn]): Dataset[ExtractedTurn] = {
    import turns.sparkSession.implicits._
    turns.mapPartitions(_.map(ExtractJob.extractTurn))
  }

  /** Watermarked tumbling-window extraction-rate metrics per payload kind:
    * (window, payload_kind) -> turns, chars, errors. The watermark bounds the
    * aggregation state; late turns beyond it are dropped (documented lateness
    * policy). Extraction runs inline so ts flows with the metric row.
    */
  def windowedMetrics(turns: Dataset[Turn], windowLen: String = "1 minute",
                      watermark: String = "10 minutes"): DataFrame = {
    import turns.sparkSession.implicits._
    val enriched = turns.map { t =>
      val e = ExtractJob.extractTurn(t)
      (t.ts, e.payload_kind,
        if (e.extracted_text == null) 0 else e.extracted_text.length,
        if (e.error == null) 0 else 1)
    }.toDF("ts", "payload_kind", "n_chars", "is_err")
    enriched
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("payload_kind"))
      .agg(count(lit(1)).as("n_turns"), sum(col("n_chars")).as("n_chars"),
        sum(col("is_err")).as("n_errors"))
  }

  /** File-based continuous ingest: watch `inDir` for new transcript parquet,
    * write extracted parquet to `outDir` with checkpointed exactly-once progress.
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
          checkpoint: String): StreamingQuery = {
    import spark.implicits._
    val turns = spark.readStream
      .schema("conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP")
      .parquet(inDir)
      .as[Turn]
    extractStream(turns).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
