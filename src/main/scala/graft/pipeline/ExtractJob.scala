package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.html.HtmlBoilerplate

/** The extraction pipeline — SURVEY §2.10 stages P1-P9.
  *
  * Plan shape (one wide transformation, one narrow map, one write):
  *   scan -> filter -> Exchange hashpartitioning(conv_id, salt) ->
  *   MapPartitions(extractTurn) -> sortWithinPartitions -> write(+manifest)
  *
  * The salted repartition bounds any single conversation's share of a partition at
  * 1/SALT (north rule: "explicit salted repartitioning on conv_id to defeat
  * long-conversation skew"); per-turn extraction is row-independent so splitting a
  * conversation never affects correctness. Throughput then scales with cores because
  * post-shuffle partitions are uniform and extraction is CPU-bound.
  */
object ExtractJob {

  /** Salt fan-out: a 10^6-turn conversation spreads over SALT buckets. */
  val SALT = 64

  /** Per-row extraction. The reference panics on malformed input; here every parse
    * failure lands in the `error` column so one poison payload cannot kill a
    * 10^12-row job (the golden gate separately asserts zero errors on fixture rows).
    */
  def extractTurn(t: Turn): ExtractedTurn = {
    try {
      val (res, kind) = t.tool match {
        case "pdf-b64" =>
          val bytes = java.util.Base64.getDecoder.decode(t.text)
          (Pdf(bytes).extractResult(ExtractText), "pdf")
        case "html" =>
          (HtmlBoilerplate.extract(t.text), "html")
        case _ =>
          (ExtractResult(t.text, Vector(Span("plain", 0, t.text.length))), "plain")
      }
      ExtractedTurn(t.conv_id, t.turn_idx, res.text,
        res.spans.map(s => SpanRow(s.op, s.start, s.end)), kind, null)
    } catch {
      case e: PdfParseException =>
        ExtractedTurn(t.conv_id, t.turn_idx, null, Seq.empty, t.tool, e.getMessage)
      case scala.util.control.NonFatal(e) =>
        ExtractedTurn(t.conv_id, t.turn_idx, null, Seq.empty, t.tool,
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** P3: explicit salted repartition keyed (conv_id, salt). */
  def saltedRepartition(input: Dataset[Turn], partitions: Int): Dataset[Turn] =
    input.repartition(partitions, col("conv_id"),
      pmod(hash(col("conv_id"), col("turn_idx")), lit(SALT)))

  /** P3+P4: the extraction transform. mapPartitions (not a per-row udf) keeps
    * per-partition setup amortized and object churn off Catalyst's serializer path.
    */
  def extract(input: Dataset[Turn], partitions: Int): Dataset[ExtractedTurn] = {
    import input.sparkSession.implicits._
    saltedRepartition(input, partitions).mapPartitions(_.map(extractTurn))
  }

  /** P7: extraction-rate metrics as Spark accumulators (cluster-wide counters
    * that survive task retries' final accounting; complement the per-shard
    * manifest metrics).
    */
  final case class ExtractMetrics(
      rows: org.apache.spark.util.LongAccumulator,
      errors: org.apache.spark.util.LongAccumulator,
      chars: org.apache.spark.util.LongAccumulator)

  object ExtractMetrics {
    def register(spark: SparkSession): ExtractMetrics = ExtractMetrics(
      spark.sparkContext.longAccumulator("graft.extract.rows"),
      spark.sparkContext.longAccumulator("graft.extract.errors"),
      spark.sparkContext.longAccumulator("graft.extract.chars"))
  }

  /** extract() with live accumulator metrics. */
  def extractWithMetrics(input: Dataset[Turn], partitions: Int,
                         m: ExtractMetrics): Dataset[ExtractedTurn] = {
    import input.sparkSession.implicits._
    saltedRepartition(input, partitions).mapPartitions(_.map { t =>
      val e = extractTurn(t)
      m.rows.add(1)
      if (e.error != null) m.errors.add(1)
      else if (e.extracted_text != null) m.chars.add(e.extracted_text.length)
      e
    })
  }

  /** Narrow variant: extraction on the scan partitions, NO shuffle. Correct
    * whenever the source layout is already splittable-uniform (parquet row groups
    * split a long conversation across tasks by construction). At 100TB the salted
    * repartition (P3) is for sources whose layout clusters heavy conversations
    * (e.g. Iceberg bucketed by conv); when it isn't needed, skipping the exchange
    * removes the full-payload shuffle — the pipeline's only wide stage.
    */
  def extractNarrow(input: Dataset[Turn]): Dataset[ExtractedTurn] = {
    import input.sparkSession.implicits._
    input.mapPartitions(_.map(extractTurn))
  }

  /** P6: golden gate — byte-exact per-turn text equality. Returns diff rows
    * (empty => gate passes). Built from broadcastable joins only: an inner join for
    * value mismatches plus two anti-joins for missing/extra keys (a full-outer join
    * cannot broadcast its build side, so this shape keeps the small golden table off
    * the shuffle path).
    */
  def goldenDiff(extracted: Dataset[ExtractedTurn], golden: Dataset[Golden]): DataFrame = {
    val e = extracted.toDF()
    val g = golden.toDF()
    val keys = Seq("conv_id", "turn_idx")
    val keyCols = keys.map(col)
    val mismatches = e.join(broadcast(g), keys)
      .where(col("error").isNotNull ||
        (col("gate").isin("exact", "snapshot") && !(col("extracted_text") <=> col("expected_text"))))
      .select(keyCols :+ lit("mismatch").as("reason"): _*)
    val missing = g.join(broadcast(e.select(keyCols: _*)), keys, "left_anti")
      .select(keyCols :+ lit("missing").as("reason"): _*)
    val extra = e.join(broadcast(g.select(keyCols: _*)), keys, "left_anti")
      .select(keyCols :+ lit("extra").as("reason"): _*)
    mismatches.union(missing).union(extra)
  }

  // ----- P8: checkpoint manifests + resume ---------------------------------------

  /** Output layout: `outDir/data/shard=<k>/...parquet` + `outDir/_manifests`.
    * A shard is the resume unit: an idempotent overwrite of one directory followed
    * by a manifest append. A failed run leaves completed shards' manifests in place;
    * `runWithManifests` anti-joins them away on rerun, so the final table equals an
    * uninterrupted run and per-shard extraction-rate metrics survive.
    */
  def shardCol: org.apache.spark.sql.Column = pmod(hash(col("conv_id")), lit(SALT))

  /** Storage backend (SURVEY §1.2): Parquet+manifests here; Iceberg on clusters
    * that ship the runtime jar (see TableIO).
    */
  val io: TableIO = ParquetTableIO

  def completedShards(spark: SparkSession, outDir: String): Set[Int] = {
    if (!io.manifestsExist(outDir)) Set.empty
    else {
      import spark.implicits._
      io.readManifests(spark, outDir)
        .filter(_.status == "done").map(_.part_id).collect().toSet
    }
  }

  /** Run extraction with per-shard checkpoint manifests. `shards` counts resume
    * units; `partitions` is the shuffle width per shard. `failAtShard` injects a
    * crash after N committed shards (resume tests).
    */
  def runWithManifests(
      spark: SparkSession,
      input: Dataset[Turn],
      outDir: String,
      shards: Int,
      partitions: Int,
      failAtShard: Int = -1
  ): Unit = {
    import spark.implicits._
    val done = completedShards(spark, outDir)
    val withShard = input.withColumn("__shard", pmod(hash(col("conv_id")), lit(shards)))
    var committed = done.size
    (0 until shards).filterNot(done).foreach { k =>
      if (failAtShard >= 0 && committed >= failAtShard)
        throw new RuntimeException(s"injected failure after $committed shards")
      val t0 = System.nanoTime()
      val shardInput = withShard.where(col("__shard") === k).drop("__shard").as[Turn]
      val out = extract(shardInput, partitions)
        .sortWithinPartitions("conv_id", "turn_idx") // P5 (prod-scale ordering)
      io.writeShard(out, outDir, k)
      val stats = spark.read.parquet(s"$outDir/data/shard=$k")
        .agg(count(lit(1)), coalesce(sum(length(col("extracted_text"))), lit(0L)))
        .head()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      io.appendManifests(spark, outDir,
        Seq(PartManifest(k, SALT, stats.getLong(0), stats.getLong(1), wallMs, "done")))
      committed += 1
    }
  }

  def readOutput(spark: SparkSession, outDir: String): Dataset[ExtractedTurn] =
    io.readOutput(spark, outDir)

  def manifests(spark: SparkSession, outDir: String): Dataset[PartManifest] =
    io.readManifests(spark, outDir)
}
