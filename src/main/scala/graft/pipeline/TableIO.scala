package graft.pipeline

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

/** Storage abstraction for the north rule's Iceberg tables (SURVEY §1.2).
  *
  * The sandbox ships no iceberg-spark-runtime jar (zero egress), so the default
  * implementation is an Iceberg-shaped layout on Parquet: hive-partitioned shard
  * directories plus self-written per-shard manifests — which the checkpoint /
  * resume feature needs as first-class data anyway. An Iceberg-backed
  * implementation is the same trait wired to `spark.read.format("iceberg")` /
  * `df.writeTo(table).append()` with snapshot commits replacing directory
  * overwrites; every ExtractJob behavior (partitioning, manifests, resume,
  * lineage metrics) is expressed against this trait so swapping the backend is
  * a constructor argument, not a rewrite.
  */
trait TableIO {
  def readTurns(spark: SparkSession, path: String): Dataset[Turn]
  def writeShard(out: Dataset[ExtractedTurn], outDir: String, shard: Int): Unit
  def readOutput(spark: SparkSession, outDir: String): Dataset[ExtractedTurn]
  def appendManifests(spark: SparkSession, outDir: String, rows: Seq[PartManifest]): Unit
  def readManifests(spark: SparkSession, outDir: String): Dataset[PartManifest]
  def manifestsExist(outDir: String): Boolean
}

object ParquetTableIO extends TableIO {
  def readTurns(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts").as[Turn]
  }

  def writeShard(out: Dataset[ExtractedTurn], outDir: String, shard: Int): Unit =
    out.write.mode(SaveMode.Overwrite).parquet(s"$outDir/data/shard=$shard")

  def readOutput(spark: SparkSession, outDir: String): Dataset[ExtractedTurn] = {
    import spark.implicits._
    spark.read.parquet(s"$outDir/data")
      .select("conv_id", "turn_idx", "extracted_text", "spans", "payload_kind", "error")
      .as[ExtractedTurn]
  }

  def appendManifests(spark: SparkSession, outDir: String, rows: Seq[PartManifest]): Unit = {
    import spark.implicits._
    rows.toDS().write.mode(SaveMode.Append).parquet(s"$outDir/_manifests")
  }

  def readManifests(spark: SparkSession, outDir: String): Dataset[PartManifest] = {
    import spark.implicits._
    spark.read.parquet(s"$outDir/_manifests").as[PartManifest]
  }

  def manifestsExist(outDir: String): Boolean =
    new java.io.File(s"$outDir/_manifests").exists()
}
