package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file COMPACTION for the extraction output (engine addition — the
  * maintenance job every long-lived 100TB table needs). Wave-based runs,
  * resume-after-crash reruns, and streaming ingest all accrete small parquet
  * files per shard partition; a scan then pays per-file open/footer cost and
  * the scheduler per-split overhead. Compaction rewrites `outDir/data` with
  * bounded file sizes and IDENTICAL data.
  *
  * Shape: one shuffle keyed on (shard, conv-hash bucket) sized from the
  * table's actual bytes — each shard gets ceil(shardBytes / targetBytes)
  * output buckets, so a hot shard splits into right-sized files while cold
  * shards coalesce into one. Total tasks = total target files: the rewrite
  * is a single pass at cluster width, never a per-file loop.
  *
  * Swap protocol (no self-overwrite — Spark cannot overwrite a path it is
  * reading): write to `.data_compacting`, then data -> `.data_old`,
  * compacted -> `data`, drop `.data_old`. A crash leaves either the original
  * intact (before the first rename — rerun cleans the temp) or both dirs
  * present (`.data_old` + renamed `data`) — never zero copies; recovery is
  * documented in the error message of the guard below.
  */
object Compaction {

  final case class CompactionReport(filesBefore: Long, filesAfter: Long,
                                    rows: Long, targetBytes: Long)

  def compactOutput(spark: SparkSession, outDir: String,
                    targetBytes: Long = 128L * 1024 * 1024): CompactionReport = {
    require(targetBytes >= 1024 * 1024, s"targetBytes=$targetBytes below 1MB makes files smaller, not larger")
    val dataPath = new Path(s"$outDir/data")
    val fs = dataPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldPath = new Path(s"$outDir/.data_old")
    val tmpPath = new Path(s"$outDir/.data_compacting")
    if (fs.exists(oldPath))
      throw new IllegalStateException(
        s"$oldPath exists — a previous compaction crashed mid-swap. Recover by " +
          s"keeping exactly one of $oldPath / $dataPath as data (both hold a full copy) " +
          "and deleting the other, then rerun.")
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true): Unit // stale temp from a pre-swap crash

    def countFiles(p: Path): Long = {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val filesBefore = countFiles(dataPath)
    // per-shard byte sizes from the FILES (ground truth at rest, no scan)
    val shardBytes: Map[Int, Long] = {
      val it = fs.listFiles(dataPath, true)
      val m = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) {
          val parent = st.getPath.getParent.getName
          if (parent.startsWith("shard=")) m(parent.stripPrefix("shard=").toInt) += st.getLen
        }
      }
      m.toMap
    }
    val buckets: Map[Int, Int] =
      shardBytes.map { case (s, b) => s -> math.max(1, ((b + targetBytes - 1) / targetBytes).toInt) }
    val totalBuckets = math.max(1, buckets.values.sum)
    val bucketsExpr = buckets.toSeq.sortBy(_._1)
      .foldLeft(lit(1)) { case (acc, (s, n)) => when(col("shard") === s, n).otherwise(acc) }

    val df = spark.read.parquet(s"$outDir/data")
    val rows = df
      .withColumn("__b", pmod(hash(col("conv_id")), bucketsExpr))
      .repartition(totalBuckets, col("shard"), col("__b"))
      .drop("__b")
    rows.write.mode("overwrite").partitionBy("shard").parquet(tmpPath.toString)
    val nRows = spark.read.parquet(tmpPath.toString).count()

    if (!fs.rename(dataPath, oldPath))
      throw new IllegalStateException(s"compaction: could not stage $dataPath aside")
    if (!fs.rename(tmpPath, dataPath)) {
      fs.rename(oldPath, dataPath) // roll back; original copy is intact
      throw new IllegalStateException(s"compaction: could not install compacted data; rolled back")
    }
    fs.delete(oldPath, true)
    CompactionReport(filesBefore, countFiles(dataPath), nRows, targetBytes)
  }
}
