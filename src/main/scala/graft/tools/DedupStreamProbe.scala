package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.Turn

/** Debug probe for the streaming dedup file-source path. */
object DedupStreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession("4")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dsp-in").toString
    val cp = java.nio.file.Files.createTempDirectory("dsp-cp").toString
    (0 until 10).flatMap(i => Seq(
      Turn(i.toString, 0, "user", s"text $i", "plain", new java.sql.Timestamp(0L)),
      Turn((i + 100).toString, 0, "user", s"text $i", "plain", new java.sql.Timestamp(0L))))
      .toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema("conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP")
      .parquet(tmp).as[Turn]
    val q = graft.streaming.StreamingExtract.dedupStream(stream)
      .writeStream.format("memory").queryName("dsp_out")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    println("rows=" + spark.table("dsp_out").count())
    println(q.lastProgress)
    spark.stop()
  }
}
