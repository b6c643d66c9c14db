package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.{ExtractJob, Turn}

/** Diagnostic: decompose pipeline wall time into scan / scan+extract (no shuffle) /
  * scan+shuffle+extract at a given parallelism. Usage: StageProbe <cpus>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val spark = graft.Bench.buildSession(cpus)
    import spark.implicits._
    def turns = spark.read.parquet("/tmp/graft-scaling/transcripts")
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts").as[Turn]

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"[$name] ${(System.nanoTime() - t0) / 1e9}%.2f s (cpus=$cpus)")
    }

    time("scan-only      ")(turns.agg(sum(length(col("text")))).head())
    time("scan+extract   ")(turns.mapPartitions(_.map(ExtractJob.extractTurn))
      .where(col("error").isNull).count())
    time("scan+shuf+extr ")(ExtractJob.extract(turns, cpus.toInt * 3)
      .where(col("error").isNull).count())
    spark.stop()
  }
}
