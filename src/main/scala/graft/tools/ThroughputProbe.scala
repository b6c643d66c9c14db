package graft.tools

import java.util.concurrent.atomic.AtomicInteger

/** Diagnostic: measures raw extractor scaling across thread counts with no Spark
  * involved — isolates JVM/parse scaling from Spark plumbing. Not part of the
  * pipeline; used to attribute scaling-bench bottlenecks.
  */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-scaling/transcripts"
    val spark = graft.Bench.buildSession("8")
    import spark.implicits._
    val rows = spark.read.parquet(dir)
      .select("text", "tool").as[(String, String)].limit(200000).collect()
    spark.stop()
    println(s"loaded ${rows.length} payloads")

    for (threads <- Seq(1, 8, 32)) {
      // warm + measure
      for (round <- 0 until 2) {
        val idx = new AtomicInteger(0)
        val t0 = System.nanoTime()
        val ts = (0 until threads).map { _ =>
          new Thread(() => {
            var i = idx.getAndIncrement()
            while (i < rows.length) {
              val (text, tool) = rows(i)
              val turn = graft.pipeline.Turn("c", 0, "user", text, tool, null)
              graft.pipeline.ExtractJob.extractTurn(turn)
              i = idx.getAndIncrement()
            }
          })
        }
        ts.foreach(_.start())
        ts.foreach(_.join())
        val sec = (System.nanoTime() - t0) / 1e9
        if (round == 1)
          println(f"threads=$threads%2d sec=$sec%.2f rows/s=${rows.length / sec}%.0f")
      }
    }
  }
}
