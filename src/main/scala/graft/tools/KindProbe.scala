package graft.tools

/** Diagnostic: single-threaded extractTurn cost per payload kind on the bench
  * corpus — attributes throughput to parse stages before optimizing. Usage:
  * KindProbe [transcriptsDir] [rows]
  */
object KindProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-scaling-r2/transcripts"
    val limit = if (args.length > 1) args(1).toInt else 100000
    val spark = graft.Bench.buildSession("8")
    import spark.implicits._
    val rows = spark.read.parquet(dir)
      .select("text", "tool").as[(String, String)].limit(limit).collect()
    spark.stop()
    val byKind = rows.groupBy { case (text, tool) =>
      if (tool == "pdf-b64" && text.length > 5000) "pdf-fixture"
      else if (tool == "pdf-b64") "pdf-mini" else tool
    }.map { case (k, rs) => k -> rs }
    byKind.toSeq.sortBy(_._1).foreach { case (kind, rs) =>
      // warm then measure
      for (round <- 0 until 2) {
        val t0 = System.nanoTime()
        var chars = 0L
        rs.foreach { case (text, tool) =>
          val e = graft.pipeline.ExtractJob.extractTurn(
            graft.pipeline.Turn("c", 0, "user", text, tool, null))
          if (e.extracted_text != null) chars += e.extracted_text.length
        }
        val sec = (System.nanoTime() - t0) / 1e9
        if (round == 1)
          println(f"$kind%8s rows=${rs.length}%7d sec=$sec%7.2f rows/s=${rs.length / sec}%9.0f share=${sec}%.2fs")
      }
    }
  }
}
