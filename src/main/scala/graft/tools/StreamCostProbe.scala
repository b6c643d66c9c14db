package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (r9 optimization round): break q_stream_metrics-shaped cost into
  * phases — input parquet prep, max-ts agg, stream start->finish (with
  * per-batch durations from the progress log), final memory-table read — so
  * the streaming queries' fixed costs are attributed instead of guessed.
  * Usage: runMain graft.tools.StreamCostProbe [sfDir]
  */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val s = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"[probe] === rep $rep ===")
      val ev = s.read.parquet(s"$sfDir/events.parquet")
      val maxRealEpochS = phase("max-ts agg")(
        ev.agg(max(unix_timestamp(col("ts")))).head().getLong(0))
      val turns = ev.select(col("user_id").cast("string").as("conv_id"),
        col("event_id").cast("int").as("turn_idx"), lit("user").as("role"),
        col("event_type").as("text"), lit("plain").as("tool"), col("ts"))
      val sentinel = ev.limit(1).select(lit("sentinel").as("conv_id"),
        lit(-1).as("turn_idx"), lit("user").as("role"), lit("x").as("text"),
        lit("plain").as("tool"), to_timestamp(lit(maxRealEpochS + 100L * 86400)).as("ts"))
      val tmp = graft.Scratch.dir("probe-met-in")
      val cp = graft.Scratch.dir("probe-met-cp")
      val multiFile = sys.env.get("PROBE_MULTIFILE").contains("1")
      phase("input parquet write")(
        (if (multiFile) turns.union(sentinel).repartition(s.sparkContext.defaultParallelism)
         else turns.union(sentinel).coalesce(1)).write.mode("overwrite").parquet(tmp))
      sys.env.get("PROBE_STATE_PARTS").foreach(n => s.conf.set("spark.sql.shuffle.partitions", n))
      val stream = s.readStream
        .schema("conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP")
        .parquet(tmp).as[graft.pipeline.Turn](org.apache.spark.sql.Encoders.product[graft.pipeline.Turn])
      val name = s"probe_met_$rep"
      val q = phase("stream run") {
        val q = graft.streaming.StreamingExtract.windowedMetrics(stream, "1 minute", "10 minutes")
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        q
      }
      q.recentProgress.foreach { p =>
        println(s"[probe] batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durations=${p.durationMs} stateOps=${p.stateOperators.map(o =>
            s"(rowsTotal=${o.numRowsTotal} commit=${o.commitTimeMs}ms)").mkString}")
      }
      phase("memory table read + sort")(
        s.table(name)
          .select(unix_timestamp(col("window.start")).as("window_start_s"),
            col("payload_kind"), col("n_turns"),
            col("n_chars").cast("long").as("n_chars"),
            col("n_errors").cast("long").as("n_errors"))
          .orderBy("window_start_s")
          .write.format("noop").mode("overwrite").save())
    }
    s.stop()
  }
}
