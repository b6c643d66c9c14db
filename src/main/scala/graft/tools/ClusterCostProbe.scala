package graft.tools

import org.apache.spark.sql.functions._

/** Dev diagnostic (r9): split q_dedup_clusters' cost into pair generation
  * vs the label-propagation loop, min-of-reps. Usage: ClusterCostProbe <sfDir>
  */
object ClusterCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    def trip = docs.union(docs.select(col("doc_id") + 10000, col("text")))
      .union(docs.select(col("doc_id") + 20000, col("text")))
    def pairs = graft.operators.Dedup.minhashNearDups(trip, "text", "doc_id",
      threshold = 0.999, maxBucket = 30000)
    // warm
    pairs.write.format("noop").mode("overwrite").save()
    graft.operators.Dedup.clusters(pairs).write.format("noop").mode("overwrite").save()
    val pr = (0 until 3).map { _ =>
      val t = System.nanoTime(); pairs.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    val cr = (0 until 3).map { _ =>
      val t = System.nanoTime()
      graft.operators.Dedup.clusters(pairs).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    println(f"PAIRS_MIN=${pr.min}%.2f reps=${pr.map(x => f"$x%.2f").mkString(",")}")
    println(f"FULL_MIN=${cr.min}%.2f reps=${cr.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
