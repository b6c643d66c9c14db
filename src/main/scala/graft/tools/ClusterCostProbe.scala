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
    // structural (noise-free): jobs + completed stages for ONE clusters run
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(e.stageInfo.numTasks)
      }
    }
    spark.sparkContext.addSparkListener(l)
    graft.operators.Dedup.clusters(pairs).write.format("noop").mode("overwrite").save()
    Thread.sleep(2000) // let the listener bus drain
    spark.sparkContext.removeSparkListener(l)
    println(s"CLUSTERS_JOBS=${jobs.get} STAGES=${stages.get} TASKS=${tasks.get}")
    // A/B baseline: the PRE-r9 loop shape (plain lazy localCheckpoints, no
    // partitioning awareness) replicated inline so both variants run in the
    // same session/window — structural counts are the comparison, not wall.
    def oldClusters(p: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      def ck(d: org.apache.spark.sql.DataFrame) = d.localCheckpoint(eager = false)
      val e0 = p.select(col(p.columns(0)).cast("long").as("src"),
        col(p.columns(1)).cast("long").as("dst"))
      val edges = ck(e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct())
      var labels = ck(edges.select(col("src").as("id")).distinct().withColumn("label", col("id")))
      var iter = 0; var converged = false
      while (iter < 20 && !converged) {
        val nbrMin = edges
          .join(labels.select(col("id").as("dst"), col("label").as("dlabel")), "dst")
          .groupBy(col("src")).agg(min(col("dlabel")).as("nlabel"))
          .select(col("src").as("id"), col("nlabel"))
        val prop = ck(labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("label").as("__old"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label")))
        val jumped = ck(prop
          .join(prop.select(col("id").as("jid"), col("label").as("jlabel")),
            prop("label") === col("jid"), "left")
          .select(col("id"), col("__old"), coalesce(col("jlabel"), col("label")).as("label")))
        converged = jumped.where(col("label") =!= col("__old")).isEmpty
        labels = jumped.drop("__old")
        iter += 1
      }
      labels.select(col("id"), col("label").as("cluster_id"))
    }
    oldClusters(pairs).write.format("noop").mode("overwrite").save() // warm
    jobs.set(0); stages.set(0); tasks.set(0)
    spark.sparkContext.addSparkListener(l)
    oldClusters(pairs).write.format("noop").mode("overwrite").save()
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(l)
    println(s"OLD_CLUSTERS_JOBS=${jobs.get} STAGES=${stages.get} TASKS=${tasks.get}")
    val or = (0 until 3).map { _ =>
      val t = System.nanoTime()
      oldClusters(pairs).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    val nr = (0 until 3).map { _ =>
      val t = System.nanoTime()
      graft.operators.Dedup.clusters(pairs).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    println(f"OLD_FULL_MIN=${or.min}%.2f reps=${or.map(x => f"$x%.2f").mkString(",")}")
    println(f"NEW_FULL_MIN=${nr.min}%.2f reps=${nr.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
