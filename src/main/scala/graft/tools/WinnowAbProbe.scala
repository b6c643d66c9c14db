package graft.tools

import org.apache.spark.sql.functions._

/** Dev A/B (r9): winnowNearDups with the fp-clustered checkpoint (current
  * code) vs the pre-r9 plain-checkpoint shape replicated inline — same
  * session, interleaved reps, structural job/stage/task counts.
  * Usage: WinnowAbProbe <sfDir>
  */
object WinnowAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    def docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    def planted = docs.union(docs.select(col("doc_id") + 10000,
      concat(col("text"), lit(" "), col("text")).as("text")))

    def pairArray(ids: org.apache.spark.sql.Column) =
      flatten(transform(ids, (a, i) =>
        transform(slice(ids, i + lit(2), size(ids)), b => struct(a.as("_1"), b.as("_2")))))

    // pre-r9 shape: plain lazy checkpoint, dfc/rare each shuffle fps by fp
    def oldWinnow(): org.apache.spark.sql.DataFrame = {
      val k = 8; val w = 4; val maxDf = 50; val minOverlap = 0.9
      val fps = planted.select(col("doc_id").cast("long").as("id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, t) =>
          graft.functions.TextFunctions.winnowFingerprints(t, k, w).map((id, _)) }
        .toDF("id", "fp")
        .localCheckpoint(eager = false)
      val dfc = fps.groupBy("fp").agg(count(lit(1)).as("dfreq"))
        .where(col("dfreq") <= maxDf)
      val rare = fps.join(dfc.select("fp"), "fp")
      val cnt = rare.groupBy("id").agg(count(lit(1)).as("nfp"))
      val pairs = rare.groupBy("fp").agg(sort_array(collect_list(col("id"))).as("ids"))
        .where(size(col("ids")) > 1)
        .select(explode(pairArray(col("ids"))).as("p"))
        .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      val shared = pairs.groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      shared
        .join(cnt.select(col("id").as("id_a"), col("nfp").as("nfp_a")), "id_a")
        .join(cnt.select(col("id").as("id_b"), col("nfp").as("nfp_b")), "id_b")
        .withColumn("overlap",
          col("n_shared").cast("double") / least(col("nfp_a"), col("nfp_b")).cast("double"))
        .where(col("overlap") >= minOverlap)
        .select("id_a", "id_b", "n_shared", "overlap")
    }
    def newWinnow(): org.apache.spark.sql.DataFrame =
      graft.operators.Dedup.winnowNearDups(planted, "text", "doc_id",
        k = 8, w = 4, maxDf = 50, minOverlap = 0.9)

    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    noop(oldWinnow()); noop(newWinnow()) // warm

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
    def counted(name: String)(f: => Unit): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      spark.sparkContext.addSparkListener(l)
      f; Thread.sleep(2000)
      spark.sparkContext.removeSparkListener(l)
      println(s"$name JOBS=${jobs.get} STAGES=${stages.get} TASKS=${tasks.get}")
    }
    counted("OLD")(noop(oldWinnow()))
    counted("NEW")(noop(newWinnow()))
    val or = (0 until 3).map { _ =>
      val t = System.nanoTime(); noop(oldWinnow()); (System.nanoTime() - t) / 1e9 }
    val nr = (0 until 3).map { _ =>
      val t = System.nanoTime(); noop(newWinnow()); (System.nanoTime() - t) / 1e9 }
    println(f"OLD_MIN=${or.min}%.2f reps=${or.map(x => f"$x%.2f").mkString(",")}")
    println(f"NEW_MIN=${nr.min}%.2f reps=${nr.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
