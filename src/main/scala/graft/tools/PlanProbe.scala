package graft.tools
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession("32")
    val name = args(0); val dir = args(1)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(plan).length
    println(s"PLAN_EXCHANGES=$nEx")
    val t0 = System.nanoTime(); df.write.format("noop").mode("overwrite").save()
    println(f"WARM0=${(System.nanoTime()-t0)/1e9}%.2f")
    val reps = (0 until 4).map { _ =>
      val t1 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime()-t1)/1e9
    }
    println(f"TIMED_MIN=${reps.min}%.2f reps=${reps.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
