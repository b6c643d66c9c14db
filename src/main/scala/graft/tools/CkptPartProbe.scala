package graft.tools

import org.apache.spark.sql.functions._

/** Dev diagnostic (r9): does a LAZY localCheckpoint preserve the child's
  * HashPartitioning under AQE, so a downstream same-key aggregate plans no
  * exchange? Prints the plans for repartitioned-vs-not checkpoints.
  */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession("8")
    import spark.implicits._
    val df = (1 to 100000).toDF("x").withColumn("k", col("x") % 1000)
    val plain = df.localCheckpoint(eager = false)
    val parted = df.repartition(col("k")).localCheckpoint(eager = false)
    val partedEager = df.repartition(col("k")).localCheckpoint(eager = true)
    def exch(d: org.apache.spark.sql.DataFrame): Int = {
      val agg = d.groupBy("k").agg(sum(col("x")))
      agg.write.format("noop").mode("overwrite").save()
      val p = agg.queryExecution.executedPlan.toString
      "Exchange".r.findAllIn(p).length
    }
    println(s"PLAIN_EXCHANGES=${exch(plain)}")
    println(s"PARTED_LAZY_EXCHANGES=${exch(parted)}")
    println(s"PARTED_EAGER_EXCHANGES=${exch(partedEager)}")
    // compile the checkpointed subtree WITHOUT AQE so the LogicalRDD captures
    // the concrete HashPartitioning instead of AQE's UnknownPartitioning
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val partedNoAqe = df.repartition(col("k")).localCheckpoint(eager = false)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    println(s"PARTED_NOAQE_EXCHANGES=${exch(partedNoAqe)}")
    val joined = partedNoAqe.join(partedNoAqe.groupBy("k").agg(count(lit(1)).as("c")), "k")
    joined.write.format("noop").mode("overwrite").save()
    val jp = joined.queryExecution.executedPlan.toString
    println(s"JOIN_NOAQE_EXCHANGES=${"Exchange".r.findAllIn(jp).length}")
    spark.stop()
  }
}
