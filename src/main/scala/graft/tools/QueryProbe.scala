package graft.tools

/** Diagnostic: interleaved min-of-reps timing for named SparkEntry queries on a
  * given SF dir (host noise can hit 3x, so reps are interleaved A/B/A/B rather
  * than batched — see BENCH.md measurement notes).
  * Usage: QueryProbe <sfDir> <reps> <queryName>...
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    // warm pass (JIT, footers, codegen)
    qs.foreach { case (_, fn) => fn(spark, dir).write.format("noop").mode("overwrite").save() }
    val times = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector.empty)
    (1 to reps).foreach { r =>
      qs.foreach { case (n, fn) =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        times(n) = times(n) :+ s
        println(f"[rep $r] $n%-24s $s%.2f s")
      }
    }
    names.foreach { n =>
      val ts = times(n)
      println(f"[min] $n%-24s min=${ts.min}%.2f s reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
