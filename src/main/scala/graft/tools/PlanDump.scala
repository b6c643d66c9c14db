package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dump `explain("formatted")` for named SparkEntry queries to
  * plans/<dir>/<name>_<suffix>.txt. Usage: PlanDump <sfDir> <outDir> <suffix> <query>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
