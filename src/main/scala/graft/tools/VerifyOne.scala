package graft.tools

import java.nio.file.{Files, Paths}

/** Dev pre-check: dump ONLY the named SparkEntry queries (plus their oracle
  * SQL) the way graft.Verify does for all of them — so a changed query can be
  * DuckDB-compared locally in seconds instead of re-running the full suite.
  * Mirrors Verify's per-query failure tolerance (one failing query still
  * dumps the rest AND oracle_sql.json) and shares its JSON escaper.
  * Usage: VerifyOne <sfDir> <outDir> <queryName>...
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.oracleDumpsEnabled = true // same contract as Verify
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, dir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      catch { case e: Throwable =>
        System.err.println(s"[verify-one] $n failed: ${e.getMessage}")
      }
    }
    val json = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${graft.Verify.q(k)}: ${graft.Verify.q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
