package graft.tools

import org.apache.spark.sql.functions._

/** Dev A/B (r9): gopherRepetition single-exchange rework (current code) vs
  * the pre-rework shape (separate (doc,k,gram) count branch + two window
  * exchanges) replicated inline — same session, interleaved reps.
  * Usage: GopherAbProbe <sfDir>
  */
object GopherAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import org.apache.spark.sql.expressions.Window
    def docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    def planted = docs.union(docs.select(col("doc_id") + 10000,
      concat(col("text"), lit(" "), col("text")).as("text")))

    def oldGopher(): org.apache.spark.sql.DataFrame = {
      val df = planted; val idCol = "doc_id"; val textCol = "text"
      val toks = filter(split(lower(trim(col(textCol))), "\\s+"), w => length(w) > 0)
      val base = df.select(col(idCol), toks.as("w")).withColumn("m", size(col("w")))
      def gram(k: Int) = when(col("pos") <= col("m") - k,
        array_join(slice(col("w"), col("pos") + 1, lit(k)), " ")).as(s"g$k")
      val ex = base
        .select(col(idCol), col("w"), col("m"), posexplode(col("w")).as(Seq("pos", "tk")))
        .select(col(idCol), col("pos"), length(col("tk")).as("l"), gram(2), gram(3), gram(5))
      val counts23 = ex
        .select(col(idCol), explode(array(
          struct(lit(2).as("k"), col("g2").as("gram")),
          struct(lit(3).as("k"), col("g3").as("gram")))).as("kg"))
        .where(col("kg.gram").isNotNull)
        .groupBy(col(idCol), col("kg.k").as("k"), col("kg.gram").as("gram"))
        .agg(count(lit(1)).as("c"))
      val topWide = counts23.where(col("c") >= 2)
        .groupBy(col(idCol), col("k"))
        .agg(min(struct((-col("c")).as("nc"), col("gram").as("g"))).as("t"))
        .groupBy(col(idCol))
        .agg(
          max(when(col("k") === 2, -col("t.nc"))).cast("int").as("top2_count"),
          max(when(col("k") === 2, -col("t.nc") * length(col("t.g")))).cast("int").as("top2_chars"),
          max(when(col("k") === 3, -col("t.nc"))).cast("int").as("top3_count"),
          max(when(col("k") === 3, -col("t.nc") * length(col("t.g")))).cast("int").as("top3_chars"))
      val dupStart = col("g5").isNotNull &&
        (count(lit(1)).over(Window.partitionBy(col(idCol), col("g5"))) >= 2)
      val covWin = Window.partitionBy(col(idCol)).orderBy(col("pos")).rangeBetween(-4, 0)
      val perDoc = ex
        .withColumn("dup5start", dupStart)
        .withColumn("cov", max(when(col("dup5start"), 1).otherwise(0)).over(covWin))
        .groupBy(col(idCol))
        .agg(
          sum(col("l")).cast("int").as("n_chars_tok"),
          sum(when(col("cov") === 1, col("l")).otherwise(lit(0))).cast("int").as("dup5_chars"))
      df.select(col(idCol))
        .join(perDoc, Seq(idCol), "left")
        .join(topWide, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("n_chars_tok"), lit(0)).as("n_chars_tok"),
          coalesce(col("top2_count"), lit(0)).as("top2_count"),
          coalesce(col("top2_chars"), lit(0)).as("top2_chars"),
          coalesce(col("top3_count"), lit(0)).as("top3_count"),
          coalesce(col("top3_chars"), lit(0)).as("top3_chars"),
          coalesce(col("dup5_chars"), lit(0)).as("dup5_chars"))
    }
    def newGopher(): org.apache.spark.sql.DataFrame =
      graft.operators.Quality.gopherRepetition(planted, "text", "doc_id")

    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    noop(oldGopher()); noop(newGopher()) // warm
    val reps = 5
    val or = collection.mutable.ArrayBuffer[Double]()
    val nr = collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { _ =>
      var t = System.nanoTime(); noop(oldGopher()); or += (System.nanoTime() - t) / 1e9
      t = System.nanoTime(); noop(newGopher()); nr += (System.nanoTime() - t) / 1e9
    }
    println(f"OLD_MIN=${or.min}%.2f reps=${or.map(x => f"$x%.2f").mkString(",")}")
    println(f"NEW_MIN=${nr.min}%.2f reps=${nr.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
