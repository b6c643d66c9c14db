package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (r9): attribute q_tokenize_bpe's cost across its stages —
  * bpeTrain (word-count collect + driver Sennrich loop), the base-alphabet
  * collect, applyBpe, the vocab-guarded broadcast tokenization, and the
  * shuffle+pack tail. Usage: runMain graft.tools.BpeCostProbe [sfDir]
  */
object BpeCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val s = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import s.implicits._
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"[probe] === rep $rep ===")
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
      val mergesDf = phase("bpeTrain")(
        graft.operators.Quality.bpeTrain(docs, "text", nMerges = 24))
      val mergeRows = phase("merge collect")(mergesDf.orderBy("merge_idx").collect())
      val mergeList = mergeRows.map(r => (r.getString(1), r.getString(2))).toSeq
      val baseChars = phase("baseChars collect")(
        docs.select(explode(split(lower(trim($"text")), "\\s+")).as("w"))
          .where(length($"w") > 0)
          .select(explode(transform(sequence(lit(1), length($"w")),
            i => $"w".substr(i, lit(1)))).as("c"))
          .distinct().as[String].collect())
      val nBase = baseChars.length
      val vocab = (baseChars.sorted.zipWithIndex.toSeq ++
        (0 until 70000).map(i => (f"sub_$i%06d", i + nBase + 20))).toDF("word", "tid")
      val toks = graft.operators.Quality.applyBpe(docs, "text", "doc_id", mergeList)
      phase("applyBpe noop")(
        toks.write.format("noop").mode("overwrite").save())
      val toks2 = graft.operators.Quality.applyBpe(docs, "text", "doc_id", mergeList)
        .localCheckpoint(eager = false)
      val ids = phase("tokenizeWithVocabTable build (incl. 2 guard jobs)")(
        graft.operators.Quality.tokenizeWithVocabTable(
          toks2, "doc_id", $"subwords", vocab, oovId = 999999))
      phase("tokenize noop")(
        ids.write.format("noop").mode("overwrite").save())
      val sharded = graft.operators.Chunking.deterministicShuffle(
        ids.withColumn("token_ids_s", lit("")), "doc_id", seed = 7L, nShards = 8)
        .withColumn("chunk_idx", lit(0))
      phase("pack noop")(
        graft.operators.Chunking.packSequences(sharded, "doc_id", "chunk_idx",
          "n_tokens", capacity = 256)
          .write.format("noop").mode("overwrite").save())
    }
    s.stop()
  }
}
