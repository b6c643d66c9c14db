package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestSession

/** Regression gate for the q_curation_v4 funnel's treatment of docs WITHOUT
  * an embedding row (r9 find): semDedup only sees classifier survivors that
  * have a vector, so a doc with no embedding cannot be semantically deduped
  * and must pass the stage untouched — the DuckDB twin's
  * `LEFT JOIN pp ... WHERE pp.nn IS NULL` rule. The pre-fix inner join on the
  * KEPT side silently dropped every embedding-less doc: invisible at
  * sf0.001/sf0.01 (embeddings cover all doc_ids there) but 4x the funnel at
  * sf0.1, where only 2000 of 5000 docs carry vectors. This spec plants the
  * uncovered-doc shape directly so the semantics can never regress silently
  * again.
  */
class QueryFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q_curation_v4: embedding-less docs bypass semDedup; planted dup still drops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString

    // The query's own classifier weight table (SparkEntry builds the same
    // spec); used here only to PICK texts the classifier keeps, so the
    // assertions below are about the funnel topology, not classifier luck.
    val weights = spark.range(4096).select($"id".cast("int").as("bucket"),
      (($"id" * 2654435761L) % 4097L - 2048L).as("w_milli"))
    val pool = (0 until 120).map(i => (i.toLong, s"w$i common text body number $i end"))
    val poolKept = graft.operators.Quality.classifierScore(
        pool.toDF("doc_id", "text"), "text", "doc_id", weights,
        dim = 4096, biasMilli = 100L)
      .where($"keep").select($"doc_id").as[Long].collect().toSet
    val texts = pool.filter(p => poolKept(p._1)).map(_._2).take(30)
    assert(texts.size == 30, "candidate pool must yield 30 classifier-kept texts")

    // 30 docs; en is deliberately rare (ids 0, 8, 9) so epochs_en >= 1 and
    // every surviving en doc provably lands in the output at least once.
    def lang(i: Int): String =
      if (i == 0 || i == 8 || i == 9) "en" else if (i % 2 == 1) "zh" else "de"
    val docs = (0 until 30).map(i => (i.toLong, texts(i), lang(i), "test", texts(i).length.toLong))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // Embeddings cover ONLY ids 0..8 — doc 9 (en, classifier-kept) has no
    // vector. Vec 8 is an exact copy of vec 0 (cosine 1 > tau), so doc 8 is
    // the planted semantic duplicate that must drop under the min-id rule.
    def vec(i: Int): Array[Float] =
      if (i == 8) vec(0)
      else Array((i + 1).toFloat, ((i * 7) % 5).toFloat, ((i * 3) % 4).toFloat,
        1f, 0.5f * i, ((i * 5) % 7).toFloat)
    (0 until 9).map(i => (i.toLong, vec(i), i)).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("q_curation_v4")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet

    // Embedding-less docs bypass semDedup: doc 9 and its +10000 union copy
    // (also vector-less — emb2's union only covers 0..8/10000..10008) survive.
    assert(out.contains(9L), "embedding-less classifier-kept en doc must survive the funnel")
    assert(out.contains(10009L), "union-side embedding-less doc must survive the funnel")
    // The planted duplicate still drops — the fix must not weaken semDedup:
    // vec 8 == vec 0, and every +10000 union vector is an exact copy of its
    // base, so 8, 10000 and 10008 all sit at cosine 1 below base id 0.
    assert(!out.contains(8L), "planted exact-duplicate doc must be semDeduped")
    assert(!out.contains(10000L), "union copy of doc 0's vector must be semDeduped")
    assert(!out.contains(10008L), "union copy of the planted dup must be semDeduped")
    // The global-min exemplar is always kept.
    assert(out.contains(0L), "min-id exemplar must be kept")
  }
}
