package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestSession

/** Invariant gates for the chunk -> deterministic-shuffle -> pack chain that
  * the DuckDB oracles (q_chunk_docs / q_pack_sequences) cannot express:
  * multi-window reconstruction on long synthetic texts (the sf corpus tops out
  * at 99 tokens = 2 windows), layout/rerun invariance of the shuffle position,
  * and the packing capacity bound. Scale assertions (narrow chunking plan,
  * single shard exchange) are gated in PLANS.md's explain audit.
  */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** doc i has `30 + 97*i mod 700` tokens "w<doc>_<idx>" — unique everywhere,
    * so window reconstruction is checkable token by token.
    */
  private def longDocs(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      val toks = 30 + (97 * i % 700).toInt
      (i, (0 until toks).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("chunkDocs: windows tile the token sequence with exact overlap") {
    import spark.implicits._
    val maxT = 64; val over = 8; val stride = maxT - over
    val rows = Chunking.chunkDocs(longDocs(40), "text", "doc_id", maxT, over)
      .select($"doc_id", $"chunk_idx", $"chunk_text", $"n_tokens")
      .as[(Long, Int, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(rows.size == 40)
    for ((id, chunks) <- rows) {
      val toks = 30 + (97 * id % 700).toInt
      val expectK = 1 + math.ceil(math.max(0, toks - maxT) / stride.toDouble).toInt
      assert(chunks.length == expectK, s"doc $id: ${chunks.length} windows, want $expectK")
      for ((_, ci, text, nt) <- chunks) {
        val words = text.split(" ")
        assert(nt == words.length, s"doc $id win $ci: n_tokens $nt != ${words.length}")
        assert(nt == math.min(toks - ci * stride, maxT))
        // window ci must hold exactly tokens [ci*stride, ci*stride + nt)
        words.zipWithIndex.foreach { case (w, j) =>
          assert(w == s"w${id}_${ci * stride + j}", s"doc $id win $ci tok $j: $w")
        }
      }
      // the final window is never a pure suffix of its predecessor: it must
      // contribute at least one token past the previous window's end
      if (chunks.length > 1) {
        val last = chunks.last
        assert((chunks.length - 1) * stride + last._4 > (chunks.length - 2) * stride + maxT,
          s"doc $id: vacuous last window")
      }
    }
  }

  test("chunkDocs: empty and whitespace-only docs emit no windows") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, "one two")).toDF("doc_id", "text")
    val out = Chunking.chunkDocs(df, "text", "doc_id", 4, 1)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(3L))
  }

  test("shufflePosition: layout- and rerun-invariant, well spread, seed-sensitive") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("doc_id")
    def posMap(parts: Int): Map[Long, Long] =
      Chunking.deterministicShuffle(ids.repartition(parts), "doc_id", seed = 42L, nShards = 8)
        .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    val a = posMap(1); val b = posMap(13)
    assert(a == b, "shuffle position must not depend on partition layout")
    // spread: sequential ids must not land in sequential order (the two-round
    // hash breaks the single-Knuth-round rotation lattice)
    val inversions = (0L until 1999L).count(i => a(i) > a(i + 1))
    assert(inversions > 800 && inversions < 1200, s"order not shuffled: $inversions/1999 inversions")
    // seed changes the permutation
    val c = Chunking.deterministicShuffle(ids, "doc_id", seed = 43L, nShards = 8)
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert((0L until 2000L).count(i => a(i) == c(i)) < 20, "seed must permute positions")
    // shards balanced-ish: each of 8 shards holds 2000/8 +- 50%
    val shardCounts = Chunking.deterministicShuffle(ids, "doc_id", 42L, 8)
      .groupBy($"shard").count().as[(Int, Long)].collect().toMap
    assert(shardCounts.keySet == (0 until 8).toSet)
    shardCounts.values.foreach(n => assert(n > 125 && n < 375, s"skewed shard: $n"))
  }

  test("packSequences: capacity bound, dense seq ids, deterministic across layouts") {
    import spark.implicits._
    val maxT = 64; val cap = 256
    val chunks = Chunking.chunkDocs(longDocs(60), "text", "doc_id", maxT, 8)
      .select($"doc_id", $"chunk_idx", $"n_tokens")
    def packed(parts: Int) =
      Chunking.packSequences(
        Chunking.deterministicShuffle(chunks.repartition(parts), "doc_id", 42L, 4),
        "doc_id", "chunk_idx", "n_tokens", cap)
        .select($"doc_id", $"chunk_idx", $"shard", $"seq_id", $"n_tokens", $"tokens_before")
        .as[(Long, Int, Int, Long, Int, Long)].collect()
    val p = packed(1)
    assert(p.toSet == packed(7).toSet, "packing must not depend on partition layout")
    for (((_, seq), group) <- p.groupBy(r => (r._3, r._4))) {
      // concat-then-split slack: a sequence holds < cap + maxT tokens, and every
      // chunk STARTS inside its sequence's [seq*cap, (seq+1)*cap) token range
      val total = group.map(_._5).sum
      assert(total < cap + maxT, s"seq $seq overflows: $total tokens")
      group.foreach { case (_, _, _, s, _, before) =>
        assert(before / cap == s && before >= s * cap)
      }
    }
    // seq ids per shard are dense 0..max (no gap: every capacity boundary is hit)
    for ((shard, rows) <- p.groupBy(_._3)) {
      val seqs = rows.map(_._4).distinct.sorted.toVector
      assert(seqs.head == 0L && seqs == (0L to seqs.last).toVector,
        s"shard $shard seq ids not dense: $seqs")
    }
  }
}
