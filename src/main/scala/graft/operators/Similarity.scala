package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Brute-force cosine top-k is the exact baseline; the IVF
  * variant is the 100TB scale path: partition vectors into coarse cells, probe
  * only the closest cells per query — the scan becomes (nprobe/nCells) of the
  * corpus, and cell assignment is an embarrassingly parallel narrow map.
  */
object Similarity {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val d = norm(a) * norm(b)
    if (d == 0.0) 0.0 else dot(a, b) / d
  }

  /** Exact brute-force top-k: one narrow pass computing sims against the
    * broadcast query set, then a per-query top-k (window over rank). Queries are
    * excluded from their own result lists. Output: (query_id, rank, neighbor_id).
    */
  def bruteTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
    val queries: Map[Long, Array[Float]] =
      base.filter(r => queryIds.contains(r._1)).collect().toMap
    val bc = spark.sparkContext.broadcast(queries)
    val sims = base.mapPartitions { it =>
      val qs = bc.value.toArray
      it.flatMap { case (id, vec) =>
        qs.iterator.collect {
          case (qid, qvec) if qid != id => (qid, id, cosine(qvec, vec))
        }
      }
    }.toDF("query_id", "neighbor_id", "sim")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** IVF (inverted-file) ANN: deterministic coarse centroids (every `stride`-th
    * vector), cell assignment by max cosine, probe `nprobe` closest cells per
    * query. Returns the same shape as bruteTopK; recall < 1 by design.
    */
  def ivfTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int,
      nCells: Int = 16,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
    // deterministic coarse "centroids": first nCells vectors by id
    val centroids: Array[(Int, Array[Float])] = base
      .orderBy("id").limit(nCells).collect().zipWithIndex.map { case ((_, v), i) => (i, v) }
    val bcC = spark.sparkContext.broadcast(centroids)
    val assigned = base.mapPartitions { it =>
      val cs = bcC.value
      it.map { case (id, vec) =>
        var best = 0; var bestSim = Double.MinValue
        cs.foreach { case (ci, cv) =>
          val s = cosine(cv, vec)
          if (s > bestSim) { bestSim = s; best = ci }
        }
        (id, vec, best)
      }
    }.toDF("id", "vec", "cell")

    val queries: Map[Long, Array[Float]] =
      base.filter(r => queryIds.contains(r._1)).collect().toMap
    val probeCells: Map[Long, Set[Int]] = queries.map { case (qid, qvec) =>
      val ranked = centroids.map { case (ci, cv) => (ci, cosine(cv, qvec)) }
        .sortBy { case (ci, s) => (-s, ci) }.take(nprobe).map(_._1).toSet
      qid -> ranked
    }
    val bcQ = spark.sparkContext.broadcast(queries)
    val bcP = spark.sparkContext.broadcast(probeCells)
    val simsDf = assigned.select("id", "vec", "cell").as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val qs = bcQ.value.toArray
        val probes = bcP.value
        it.flatMap { case (id, vec, cell) =>
          qs.iterator.collect {
            case (qid, qvec) if qid != id && probes(qid).contains(cell) =>
              (qid, id, cosine(qvec, vec))
          }
        }
      }.toDF("query_id", "neighbor_id", "sim")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    simsDf.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine >= threshold,
    * LSH-bucketed by sign of projections onto `nPlanes` deterministic random
    * hyperplanes (near-identical vectors share sign buckets with high prob.);
    * exact cosine verify inside buckets.
    */
  def cosineNearDups(
      embeddings: DataFrame,
      threshold: Double = 0.95,
      nPlanes: Int = 8,
      nTables: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
    val dims = base.head()._2.length
    // deterministic pseudo-random hyperplanes from splitmix64
    val planes: Array[Array[Array[Double]]] = Array.tabulate(nTables, nPlanes) { (t, p) =>
      Array.tabulate(dims) { d =>
        val h = graft.functions.TextFunctions.mix(t * 1000003L + p * 8191L + d)
        (h.toDouble / Long.MaxValue)
      }
    }
    val bcPlanes = spark.sparkContext.broadcast(planes)
    val keyed = base.mapPartitions { it =>
      val pl = bcPlanes.value
      it.flatMap { case (id, vec) =>
        val dv = vec.map(_.toDouble)
        pl.indices.iterator.map { t =>
          var key = 0L
          var p = 0
          while (p < pl(t).length) {
            var s = 0.0
            var d = 0
            while (d < dv.length) { s += pl(t)(p)(d) * dv(d); d += 1 }
            if (s >= 0) key |= (1L << p)
            p += 1
          }
          (t, key, id)
        }
      }
    }.toDF("table", "key", "id")
    val pairs = keyed.as("x").join(keyed.as("y"),
        col("x.table") === col("y.table") && col("x.key") === col("y.key") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    val vecs = base.toDF("id", "vec")
    pairs
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .select("id_a", "id_b", "vec_a", "vec_b") // joins reorder columns; pin before positional encode
      .as[(Long, Long, Array[Float], Array[Float])]
      .map { case (a, b, va, vb) => (a, b, cosine(va, vb)) }
      .toDF("id_a", "id_b", "cos")
      .where(col("cos") >= threshold)
  }
}
