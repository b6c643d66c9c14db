package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: stage costs inside ngramJaccardNearDups at a given SF dir. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.buildSession("32")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val dupes = docs.union(docs.select(col("doc_id") + 10000, col("text"))).cache()
    dupes.count()

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$name] ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }

    // shingle+sketch stage only
    time("sketch") {
      dupes.select(col("doc_id").cast("long").as("id"), col("text")).as[(Long, String)]
        .map { case (id, t) =>
          val sh = graft.operators.Dedup.ngramShingles(t, 5)
          java.util.Arrays.sort(sh)
          (id, sh.take(12))
        }.toDF("id", "keys").count()
    }
    // full operator, counting pairs before threshold
    time("full>=0.999") {
      graft.operators.Dedup.ngramJaccardNearDups(dupes, "text", "doc_id", threshold = 0.999).count()
    }
    time("full again (warm)") {
      graft.operators.Dedup.ngramJaccardNearDups(dupes, "text", "doc_id", threshold = 0.999).count()
    }

    // candidate-pair count + stage split (replicates the operator's internals)
    val keyed = dupes.select(col("doc_id").cast("long").as("id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val sh = graft.operators.Dedup.ngramShingles(t, 5)
        java.util.Arrays.sort(sh)
        val bottom = Array.tabulate(12)(i => if (i < sh.length) sh(i) else Long.MaxValue)
        (id, Array.tabulate(3) { b =>
          var h = 0xcbf29ce484222325L ^ b
          var r = 0
          while (r < 4) { h = graft.functions.TextFunctions.mix(h ^ bottom(4 * b + r)); r += 1 }
          h
        })
      }.toDF("id", "keys")
    val buckets = keyed.select(col("id"), posexplode(col("keys")).as(Seq("band", "bkey")))
      .groupBy(col("band"), col("bkey"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .withColumn("ids", slice(col("ids"), 1, 1000))
      .cache()
    time("buckets")(buckets.agg(count(lit(1)), max(size(col("ids")))).head())
    val pairs = buckets.select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))), b => struct(a.as("_1"), b.as("_2")))))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b")).distinct().cache()
    time("pairs distinct")(pairs.count())
    val texts = dupes.select(col("doc_id").cast("long").as("id"), col("text"))
    val joined = pairs
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("text", "text_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("text", "text_b"), "id_b")
      .select("id_a", "id_b", "text_a", "text_b").cache()
    time("join only")(joined.count())
    time("verify only") {
      import spark.implicits._
      joined.as[(Long, Long, String, String)]
        .map { case (a, b, ta, tb) =>
          (a, b, graft.operators.Dedup.exactJaccard(
            graft.operators.Dedup.ngramShingles(ta, 5), graft.operators.Dedup.ngramShingles(tb, 5)))
        }.toDF("id_a", "id_b", "jaccard").where(col("jaccard") >= 0.999).count()
    }
    // single-threaded verify cost on the driver for attribution
    time("verify driver-side") {
      val rows = joined.collect()
      var kept = 0
      rows.foreach { r =>
        val j = graft.operators.Dedup.exactJaccard(
          graft.operators.Dedup.ngramShingles(r.getString(2), 5),
          graft.operators.Dedup.ngramShingles(r.getString(3), 5))
        if (j >= 0.999) kept += 1
      }
      kept
    }
    time("join+verify") {
      pairs.join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("text", "text_a"), "id_a")
        .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("text", "text_b"), "id_b")
        .select("id_a", "id_b", "text_a", "text_b")
        .as[(Long, Long, String, String)]
        .map { case (a, b, ta, tb) =>
          (a, b, graft.operators.Dedup.exactJaccard(
            graft.operators.Dedup.ngramShingles(ta, 5), graft.operators.Dedup.ngramShingles(tb, 5)))
        }.toDF("id_a", "id_b", "jaccard").where(col("jaccard") >= 0.999).count()
    }
    spark.stop()
  }
}
