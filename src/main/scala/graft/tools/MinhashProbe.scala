package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage probe for [[graft.operators.Dedup.minhashLshPairs]]: times the
  * capped groupBy path vs the guard-disabled self-join path, plus the
  * signature/verify halves, to attribute the r10 regression precisely. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, dir)

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // warm + 2 timed
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        dt
      }
      println(f"[probe] $tag%-28s warm=${times.head}%.2f  best=${times.tail.min}%.2f")
    }

    time("capped groupBy (dfCap=1000)") {
      graft.operators.Dedup.minhashLshPairs(docs, 3, 42, 3, 0.5, dfCap = 1000)
    }
    time("self-join (dfCap=0)") {
      graft.operators.Dedup.minhashLshPairs(docs, 3, 42, 3, 0.5, dfCap = 0)
    }
    // the halves: signature+band explode alone, then candidates alone
    import org.apache.spark.sql.functions._
    time("signatures+bands only") {
      graft.operators.Dedup.minhashBandTable(docs, 3, 42, 3)
    }
    time("cand only (groupBy path)") {
      val b = graft.operators.Dedup.minhashBandTable(docs, 3, 42, 3)
      b.groupBy("band", "bh")
        .agg(expr("graft_top_k(struct(doc_id), 1001, 'A')").as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(col("ids"), explode(col("ids")).as("ra"))
        .select(col("ra.doc_id").as("doc_a"), explode(col("ids")).as("rb"))
        .select(col("doc_a"), col("rb.doc_id").as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
        .distinct()
    }
    time("cand only (collect_list)") {
      val b = graft.operators.Dedup.minhashBandTable(docs, 3, 42, 3)
      b.groupBy("band", "bh")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")).between(2, 1000))
        .select(col("ids"), explode(col("ids")).as("doc_a"))
        .select(col("doc_a"), explode(col("ids")).as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
        .distinct()
    }
    time("cand only (self-join)") {
      val b = graft.operators.Dedup.minhashBandTable(docs, 3, 42, 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b.as("x").join(b.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
    }
    spark.stop()
  }
}
