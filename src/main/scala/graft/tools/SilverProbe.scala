package graft.tools

import graft.core.Sessions

/** Builder tool: stage-by-stage timing of the silver lineitem programs. */
object SilverProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(16, "graft-silverprobe")
    import org.apache.spark.sql.DataFrame

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(label: String)(df: => DataFrame): Unit = {
      val frame = df
      noop(frame) // warm
      val t0 = System.nanoTime()
      noop(frame)
      println(f"SPROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // replicate silver_inventory_items stage by stage via package access
    val bronze = graft.queries.Silver.probeBronzeInventory(spark, sfDir)
    t("A bronze construct")(bronze)
    t("B bronze+dedup")(graft.medallion.SilverTransforms.dedupLatest(bronze, "id"))
    t("C full query")(graft.queries.Silver.queries("silver_inventory_items")(spark, sfDir))
    // D: dedup + cleaners but NO timestamp parse
    t("D full minus ts-parse")(graft.queries.Silver.probeInventoryNoTs(spark, sfDir))
    spark.stop()
  }
}
