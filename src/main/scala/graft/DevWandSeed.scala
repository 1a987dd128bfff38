package graft

import org.apache.spark.sql.SparkSession

/** Measure-first harness for the WAND seed width: survivor counts on
  * the declared audit at seed widths 1..3, plus wall time per width. */
object DevWandSeed {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextAnalysis
    val path = TextAnalysis.textIndexFor(spark, sfDir)
    Seq(1, 2, 3).foreach { st =>
      val t0 = System.nanoTime()
      val rows = TextAnalysis.wandStatsStored(spark, path,
        TextAnalysis.Bm25QuerySuite, TextAnalysis.Bm25TopK, st).collect()
      val ms = (System.nanoTime() - t0) / 1e6
      rows.foreach { r =>
        println(s"SEED $st q=${r.getLong(0)} cand=${r.getLong(1)} " +
          s"surv=${r.getLong(2)}")
      }
      println(f"SEED $st total_ms=$ms%.0f")
    }
    Caches.releaseAll()
    spark.stop()
  }
}
