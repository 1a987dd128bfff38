package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: warm timings for the two CC solvers side by side
  * (GRAFT_CC_DEBUG=1 adds per-phase breakdown from minhashClusters). */
object DevCc {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CCPHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables(spark, sfDir, "documents")
    // warm the shingle cache
    t("warm-shingle-cache") {
      graft.operators.Dedup.minhashClusters(docs).write
        .format("noop").mode("overwrite").save()
    }
    (1 to 2).foreach { i =>
      t(s"clusters-full-$i") {
        graft.operators.Dedup.minhashClusters(docs).write
          .format("noop").mode("overwrite").save()
      }
      t(s"star-full-$i") {
        graft.operators.Dedup.minhashClustersStar(docs).write
          .format("noop").mode("overwrite").save()
      }
    }
    graft.operators.Dedup.releaseCaches()
    spark.stop()
  }
}
