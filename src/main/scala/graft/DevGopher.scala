package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-only: stage timing of the gopher gate. */
object DevGopher {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Pipeline, TextAnalysis}
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables(spark, sfDir, "documents")
    (1 to 3).foreach { r =>
      println(s"== round $r")
      t("scan_only")(docs.count())
      t("words_only")(docs.select(
        graft.functions.TextFunctions.words(col("text")).as("ws"))
        .select(size(col("ws")).cast("long").as("n")).agg(sum("n")).count())
      t("rep_core")(TextAnalysis.repetitionStats(docs).count())
      t("gopher_full")(Pipeline.gopherFilter(spark, sfDir).count())
    }
    Pipeline.gopherFilter(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
