package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: print FilterExec conditions containing text kernels for
  * one declared query. */
object DevShowFilter {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan0 = SparkEntry.queries(q)(spark, sfDir)
      .queryExecution.executedPlan
    val plan = plan0 match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    plan.foreach {
      case flt: org.apache.spark.sql.execution.FilterExec =>
        val cond = flt.condition.toString
        if (Seq("shingle_hashes", "minhash_sig", "band_hashes")
            .exists(cond.contains))
          println("FILTERCOND " + cond.take(600))
      case _ =>
    }
    Caches.releaseAll()
    spark.stop()
  }
}
