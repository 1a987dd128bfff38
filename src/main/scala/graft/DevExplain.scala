package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one declared query
  * (name + fixture dir from args) — the `.explain` loop the build
  * discipline asks for, runnable without a REPL. */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // AQE finalizes
    println(df.queryExecution.executedPlan.toString())
    Caches.releaseAll()
    spark.stop()
  }
}
