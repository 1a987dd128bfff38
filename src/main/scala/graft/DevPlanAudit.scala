package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: flag declared queries whose physical Filter conditions
  * re-evaluate expensive text kernels (the substituted-gate
  * pathology), and queries with cartesian products or oversized
  * filter conditions. */
object DevPlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // match kernel CALLS only — attributes named after a kernel
    // column (shingle_hashes#12) are cheap references, not re-evals
    val kernels = Seq("word_stats(", "repetition_signals(",
      "shingle_hashes(", "shingle_strings(", "marker_count(",
      "char_class_stats(", "poly_hash(", "minhash_sig(", "band_hashes(",
      "simhash(")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, f) =>
      try {
        val plan0 = f(spark, sfDir).queryExecution.executedPlan
        val plan = plan0 match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.initialPlan
          case p => p
        }
        var hits = List.empty[String]
        plan.foreach {
          case flt: org.apache.spark.sql.execution.FilterExec =>
            val cond = flt.condition.toString
            kernels.filter(cond.contains).foreach { k =>
              hits ::= s"$k x${cond.sliding(k.length).count(_ == k)}"
            }
          case _ =>
        }
        if (hits.nonEmpty)
          println(s"AUDIT $name: filter re-evaluates ${hits.mkString(", ")}")
      } catch { case e: Throwable =>
        println(s"AUDIT $name: ERROR ${e.getClass.getSimpleName}")
      }
    }
    graft.operators.Dedup.releaseCaches()
    graft.operators.Pipeline.releaseCaches()
    graft.operators.MlIndex.releaseCaches()
    graft.operators.Events.releaseCaches()
    graft.operators.Multimodal.releaseCaches()
    graft.operators.Ann.releaseCaches()
    spark.stop()
  }
}
