package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing: the 100 TB answer to repeated fact-fact joins. Writing
  * orders and lineitem bucketed by the join key lets every subsequent
  * join/aggregation on that key run with ZERO shuffle — the plan
  * assertion here is the proof. (At scale this is how the
  * orders ⋈ lineitem shuffle in rel_revenue_by_nation amortizes to
  * nothing across a query workload.) */
class BucketingSpec extends SparkSpecBase {

  test("bucketed co-located join plans without a single exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")

    s.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b") // external table: warehouse.dir is static
      .mode("overwrite").saveAsTable("orders_b")
    s.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = s.table("orders_b")
      .join(s.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString()
    val joinShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    // the bucketed join itself must be shuffle-free; the only hash
    // exchange allowed is the final 5-row aggregation
    assert(joinShuffles <= 1, s"bucketed join should not shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.substring(plan.indexOf("SortMergeJoin"))
      .contains("Exchange hashpartitioning"),
      s"exchange below the join => bucketing not used:\n$plan")

    // and it computes the right thing
    val expect = s.read.parquet(s"$sf/orders.parquet")
      .join(s.read.parquet(s"$sf/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }
}
