package graft

import org.apache.spark.sql.functions._

import graft.operators.{Events, MlIndex, VectorSearch}

class MlIndexSpec extends SparkSpecBase {

  test("kmeans IVF: k results from <= nProbe clusters, ranked, deterministic") {
    val r1 = MlIndex.kmeansIvfTopK(spark, sf).collect()
    assert(r1.length == 10)
    assert(r1.map(_.getAs[Int]("cluster")).distinct.length <= 4)
    val sims = r1.map(_.getAs[Double]("similarity")).toSeq
    assert(sims == sims.sortBy(-_))
    // fixed seed + fixed input => reproducible
    val r2 = MlIndex.kmeansIvfTopK(spark, sf).collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
    // recall sanity vs the exact scan
    val exact = VectorSearch.topK(
      spark.read.parquet(s"$sf/embeddings.parquet")).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(r1.map(_.getAs[Long]("vec_id")).toSet.intersect(exact).nonEmpty)
  }

  test("MinHashLSH join: symmetric-free pairs, distances within threshold") {
    val rows = MlIndex.minhashJoin(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id_1") < r.getAs[Long]("doc_id_2"))
      assert(r.getAs[Double]("dist") <= 0.9)
    }
  }

  test("MinHashLSH join: the quadratic demo refuses over-cap input") {
    // the size-estimate guard must fire BEFORE any Spark job: with a
    // 1-byte cap even the sampled fixture slice is refused, and the
    // message points at the banded scale path
    val e = intercept[IllegalArgumentException] {
      MlIndex.minhashJoin(spark, sf, maxInputBytes = 1L)
    }
    assert(e.getMessage.contains("Dedup.minhashPairs"))
    // at the default cap the demo block is comfortably admitted
    assert(MlIndex.minhashJoin(spark, sf).columns.nonEmpty)
  }

  test("salted two-phase aggregation equals direct group-by exactly") {
    val salted = Events.saltedTypeStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val direct = Events.load(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted == direct) // decimal partials make salting exact
  }
}
