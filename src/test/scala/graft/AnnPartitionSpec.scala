package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Ann, VectorSearch}

/** The ANN scaladoc claims "at 100 TB the bucket id becomes a partition
  * column and the probe is partition pruning" — this spec actually does
  * it: writes the vector table partitioned by LSH bucket, probes, and
  * asserts (a) the scan's PartitionFilters prune to the probe set and
  * (b) results are identical to the unpartitioned probe. */
class AnnPartitionSpec extends SparkSpecBase {

  test("LSH probe over a bucket-partitioned store is partition pruning") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = Files.createTempDirectory("graft_lsh_store").toString
    Ann.buildLshIndex(emb, dir)

    val store = spark.read.parquet(dir)
    val probed = store
      .where(col("bucket").isin(Ann.ProbeBuckets: _*))
      .select(col("vec_id"), col("label"), col("bucket"),
        VectorSearch.scoreRef(col("embedding")).as("similarity"))
      .orderBy(col("similarity").desc, col("vec_id"))
      .limit(10)

    val plan = probed.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [bucket#") ||
      plan.contains("PartitionFilters: [cast(bucket"),
      s"probe must prune partitions:\n$plan")
    // pruning is real on this data: the probe reads strictly fewer
    // bucket directories than the store contains
    val allBuckets = store.select("bucket").distinct().count()
    val readBuckets = store.where(col("bucket").isin(Ann.ProbeBuckets: _*))
      .select("bucket").distinct().count()
    assert(readBuckets < allBuckets,
      s"probe read $readBuckets of $allBuckets buckets — nothing pruned")

    // identical answer to the compute-on-scan variant
    val expect = Ann.lshTopK(emb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("similarity"))).toSeq
    val got = probed.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("similarity"))).toSeq
    assert(got == expect)
  }

  test("IVF cells as partition column: probe reads only nProbe dirs") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = Files.createTempDirectory("graft_ivf_store").toString
    Ann.buildIvfIndex(emb, dir)
    val store = spark.read.parquet(dir)
    assert(store.select("cent_id").distinct().count() <= Ann.NList)
    val probeIds = Ann.ivfTopK(emb).collect()
      .map(_.getAs[Long]("cent_id")).distinct.toSeq
    val probed = store.where(col("cent_id").isin(probeIds: _*))
    val plan = probed.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters:") &&
      plan.contains("cent_id"), s"expected cent_id partition filter:\n$plan")
  }

  test("ivfTopKStored: the FULL search over the materialized store is " +
      "partition pruning (nProbe of nList dirs read) and bitwise equal " +
      "to the compute-on-scan ivfTopK") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = Files.createTempDirectory("graft_ivf_search").toString
    Ann.buildIvfIndex(emb, dir)
    val store = spark.read.parquet(dir)
    val stored = Ann.ivfTopKStored(store)
    val plan = stored.queryExecution.executedPlan.toString()
    // the scan carries the probe set as a PARTITION filter (directory
    // pruning: "Pruning directories with: cent_id IN (...)" at
    // execution), not a data filter over all cells
    assert(plan.contains("PartitionFilters:") && plan.contains("cent_id"),
      s"stored probe must prune on cent_id:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*cent_id[^\\]]*IN".r
      .findFirstIn(plan).nonEmpty,
      s"probe set must be an IN partition filter:\n$plan")
    val got = stored.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cent_id"),
        r.getAs[Double]("similarity"))).toSeq
    val expect = Ann.ivfTopK(emb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cent_id"),
        r.getAs[Double]("similarity"))).toSeq
    assert(got == expect)
  }

  test("semanticDedupAssigned over the cell-partitioned store equals " +
      "the compute-on-scan semanticDedup; a per-cell maintenance pass " +
      "prunes to one directory") {
    import graft.operators.Dedup
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = Files.createTempDirectory("graft_ivf_dedup").toString
    Ann.buildIvfIndex(emb, dir)
    val store = spark.read.parquet(dir)
    val got = Dedup.semanticDedupAssigned(store).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cent_id"),
        r.getAs[Boolean]("keep"))).toSeq
    val expect = Dedup.semanticDedup(emb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cent_id"),
        r.getAs[Boolean]("keep"))).toSeq
    assert(got == expect)
    // the incremental shape: one cell's dedup pass reads ONE directory
    val c0 = expect.head._2
    val oneCell = Dedup.semanticDedupAssigned(
      store.where(col("cent_id") === c0))
    val plan = oneCell.queryExecution.executedPlan.toString()
    // every scan in the pass (both self-join sides and the keep join)
    // carries the single-cell equality as a PARTITION filter — one
    // directory listed and read per scan
    val scanFilters = "PartitionFilters: \\[[^\\]]+\\]".r
      .findAllIn(plan).toSeq
    assert(scanFilters.nonEmpty &&
      scanFilters.forall(f => f.contains("cent_id") && f.contains(s"= $c0")),
      s"per-cell pass must prune every scan to cent_id=$c0:\n$plan")
  }

  test("refreshIvfIndex: batch appends into existing cells with the " +
      "store's own codebook — base files untouched, probes bitwise a " +
      "full rebuild's") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = Files.createTempDirectory("graft_ivf_refresh").toString
    val batchPred = col("vec_id") % 10 === 1 &&
      !col("vec_id").isin(Ann.CentroidIds: _*)
    Ann.buildIvfIndex(emb.where(!batchPred), dir)
    def files() = spark.read.parquet(dir).inputFiles.toSet
    val before = files()
    Ann.refreshIvfIndex(emb.where(batchPred), dir)
    val after = files()
    // append-only maintenance: every base file survives, new files add
    assert(before.subsetOf(after) && after.size > before.size)
    // no new cells invented: assignments stay within the codebook grid
    assert(spark.read.parquet(dir).select("cent_id").distinct().count()
      <= Ann.NList)
    // refreshed store content equals a full rebuild's assignment
    val fullDir = Files.createTempDirectory("graft_ivf_full").toString
    Ann.buildIvfIndex(emb, fullDir)
    def rows(d: String) = spark.read.parquet(d)
      .select(col("vec_id"), col("cent_id").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(dir) == rows(fullDir))
    // and the probe answers bitwise like the full store
    def ask(d: String) = Ann.ivfTopKStored(spark.read.parquet(d)).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cent_id"),
        r.getAs[Double]("similarity"))).toSeq
    assert(ask(dir) == ask(fullDir))
    Seq(dir, fullDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }
}
