package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.VectorSearch

class VectorSearchSpec extends SparkSpecBase {
  private def emb = Tables(spark, sf, "embeddings")

  test("topK returns k rows sorted by similarity desc") {
    val rows = VectorSearch.topK(emb).collect()
    assert(rows.length == VectorSearch.K)
    val sims = rows.map(_.getDouble(2))
    assert(sims.sameElements(sims.sortBy(-_)))
  }

  test("half-normalized score matches driver-side arithmetic (Q1 semantics)") {
    // reference main.go:246: dot(q/||q||, v) with v NOT normalized
    val row = emb.where(col("vec_id") === 0)
      .select(scoreRefDf).collect().head
    val v = emb.where(col("vec_id") === 0)
      .select(toDouble(col("embedding"))).collect()
      .head.getSeq[Double](0).toArray
    val expected = v.indices.foldLeft(0.0)((a, i) =>
      a + VectorSearch.QueryNorm(i) * v(i))
    assert(row.getDouble(0) == expected) // bitwise: same fold order
  }
  private def scoreRefDf = VectorSearch.scoreRef(col("embedding")).as("s")

  test("multiSearch only returns requested collections and <= k rows") {
    val rows = VectorSearch.multiSearch(emb, Seq(1, 3), 5).collect()
    assert(rows.length <= 5)
    assert(rows.forall(r => Set(1, 3).contains(r.getInt(1))))
  }

  test("multi-collection global topK == topK over per-collection topKs") {
    // SURVEY.md E2: per-collection top-k then global top-k over the union
    // is equivalent to one global top-k over the pruned scan.
    val labels = Seq(0, 2, 4)
    val global = VectorSearch.multiSearch(emb, labels, 7).collect()
    val perCol = labels
      .map(l => VectorSearch.topK(emb.where(col("label") === l), 7))
      .reduce(_ union _)
      .orderBy(col("similarity").desc, col("vec_id")).limit(7).collect()
    assert(global.map(_.getLong(0)).sameElements(perCol.map(_.getLong(0))))
  }

  test("perCollectionTopK keeps at most k per label, rank starts at 1") {
    val rows = VectorSearch.perCollectionTopK(emb, 3).collect()
    val byLabel = rows.groupBy(_.getInt(1))
    assert(byLabel.values.forall(_.length <= 3))
    assert(byLabel.values.forall(_.map(_.getInt(3)).min == 1))
  }

  test("knnJoin excludes self and returns k neighbours per query") {
    val rows = VectorSearch.knnJoin(emb, Seq(0, 1), 4).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length == 4))
  }

  test("mmr rerank: first pick is pure relevance, a duplicate of the " +
      "top hit is demoted below a diverse lower-relevance hit") {
    import spark.implicits._
    val q = VectorSearch.Query
    // v1 ~ query direction; v2 identical to v1 (cos 1); v3 diverse
    // (orthogonal-ish) with lower relevance
    val v1 = q.map(_ * 0.9f.toDouble).map(_.toFloat)
    val v2 = v1.clone()
    val v3 = Array.tabulate(VectorSearch.Dim)(i =>
      (if (i % 2 == 0) q(i) else -q(i)).toFloat * 0.5f)
    val emb = Seq((1L, v1.toSeq, 0), (2L, v2.toSeq, 0), (3L, v3.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
    val got = VectorSearch.mmrRerank(emb, k = 3).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id")))
    assert(got.toSeq == Seq((1, 1L), (2, 3L), (3, 2L)))
    // fixture sanity: k unique picks, rank 1 = the relevance top-1
    val rows = VectorSearch.mmrRerank(emb0).collect()
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    val top1 = VectorSearch.topKCosine(emb0, 1).collect()(0).getAs[Long]("vec_id")
    assert(rows.head.getAs[Long]("vec_id") == top1)
  }

  private def emb0 = emb

  test("mmr at lambda=1 degenerates to pure relevance ranking") {
    val viaMmr = VectorSearch.mmrRerank(emb, lam = 1.0).collect()
      .map(_.getAs[Long]("vec_id")).toSeq
    val viaRel = VectorSearch.topKCosine(emb, 5).collect()
      .map(_.getAs[Long]("vec_id")).toSeq
    assert(viaMmr == viaRel)
  }

  test("maxsim: score decomposes into independent per-query maxima; " +
      "dominates any single query's retrieval score") {
    import graft.functions.VectorFunctions.vecLit
    import graft.functions.{VectorExpressions => V}
    val rows = VectorSearch.maxSimSearch(emb).collect()
    assert(rows.length == 5)
    // desc by score with label tiebreak
    val scores = rows.map(_.getAs[Double]("maxsim_score"))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
    rows.foreach { r =>
      // the score IS the sum of the row's own per-query maxima
      assert(r.getAs[Double]("maxsim_score") ==
        r.getAs[Double]("m0") + r.getAs[Double]("m1") + r.getAs[Double]("m2"))
      // each max is a genuine per-label cosine maximum
      val lbl = r.getAs[Int]("label")
      val m0 = emb.where(col("label") === lbl)
        .agg(max(V.cosine(vecLit(VectorSearch.MaxSimQueries.head),
          col("embedding")))).collect()(0).getDouble(0)
      assert(r.getAs[Double]("m0") == m0)
    }
  }

  test("topK under-k: k larger than collection still sorted (D2 fix of Q2)") {
    val tiny = emb.where(col("vec_id") < 3)
    val rows = VectorSearch.topK(tiny, 10).collect()
    assert(rows.length == 3)
    val sims = rows.map(_.getDouble(2))
    assert(sims.sameElements(sims.sortBy(-_)))
  }

  test("cosine is scale-invariant, half-normalized dot is not (Q1)") {
    val a = Array(1.0, 2.0, 3.0)
    val df = spark.range(1).select(
      cosine(vecLit(a), vecLit(a.map(_ * 5))).as("c"),
      dotSeq(vecLit(normalize(a)), vecLit(a.map(_ * 5))).as("d"))
    val r = df.collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) > 1.0) // picks up the magnitude of v
  }
}
