package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.TextHashExpressions
import graft.operators.Dedup

class DedupSpec extends SparkSpecBase {

  test("containment: embedded doc scores C=1 where jaccard is diluted") {
    import spark.implicits._
    // doc 3 is fully embedded at the head of doc 6; doc 12 is disjoint.
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (3L, "en", small),
      (6L, "en", small + " " + filler),
      (12L, "en", "totally unrelated words nothing shared here at all"))
      .toDF("doc_id", "lang", "text")
    val rows = Dedup.containmentPairs(docs).collect()
    assert(rows.map(r => (r.getAs[Long]("doc_id_1"),
      r.getAs[Long]("doc_id_2"))).toSeq == Seq((3L, 6L)))
    val r = rows.head
    // every shingle of 3 appears in 6 → full forward containment…
    assert(r.getAs[Double]("containment_12") == 1.0)
    // …while the symmetric measures stay small (6 is mostly filler)
    assert(r.getAs[Double]("containment_21") < 0.2)
    val j = r.getAs[Long]("n_common").toDouble /
      (r.getAs[Long]("n_common") / r.getAs[Double]("containment_12") +
        r.getAs[Long]("n_common") / r.getAs[Double]("containment_21") -
        r.getAs[Long]("n_common"))
    assert(j < 0.2) // jaccard alone would never flag this pair at 0.5
    Dedup.releaseCaches()
  }

  test("canonicalKeepers: groupBy-min formulation ≡ the window spelling") {
    import org.apache.spark.sql.expressions.Window
    val d = docs
    val viaHelper = Dedup.canonicalKeepers(d)
      .collect().map(_.getLong(0)).toSet
    val w = Window.partitionBy(col("canon"))
    val viaWindow = d
      .select(col("doc_id"), Dedup.canonicalKey.as("canon"))
      .withColumn("keeper", col("doc_id") === min(col("doc_id")).over(w))
      .where(col("keeper"))
      .collect().map(_.getLong(0)).toSet
    assert(viaHelper == viaWindow && viaHelper.nonEmpty)
  }

  test("band stats: occupancy audit is consistent with the corpus") {
    val r = Dedup.minhashBandStats(docs).collect()
    assert(r.length == 1)
    val row = r.head
    val (nDocs, nBuckets, hottest, mass) = (row.getAs[Long]("n_docs"),
      row.getAs[Long]("n_buckets"), row.getAs[Long]("hottest"),
      row.getAs[Long]("pair_mass"))
    assert(nDocs > 0 && nBuckets > 0)
    assert(hottest >= 1 && hottest <= nDocs)
    // mass bounds: at least the hottest bucket's pairs, at most
    // every-band-one-bucket (Bands × C(nDocs, 2))
    assert(mass >= hottest * (hottest - 1) / 2)
    assert(mass <= Dedup.Bands.toLong * nDocs * (nDocs - 1) / 2)
    Dedup.releaseCaches()
  }

  test("df cap: a boilerplate shingle above the cap never reaches the self-join") {
    import spark.implicits._
    // One hot shingle (df = 6, i.e. every doc) + per-doc unique shingles.
    val postings = Seq.tabulate(6) { i =>
      (i.toLong * 3, "en", Seq(100L, 1000L + i, 2000L + i))
    }.toDF("doc_id", "lang", "sh")
    val capped = Dedup.cappedPostings(postings, cap = 4).collect()
    assert(!capped.exists(_.getAs[Long]("h") == 100L),
      "df-6 shingle must be dropped at cap 4")
    assert(capped.length == 12, "df-1 shingles all survive")
    assert(capped.forall(_.getAs[Int]("n") == 3),
      "n keeps the UNCAPPED set size (denominators unchanged)")
    // uncapped: everything survives
    assert(Dedup.cappedPostings(postings, cap = 6).count() == 18)

    // End-to-end: docs glued ONLY by a common boilerplate header. With
    // the cap above df the pairs appear; with the cap below df the hot
    // shingles are excluded and the pair mass collapses to zero.
    val header = (1 to 12).map(i => s"license$i").mkString(" ")
    val docs = Seq.tabulate(6) { i =>
      (i.toLong * 3, "en", s"$header unique${i}a unique${i}b")
    }.toDF("doc_id", "lang", "text")
    assert(Dedup.containmentPairs(docs).count() == 15) // C(6,2): cap inactive
    assert(Dedup.containmentPairs(docs, cap = 4).count() == 0)
    assert(Dedup.ngramJaccardPairs(docs).count() == 15)
    assert(Dedup.ngramJaccardPairs(docs, cap = 4).count() == 0)
    Dedup.releaseCaches()
  }

  test("decontamination: bench docs excluded, shared counts bounded, flag consistent") {
    val rows = Dedup.decontaminate(
      graft.Tables(spark, sf, "documents")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 17 != 0) // the held-out set is never flagged
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Boolean]("contaminated") ==
        (r.getAs[Long]("n_shared") >= 1L))
    }
    Dedup.releaseCaches()
  }
  private def docs = Tables(spark, sf, "documents")

  test("canonical dedup: case/whitespace variants collapse, prefix " +
      "bounds the key, distinct texts survive") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 'Hello  World'),
        |  (2L, 'hello world'),
        |  (3L, ' hello   WORLD '),
        |  (4L, 'hello worlds'),
        |  (5L, concat('pad ', repeat('x', 200), ' tail-A')),
        |  (6L, concat('PAD ', repeat('x', 200), ' tail-B'))
        |AS t(doc_id, text)""".stripMargin)
    val rows = Dedup.canonical(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_variants"))
      .toMap
    // 1,2,3 normalize to one key (keeper = 1); 4 differs; 5,6 agree on
    // the 128-char prefix (the tails differ past the bound)
    assert(rows == Map(1L -> 3L, 4L -> 1L, 5L -> 2L))
  }

  test("exact dedup: duplicates share cluster, min doc_id is keeper") {
    val df = spark.sql(
      """SELECT * FROM VALUES (1L,'same text'),(2L,'same text'),(3L,'other')
        |AS t(doc_id, text)""".stripMargin)
    val rows = Dedup.exact(df).collect()
    assert(rows.map(_.getAs[Long]("group_size")).toSeq == Seq(2, 2, 1))
    assert(rows.map(_.getAs[Boolean]("keep")).toSeq == Seq(true, false, true))
    assert(rows(0).getAs[String]("content_hash")
      == rows(1).getAs[String]("content_hash"))
  }

  test("shingled relation is memoized per input; releaseCaches unpersists") {
    // compare RDD-id SETS owned by these calls, not global counts: the
    // iterative solvers' localCheckpoint RDDs are reclaimed by the
    // async ContextCleaner, so unrelated entries may vanish between
    // snapshots without making this test's claims false
    def ids = spark.sparkContext.getPersistentRDDs.keySet.toSet
    Dedup.releaseCaches()
    val before = ids
    Dedup.minhashPairs(docs).collect()
    val created = ids -- before
    assert(created.nonEmpty) // the shared shingle relation is cached
    // same input again: memoized, NOT a second persisted copy
    Dedup.minhashPairs(docs).collect()
    assert((ids -- before) == created)
    Dedup.releaseCaches()
    assert((ids & created).isEmpty) // the memo entries are gone
  }

  test("fused shingle kernel == HOF formulation (bitwise)") {
    val ws = words(col("text"))
    val hof = polyHashAll(shingles(ws, 3))
    val fused = TextHashExpressions.shingleHashes(ws, 3)
    val diff = docs.select(hof.as("a"), fused.as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("fused shingle-STRING kernel == HOF shingles (bitwise)") {
    val ws = words(col("text"))
    val diff = docs.select(shingles(ws, 3).as("a"),
        TextHashExpressions.shingleStrings(ws, 3).as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() == 0)
    // n > array size -> empty; and n=1 is the identity
    val edge = spark.sql("SELECT array('x', 'y') AS ws")
    val r = edge.select(TextHashExpressions.shingleStrings(col("ws"), 3).as("s3"),
      TextHashExpressions.shingleStrings(col("ws"), 1).as("s1")).head
    assert(r.getAs[scala.collection.Seq[String]]("s3").isEmpty)
    assert(r.getAs[scala.collection.Seq[String]]("s1").toSeq == Seq("x", "y"))
  }

  test("fused word-hash kernel (n=1) == polyHashAll(words)") {
    val ws = words(col("text"))
    val diff = docs.select(polyHashAll(ws).as("a"),
        TextHashExpressions.wordHashes(ws).as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("minhash signature: known tiny case + containment property") {
    // identical docs -> identical sigs; sig values in [0, P)
    val df = spark.sql(
      """SELECT * FROM VALUES (1L,'a b c d e'),(2L,'a b c d e'),(3L,'v w x y z')
        |AS t(doc_id, text)""".stripMargin)
    val rows = Dedup.minhashSignatures(df).collect()
    assert((0 until 4).forall(b =>
      rows(0).getLong(b + 1) == rows(1).getLong(b + 1)))
    assert((0 until 4).exists(b =>
      rows(0).getLong(b + 1) != rows(2).getLong(b + 1)))
  }

  test("minhash LSH: identical docs are candidate pairs with jaccard 1") {
    val df = spark.sql(
      """SELECT * FROM VALUES (1L,'the quick brown fox jumped over dogs'),
        |(2L,'the quick brown fox jumped over dogs'),
        |(3L,'completely unrelated content words here now')
        |AS t(doc_id, text)""".stripMargin)
    val pairs = Dedup.minhashPairs(df).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("doc_id_1") == 1L)
    assert(pairs.head.getAs[Long]("doc_id_2") == 2L)
    assert(pairs.head.getAs[Double]("jaccard") == 1.0)
  }

  test("keep-best: the longest variant wins its canonical group, one " +
      "keeper per group, same groups as min-id canonical") {
    import spark.implicits._
    // two variants of one canonical text (same 128-char prefix after
    // normalization; the longer must win), one standalone doc
    val base = "alpha beta gamma " * 10 // 170 chars: prefix-identical
    val df = Seq(
      (1L, base), (2L, base + "delta epsilon zeta"), (3L, "unrelated text"))
      .toDF("doc_id", "text")
    val r = Dedup.keepBest(df).collect()
      .map(x => x.getLong(0) -> (x.getAs[Long]("n_variants"),
        x.getAs[Boolean]("keep"))).toMap
    assert(r(1L) == ((2L, false)) && r(2L) == ((2L, true)))
    assert(r(3L) == ((1L, true)))
    // fixture: exactly one keeper per group; keeper count == canonical
    // keeper count (same grouping, different policy)
    val rows = Dedup.keepBest(docs).collect()
    assert(rows.count(_.getAs[Boolean]("keep")) ==
      Dedup.canonicalKeepers(docs).count())
  }

  test("dedup funnel: stage counts match the stage relations, monotone, " +
      "yields exact") {
    val r = Dedup.dedupFunnel(docs).collect()(0)
    val nRaw = r.getAs[Long]("n_raw")
    val nCanon = r.getAs[Long]("n_canonical")
    val nNear = r.getAs[Long]("n_near")
    assert(nRaw == docs.count())
    assert(nCanon == Dedup.canonicalKeepers(docs).count())
    assert(nRaw >= nCanon && nCanon >= nNear && nNear > 0)
    assert(r.getAs[Double]("yield_canonical") ==
      nCanon.toDouble / nRaw.toDouble)
    assert(r.getAs[Double]("yield_near") == nNear.toDouble / nRaw.toDouble)
  }

  test("minhash recall curve: counts consistent, exact duplicates never missed") {
    val rows = Dedup.minhashRecall(docs).collect()
    assert(rows.map(_.getAs[Double]("tau")).toSeq == Dedup.MinhashRecallTaus)
    rows.foreach { r =>
      val (e, l) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_lsh"))
      assert(l >= 0 && l <= e)
      assert(r.getAs[Double]("recall") == l.toDouble / e.toDouble)
    }
    // n_exact is non-increasing in tau (each tau's pair set nests the next)
    val ex = rows.map(_.getAs[Long]("n_exact")).toSeq
    assert(ex == ex.sorted.reverse)
    // identical docs (J = 1) have identical signatures in EVERY band, so
    // banding can never miss them: with a planted exact-dup pair the
    // tau = 0.9 bucket has n_exact >= 1 and its recall stays defined
    val planted = docs.select(col("doc_id"), col("text")).union(
      docs.orderBy("doc_id").limit(1)
        .select(col("doc_id") + 1000000L, col("text")))
    val top = Dedup.minhashRecall(planted).collect()
      .find(_.getAs[Double]("tau") == 0.9).get
    assert(top.getAs[Long]("n_exact") >= 1L)
    assert(top.getAs[Long]("n_lsh") >= 1L)
  }

  test("clusters: edges stay within clusters, canonical is the min id") {
    val clusters = Dedup.minhashClusters(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("keep"))).toMap
    // every verified near-dup pair lands in one cluster
    Dedup.minhashPairs(docs).where(col("jaccard") >= 0.5).collect().foreach { p =>
      assert(clusters(p.getAs[Long]("doc_id_1"))._1 ==
        clusters(p.getAs[Long]("doc_id_2"))._1)
    }
    // canonical member: exactly one keeper per cluster, the minimum id
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
      assert(members.count(_._2._3) == 1)
      assert(members.values.map(_._2).toSet == Set(members.size.toLong))
    }
    // one row per shingled document
    assert(clusters.size == docs
      .where(size(TextHashExpressions.shingleHashes(words(col("text")), 3)) > 0)
      .count())
  }

  test("star solver clusters == join-min clusters on the fixture, and " +
      "the small-graph fast path == the forced distributed loop") {
    def shape(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Boolean]("keep"))).toSeq
    val viaStar = shape(Dedup.minhashClustersStar(docs).collect())
    val viaJoinMin = shape(Dedup.minhashClusters(docs).collect())
    assert(viaStar == viaJoinMin)
    // the fixture's edge set is under the gate, so the calls above took
    // the union-find fast path; forcing the distributed join-min loop
    // (cap 0) must produce the identical labels — the bit-identity the
    // gate's contract rests on
    val viaLoop = shape(
      Dedup.minhashClusters(docs, smallGraphCap = 0L).collect())
    assert(viaLoop == viaJoinMin)
  }

  test("star solver handles an adversarial long chain (diameter >> rounds)") {
    import spark.implicits._
    // a 300-node path: join-min needs ~300 rounds (past its cap); the
    // star alternation must collapse it in O(log n). Cap 0 forces the
    // DISTRIBUTED loop (the gate would otherwise route this tiny graph
    // through union-find and leave the loop untested).
    val n = 300
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("doc_id_1", "doc_id_2")
    val labels = Dedup.connectedComponentsStar(nodes, edges,
      maxIters = 16, smallGraphCap = 0L).collect()
    assert(labels.length == n)
    assert(labels.forall(_.getAs[Long]("cluster_id") == 0L))
    // the gated fast path labels the same chain identically
    val viaUf = Dedup.connectedComponentsStar(nodes, edges).collect()
    assert(viaUf.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      labels.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // and disjoint singletons stay themselves
    val lone = Dedup.connectedComponentsStar(
      spark.range(5).select(col("id").as("doc_id")),
      Seq.empty[(Long, Long)].toDF("doc_id_1", "doc_id_2")).collect()
    assert(lone.forall(r =>
      r.getAs[Long]("cluster_id") == r.getAs[Long]("doc_id")))
    Dedup.releaseCaches()
  }

  test("simhash pairs: banding is EXACT at hamming <= 3 (pigeonhole), " +
      "wordless docs excluded") {
    val sig = Dedup.simhashWide(docs)
    val exact = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("long").as("hamming"))
      .where(col("hamming") <= Dedup.SimhashMaxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.simhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == exact)
    assert(exact.nonEmpty)
    // identical texts -> identical signatures -> a hamming-0 pair;
    // wordless docs carry no content evidence and never pair
    val tiny = spark.sql(
      """SELECT * FROM VALUES (1L,'alpha beta gamma delta'),
        |(2L,'alpha beta gamma delta'), (3L,''), (4L,'')
        |AS t(doc_id, text)""".stripMargin)
    val pairs = Dedup.simhashPairs(tiny).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("doc_id_1") == 1L &&
      pairs.head.getAs[Long]("doc_id_2") == 2L &&
      pairs.head.getAs[Long]("hamming") == 0L)
  }

  test("simhash wide signature is word-order invariant (bag-of-words) " +
      "and frequency-sensitive") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "epsilon delta gamma beta alpha"),   // permutation: same bag
      (3L, "alpha alpha beta gamma delta epsilon")) // extra copy: new bag
      .toDF("doc_id", "text")
    val sigs = Dedup.simhashWide(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("simhash: near-identical docs have close hamming distance") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |(1L,'alpha beta gamma delta epsilon zeta eta theta iota kappa'),
        |(2L,'alpha beta gamma delta epsilon zeta eta theta iota lambda'),
        |(3L,'one two three four five six seven eight nine ten')
        |AS t(doc_id, text)""".stripMargin)
    val h = Dedup.simhash(df).collect().map(_.getAs[Long]("simhash"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0), h(1)) < ham(h(0), h(2)))
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val rows = Dedup.embeddingNearDup(Tables(spark, sf, "embeddings")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("vec_id_1") < r.getAs[Long]("vec_id_2")))
    assert(rows.forall(_.getAs[Double]("cos_sim") >= 0.25))
  }

  test("LSH-blocked embedding near-dup ⊆ exact pairs; recall measures the gap") {
    import graft.operators.Ann
    val emb = Tables(spark, sf, "embeddings")
    val lsh = Dedup.embeddingNearDupLsh(emb).collect()
    assert(lsh.nonEmpty)
    assert(lsh.forall(r => r.getAs[Long]("vec_id_1") < r.getAs[Long]("vec_id_2")))
    assert(lsh.forall(_.getAs[Double]("cos_sim") >= 0.25))
    // every blocked pair genuinely shares its sign-LSH bucket
    val buckets = emb.select(col("vec_id"),
        Ann.bucketCol(col("embedding")).as("b")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("b")).toMap
    lsh.foreach { r =>
      assert(buckets(r.getAs[Long]("vec_id_1")) == r.getAs[Int]("bucket"))
      assert(buckets(r.getAs[Long]("vec_id_2")) == r.getAs[Int]("bucket"))
    }
    // recall row: n_lsh == |blocked set|, n_exact >= n_lsh, ratio exact
    val rec = Dedup.embeddingNearDupRecall(emb).head
    val (nExact, nLsh) = (rec.getAs[Long]("n_exact"), rec.getAs[Long]("n_lsh"))
    assert(nLsh == lsh.length.toLong)
    assert(nExact >= nLsh && nExact > 0)
    assert(rec.getAs[Double]("recall") == nLsh.toDouble / nExact.toDouble)
    // the exact side of recall subsumes the label-blocked ground truth
    assert(nExact >= Dedup.embeddingNearDup(emb).count())
  }

  test("semantic dedup: keep flags match the per-cell earlier-neighbour " +
      "ground truth; recall curve is well-formed") {
    import graft.operators.Ann
    val emb = Tables(spark, sf, "embeddings")
    val rows = Dedup.semanticDedup(emb).collect()
    assert(rows.length == emb.count().toInt)
    // recompute the ground truth locally with the kernels' own fold
    // order: sequential dot, cos = dot/(na·nb), cell from ivfAssign
    val asg = Ann.ivfAssign(emb, Ann.codebook(emb))
      .select(col("vec_id"), col("cent_id"), col("v")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cent_id"),
        r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc = acc + a(i) * b(i); i += 1 }
      acc
    }
    val norm = asg.map { case (id, _, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byCell = asg.groupBy(_._2)
    val dropped = byCell.values.flatMap { cell =>
      val sorted = cell.sortBy(_._1)
      for {
        i <- sorted.indices
        j <- (i + 1) until sorted.length
        (ida, _, va) = sorted(i)
        (idb, _, vb) = sorted(j)
        denom = norm(ida) * norm(idb)
        if denom > 0.0 && dot(va, vb) / denom >= 0.25
      } yield idb
    }.toSet
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Boolean]("keep") == !dropped.contains(id),
        s"keep flag mismatch for vec_id=$id")
    }
    // recall curve: ascending taus, counts shrink as tau tightens,
    // blocked counts never exceed exact, ratios are in [0, 1]
    val rec = Dedup.semanticDedupRecall(emb).collect()
    assert(rec.nonEmpty && rec.length <= Dedup.SemTaus.length)
    val taus = rec.map(_.getAs[Double]("tau"))
    assert(taus.sameElements(taus.sorted))
    val exacts = rec.map(_.getAs[Long]("n_exact"))
    assert(exacts.zip(exacts.tail).forall { case (a, b) => a >= b })
    rec.foreach { r =>
      val (ne, ns) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_sem"))
      assert(ns <= ne && ne > 0)
      val rc = r.getAs[Double]("recall")
      assert(rc >= 0.0 && rc <= 1.0)
    }
  }

  test("semantic recall audit slice: sampleMod measures exactly the " +
      "slice's pairs against the FULL corpus's codebook") {
    val emb = Tables(spark, sf, "embeddings")
    val full = Dedup.semanticDedupRecall(emb).collect()
      .map(r => r.getAs[Double]("tau") -> r.getAs[Long]("n_exact")).toMap
    val sliced = Dedup.semanticDedupRecall(emb, sampleMod = 2).collect()
    assert(sliced.nonEmpty)
    // the exact side is blocking-independent, so the sliced counts must
    // equal the recall of the pre-filtered input (≈ quarter the pairs),
    // proving the quadratic ground truth touched ONLY the slice
    val prefiltered = Dedup.semanticDedupRecall(
        emb.where(col("vec_id") % 2 === 0)).collect()
      .map(r => r.getAs[Double]("tau") -> r.getAs[Long]("n_exact")).toMap
    sliced.foreach { r =>
      val tau = r.getAs[Double]("tau")
      val ne = r.getAs[Long]("n_exact")
      assert(ne == prefiltered(tau), s"tau=$tau")
      assert(ne < full(tau), s"tau=$tau: slice must shrink the truth")
      val ns = r.getAs[Long]("n_sem")
      assert(ns <= ne)
    }
  }
}
