package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Banded sign-LSH similarity: recall vs the exact baseline on planted
  * near-duplicates, and candidate-set containment properties. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  /** n seeded unit-ish vectors + one perturbed near-copy (id + 10000) for
    * each of the first `planted` vectors. */
  private def corpus(n: Int, planted: Int): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(42)
    val base = (0 until n).map { i =>
      (i.toLong, Array.fill(Dim)(r.nextGaussian().toFloat))
    }
    val copies = base.take(planted).map { case (id, v) =>
      (id + 10000L, v.map(x => x + 0.05f * r.nextGaussian().toFloat))
    }
    base ++ copies
  }

  test("lshTopK finds planted near-duplicates with recall >= 0.9 (4 bands x 8 bits)") {
    val data = corpus(500, 50)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    val got = Similarity.lshTopK(df, queries, 5, bands = 4, bitsPerBand = 8)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = (0 until 50).count { i =>
      got.getOrElse(i + 10000L, Set.empty).contains(i.toLong)
    }
    assert(hits >= 45, s"recall ${hits / 50.0} below 0.9")
  }

  test("lshTopK results are a subset of brute-force candidates with exact scores") {
    val data = corpus(200, 20)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    val exact = Similarity.bruteForceTopK(df, queries, data.size)
      .select("q_id", "vec_id", "cos").as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    val approx = Similarity.lshTopK(df, queries, 5, bands = 4, bitsPerBand = 8)
      .select("q_id", "vec_id", "cos").as[(Long, Long, Double)].collect()
    // every LSH-scored pair carries the identical exact cosine
    approx.foreach { case (q, v, c) =>
      assert(exact.get((q, v)).contains(c), s"score mismatch for ($q,$v)")
    }
  }

  test("quantizedTopK finds planted near-duplicates with recall >= 0.9 (int8, rerank 4x)") {
    val data = corpus(500, 50)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    val got = Similarity.quantizedTopK(df, queries, 5, rerankFactor = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = (0 until 50).count { i =>
      got.getOrElse(i + 10000L, Set.empty).contains(i.toLong)
    }
    assert(hits >= 45, s"recall ${hits / 50.0} below 0.9")
  }

  test("quantizedTopK with a full-corpus rerank equals brute force exactly") {
    val data = corpus(200, 20)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    val exact = Similarity.bruteForceTopK(df, queries, 5)
      .select("q_id", "rank", "vec_id", "cos")
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    // rerankFactor covering the whole corpus → candidate filter is a no-op
    val got = Similarity.quantizedTopK(df, queries, 5, rerankFactor = data.size)
      .select("q_id", "rank", "vec_id", "cos")
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(got == exact)
  }

  test("nearestCentroidConfusion recovers planted label clusters") {
    // three well-separated direction clusters; label = cluster
    val r = new scala.util.Random(77)
    val centers = Seq.fill(3)(Array.fill(Dim)(r.nextGaussian().toFloat * 3f))
    val data = (0 until 300).map { i =>
      val c = i % 3
      (i.toLong,
        centers(c).map(x => x + 0.2f * r.nextGaussian().toFloat), c)
    }
    val df = data.toDF("vec_id", "embedding", "label")
    val got = Similarity.nearestCentroidConfusion(df)
      .as[(Int, Int, Long)].collect()
    val correct = got.filter(t => t._1 == t._2).map(_._3).sum
    assert(correct >= 295, s"only $correct/300 on diagonal: ${got.toSeq}")
    assert(got.map(_._3).sum == 300)
  }

  test("ivfTopK finds planted near-duplicates with recall >= 0.9 (nlist=n/25, nprobe=4)") {
    val data = corpus(500, 50)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    val got = Similarity.ivfTopK(df, queries, 5,
        centroidStride = 25, centroidOffset = 7, nprobe = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = (0 until 50).count { i =>
      got.getOrElse(i + 10000L, Set.empty).contains(i.toLong)
    }
    assert(hits >= 45, s"recall ${hits / 50.0} below 0.9")
  }

  test("k-means-refined centroids keep IVF recall >= 0.9 and a stable index shape") {
    val data = corpus(500, 50)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    val seedCount = df.filter(pmod(col("vec_id"), lit(25)) === 7).count()
    val cent = Similarity.kMeansCentroids(df,
      centroidStride = 25, centroidOffset = 7, iters = 2)
    val rows = cent.select("c_id", "c_vec")
      .as[(Long, Array[Float])].collect()
    // refinement never shrinks or grows the list count, and keeps dim
    assert(rows.length == seedCount)
    assert(rows.forall(_._2.length == Dim))
    val got = Similarity.ivfTopKWith(df, queries, 5, cent, nprobe = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = (0 until 50).count { i =>
      got.getOrElse(i + 10000L, Set.empty).contains(i.toLong)
    }
    assert(hits >= 45, s"recall ${hits / 50.0} below 0.9")
  }

  test("ivfTopK scores are exact cosines and each query returns at most k rows") {
    val data = corpus(200, 20)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    val exact = Similarity.bruteForceTopK(df, queries, data.size)
      .select("q_id", "vec_id", "cos").as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    val approx = Similarity.ivfTopK(df, queries, 5,
        centroidStride = 25, centroidOffset = 7, nprobe = 4)
      .select("q_id", "rank", "vec_id", "cos").as[(Long, Int, Long, Double)].collect()
    approx.foreach { case (q, _, v, c) =>
      assert(exact.get((q, v)).contains(c), s"score mismatch for ($q,$v)")
    }
    approx.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 5, s"query $q returned ${rows.length} rows")
      assert(rows.map(_._2).sorted.sameElements(1 to rows.length))
    }
  }

  test("codegen CosineSimilarity is bit-identical to the HOF composition") {
    import graft.functions.VectorFunctions
    val data = corpus(100, 0)
    val pairs = data.zip(data.reverse).map { case ((ia, va), (ib, vb)) =>
      (ia, ib, va, vb)
    }
    val df = pairs.toDF("a_id", "b_id", "a", "b")
    val got = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("c1"),
      VectorFunctions.cosineHof(col("a"), col("b")).as("c2"))
      .as[(Double, Double)].collect()
    // exact double equality, not approximate — same fold order, same widening
    got.foreach { case (c1, c2) => assert(c1 == c2) }
    assert(got.nonEmpty)
  }

  test("lshNearDupPairs finds planted pairs and never fabricates high-cos pairs") {
    val data = corpus(300, 30)
    val df = data.toDF("vec_id", "embedding")
    val pairs = Similarity.lshNearDupPairs(df, bands = 4, bitsPerBand = 8,
        minCosine = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val found = (0 until 30).count(i => pairs.contains((i.toLong, i + 10000L)))
    assert(found >= 27, s"planted-pair recall ${found / 30.0} below 0.9")
    // no pair below the threshold may appear (exact re-scoring filters)
    val scored = Similarity.lshNearDupPairs(df, bands = 4, bitsPerBand = 8,
        minCosine = 0.9).select("cos").as[Double].collect()
    assert(scored.forall(_ >= 0.9))
  }

  test("lshIncrement (vec): landed dups drop first; batch clusters keep min id") {
    val r = new scala.util.Random(7)
    def v(): Array[Float] = Array.fill(Dim)(r.nextGaussian().toFloat)
    def near(a: Array[Float]): Array[Float] =
      a.map(x => x + 0.02f * r.nextGaussian().toFloat)
    val a = v(); val b = v()
    // landed: vector 1 (=a) + unrelated fillers
    val landed = (Seq((1L, a)) ++ (2L to 20L).map(i => (i, v())))
      .toDF("vec_id", "embedding")
    // incoming: 101 ≈ landed a -> landed_dup; 102 ≈ 103 (cluster, min
    // keeps, 103 batch_dup); 104 unique -> keep
    val incoming = Seq(
      (101L, near(a)), (102L, b), (103L, near(b)), (104L, v()))
      .toDF("vec_id", "embedding")
    val got = Similarity.lshIncrement(landed, incoming,
        bands = 4, bitsPerBand = 8, minCosine = 0.9)
      .as[(Long, String)].collect().toMap
    assert(got == Map(101L -> "landed_dup", 102L -> "keep",
      103L -> "batch_dup", 104L -> "keep"))
  }

  test("lshIncrement (vec): batch dup of a landed dup is not double-counted") {
    val r = new scala.util.Random(11)
    def v(): Array[Float] = Array.fill(Dim)(r.nextGaussian().toFloat)
    def near(a: Array[Float]): Array[Float] =
      a.map(x => x + 0.02f * r.nextGaussian().toFloat)
    val a = v()
    val landed = (Seq((1L, a)) ++ (2L to 10L).map(i => (i, v())))
      .toDF("vec_id", "embedding")
    // both incoming vectors are near the landed one (and each other):
    // BOTH must read landed_dup — the batch-pair branch only runs over
    // vectors that survived the landed screen
    val incoming = Seq((101L, near(a)), (102L, near(a)), (103L, v()))
      .toDF("vec_id", "embedding")
    val got = Similarity.lshIncrement(landed, incoming,
        bands = 4, bitsPerBand = 8, minCosine = 0.9)
      .as[(Long, String)].collect().toMap
    assert(got == Map(101L -> "landed_dup", 102L -> "landed_dup",
      103L -> "keep"))
  }

  test("hardNegatives excludes above-threshold neighbors, ranks the rest") {
    // corpus with planted near-copies: the copy of query 0 has cos ≈ 1
    // and must NOT appear among its hard negatives, while plain top-k
    // would rank it first
    val df = corpus(50, planted = 5).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" === 0L)
    val plain = Similarity.bruteForceTopK(df, queries, 5)
      .select("vec_id").as[Long].collect().toSet
    assert(plain.contains(10000L), "sanity: the near-copy tops plain top-k")
    val hard = Similarity.hardNegatives(df, queries, 5, posThreshold = 0.9)
      .select($"rank", $"vec_id", $"cos").as[(Int, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(hard.size == 5)
    assert(!hard.exists(_._2 == 10000L), "near-copy excluded as presumed positive")
    assert(hard.forall(_._3 < 0.9))
    // still the MOST similar eligible ones: descending cosine order
    assert(hard.map(_._3) == hard.map(_._3).sorted.reverse)
  }

  test("embeddingDimStats: hand-computed integer moments per dimension") {
    val emb = Seq(
      (1L, Seq(0.5f, -0.25f)),
      (2L, Seq(0.1f, 0.75f))).toDF("vec_id", "embedding")
    val got = Similarity.embeddingDimStats(emb)
      .orderBy("pos")
      .select("pos", "n", "sum_e6", "sumsq_e12")
      .as[(Int, Long, Long, Double)].collect().toSeq
    // e6 quantization: 0.5→500000, -0.25→-250000, 0.1f→100000 (the
    // float 0.1 is 0.100000001…; floor(·1e6 + 0.5) still lands 100000),
    // 0.75→750000
    assert(got == Seq(
      (0, 2L, 600000L, 2.6e11),
      (1, 2L, 500000L, 6.25e11)), got.toString)
  }

  test("semanticDedup: within-cluster CC keeps min id; cross-cluster untouched") {
    // centroids = ids % 3 == 0 -> {0, 3}. By cosine: 0,1,2 assign to
    // c0; 3,4 to c3; 5 is orthogonal to both (cos 0 each, tie -> c0)
    // but below 0.3 against every c0 member -> singleton.
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.99f, 0.1f, 0f, 0f)),
      (2L, Seq(0.98f, 0.15f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)),
      (4L, Seq(0f, 0f, 0.9f, 0.1f)),
      (5L, Seq(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedupFlat(emb, centroidStride = 3,
        centroidOffset = 0, minCosine = 0.3)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, true), (1L, 0L, false), (2L, 0L, false),
      (3L, 3L, true), (4L, 3L, false), (5L, 5L, true)), got.toString)
  }

  test("semanticDedupIncrement: landed dups drop first; batch pairs keep min id") {
    // landed {0, 2}; stride-2 codebook = {c0=(1,0,0,0), c2=(0,0,1,0)}
    val landed = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val batch = Seq(
      (1L, Seq(0.99f, 0.1f, 0f, 0f)),  // c0-mate, cos(v0)=.995 -> landed_dup
      (3L, Seq(0f, 0.1f, 0.99f, 0f)),  // c2-mate, cos(v2)=.995 -> landed_dup
      (5L, Seq(0.2f, 0.98f, 0f, 0f)),  // c0-mate, cos(v0)=.2 < .3 -> survives
      (7L, Seq(0.15f, 0.99f, 0f, 0f)), // c0-mate, cos(v5)=.999 -> pair {5,7}
      (9L, Seq(0f, 0f, 0f, 1f)))       // orthogonal everywhere -> keep
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDedupIncrementFlat(landed, batch,
        centroidStride = 2, centroidOffset = 0)
      .orderBy("vec_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "landed_dup"), (3L, "landed_dup"),
      (5L, "keep"), (7L, "batch_dup"), (9L, "keep")), got.toString)
  }

  test("semanticDedup never merges across clusters even at high cosine") {
    // 1 and 4 are near-identical but stride-assigned to different
    // centroids (0->c0, 4->c3 by construction of the vectors below):
    // SemDeDup's trade — cross-cluster dups are invisible by design,
    // the price of the n·B comparison bound.
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.6f, 0f, 0.59f, 0f)), // nearest c0 (0.713 vs 0.701)
      (3L, Seq(0f, 0f, 1f, 0f)),
      (4L, Seq(0.59f, 0f, 0.6f, 0f))). // nearest c3 — 0.01 from 1
      toDF("vec_id", "embedding")
    val got = Similarity.semanticDedupFlat(emb, centroidStride = 3,
        centroidOffset = 0, minCosine = 0.3)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    // 1 pairs with 0 (cos 0.713 >= 0.3) inside c0; 4 pairs with 3
    // inside c3; the 0.9998-cosine (1,4) pair never forms
    assert(got == Seq(
      (0L, 0L, true), (1L, 0L, false),
      (3L, 3L, true), (4L, 3L, false)), got.toString)
  }

  test("semanticDedupTwoLevel: hand-computed two-hop assignment and verdicts") {
    // fine = even ids {0,2,4,6}; coarse = ids % 4 == 0 -> {0,4}.
    // Routing: 2 -> g0 (cos .9939), 6 -> g4; cells g0={0,2}, g4={4,6}.
    // Hop 1 / hop 2 (4-decimal rounding): 1 -> g0 -> c0 (.9986 vs
    // .9983 for c2); 3 -> g4 -> c4; 5 -> g4 (.7348 vs .6783) -> c4
    // (.7348 vs .7303 for c6); 7 orthogonal -> tie to g0, tie to c0,
    // but verifies below 0.3 against {0,1} -> singleton.
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.95f, 0.05f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f, 0f)),
      (3L, Seq(0.1f, 0f, 0.95f, 0f)),
      (4L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(0.6f, 0f, 0.65f, 0f)),
      (6L, Seq(0f, 0.1f, 0.9f, 0f)),
      (7L, Seq(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedupTwoLevel(emb, fineStride = 2,
        fineOffset = 0, coarseFactor = 2, minCosine = 0.3)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    // c0={0,1,7}: (0,1) verifies, 7 does not; c2={2} (its own nearest
    // fine is itself); c4={3,4,5}: all pairs verify -> label 3; c6={6}
    assert(got == Seq(
      (0L, 0L, true), (1L, 0L, false), (2L, 2L, true),
      (3L, 3L, true), (4L, 3L, false), (5L, 3L, false),
      (6L, 6L, true), (7L, 7L, true)), got.toString)
  }

  test("semanticDedupTwoLevel: single coarse cell degenerates to the flat face") {
    // coarseFactor large enough that exactly one coarse centroid
    // exists -> every fine centroid routes to its one cell and the
    // cell-local argmax IS the flat argmax: outputs must be identical.
    val df = corpus(60, 6).toDF("vec_id", "embedding")
    val flat = Similarity.semanticDedupFlat(df, centroidStride = 10,
        centroidOffset = 7, minCosine = 0.3)
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect().toSeq
    val two = Similarity.semanticDedupTwoLevel(df, fineStride = 10,
        fineOffset = 7, coarseFactor = 6, minCosine = 0.3)
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(two == flat)
  }

  test("semanticDedupTwoLevel: total assignment and high agreement with flat") {
    // The IVF approximation: a vector whose nearest fine centroid
    // routes to a different coarse cell gets its cell-local argmax.
    // Routing quality is a property of cluster STRUCTURE — on
    // isotropic noise every cosine is ≈0 and both hops argmax over
    // noise (measured: ~66% agreement on the gaussian `corpus`; a flat
    // 20-orthogonal-center mixture still leaves hop 1 unstructured,
    // measured ~82%) — the known IVF failure mode, not this
    // operator's. The agreement contract is stated, and asserted, on
    // the geometry two-level assumes: HIERARCHICAL structure — 4
    // super-clusters × 5 clusters × 25 members, ids arranged so the
    // coarse stride (≡7 mod 125 → true clusters 0,5,10,15) picks one
    // coarse centroid per super-cluster.
    val r = new scala.util.Random(7)
    val supers = Seq.fill(4)(Array.fill(Dim)(r.nextGaussian().toFloat))
    val centers = for (s <- 0 until 4; _ <- 0 until 5) yield
      supers(s).map(x => x + 0.6f * r.nextGaussian().toFloat)
    val data = for (c <- 0 until 20; j <- 0 until 25) yield
      ((c * 25 + j).toLong,
        centers(c).map(x => x + 0.15f * r.nextGaussian().toFloat))
    val df = data.toDF("vec_id", "embedding")
    val flat = Similarity.semanticDedupFlat(df, centroidStride = 25,
        centroidOffset = 7, minCosine = 0.3)
      .select("vec_id", "sem_cluster").as[(Long, Long)].collect().toMap
    val two = Similarity.semanticDedupTwoLevel(df, fineStride = 25,
        fineOffset = 7, coarseFactor = 5, minCosine = 0.3)
      .select("vec_id", "sem_cluster").as[(Long, Long)].collect().toMap
    assert(two.size == 500, s"not total: ${two.size} of 500")
    assert(two.keySet == flat.keySet)
    val agree = two.count { case (id, c) => flat(id) == c }
    assert(agree >= 475, s"agreement $agree/500 below 0.95")
  }

  test("semanticDedupIncrementTwoLevel: single coarse cell equals the flat face") {
    // coarse stride 60 leaves exactly one landed coarse centroid (id 7;
    // the 10000+ planted copies miss ≡7 mod 60), so the two-level
    // incremental face must reproduce the flat face verdict for
    // verdict.
    val df = corpus(60, 6).toDF("vec_id", "embedding")
    val landed = df.filter(pmod(col("vec_id"), lit(5L)) =!= 3)
    val batch = df.filter(pmod(col("vec_id"), lit(5L)) === 3)
    val flat = Similarity.semanticDedupIncrementFlat(landed, batch,
        centroidStride = 10, centroidOffset = 7)
      .orderBy("vec_id").as[(Long, String)].collect().toSeq
    val two = Similarity.semanticDedupIncrementTwoLevel(landed, batch,
        fineStride = 10, fineOffset = 7, coarseFactor = 6)
      .orderBy("vec_id").as[(Long, String)].collect().toSeq
    assert(two == flat)
  }

  test("semanticDedupTwoLevelWith: k-means-refined codebooks keep output total") {
    // the production pairing: fine = k-means refinement of the stride
    // seed, coarse = its stride subset; the plan must stay total (one
    // row per vector, keep = component minimum) with ANY codebook.
    val df = corpus(200, 10).toDF("vec_id", "embedding")
    val fine = Similarity.kMeansCentroids(df, centroidStride = 20,
      centroidOffset = 7, iters = 1)
    val coarse = fine.filter(pmod(col("c_id"), lit(60L)) === 7)
      .select(col("c_id").as("g_id"), col("c_vec").as("g_vec"))
    val got = Similarity.semanticDedupTwoLevelWith(df, fine, coarse,
        minCosine = 0.3)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.size == 210, s"not total: ${got.size}")
    assert(got.map(_._1).distinct.size == 210)
    got.foreach { case (id, cl, keep) => assert(keep == (id == cl)) }
  }

  test("pqTopK finds planted near-duplicates with high recall") {
    val data = corpus(500, 50)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    val got = Similarity.pqTopK(df, queries, 5, m = 4,
        codeStride = 25, codeOffset = 7, rerankFactor = 8)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = (0 until 50).count { i =>
      got.getOrElse(i + 10000L, Set.empty).contains(i.toLong)
    }
    // PQ at m=4 over 64 dims with a ~21-codeword stride codebook is a
    // coarse sketch; a planted 0.05-noise copy still dominates the ADC
    // score. Bound set by measurement with margin.
    assert(hits >= 40, s"recall ${hits / 50.0} below 0.8")
  }

  test("ivfPqTopK: planted near-dup recall vs exact truth; exact rerank cosines") {
    val data = corpus(500, 50)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    val got = Similarity.ivfPqTopK(df, queries, 5, nprobe = 4, m = 4,
        codeStride = 25, codeOffset = 7, ivfStride = 50, ivfOffset = 11,
        rerankFactor = 8)
      .select("q_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect().toSeq
    // recall vs q21's exact truth: a planted 0.05-noise copy must
    // survive BOTH the IVF probe (its cell among the query's top-4)
    // and the ADC shortlist. IVF adds the probe-miss term on top of
    // pqTopK's sketch error, so the bound is set by measurement with
    // margin below the flat-PQ spec's 0.8.
    val byQ = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = (0 until 50).count { i =>
      byQ.getOrElse(i + 10000L, Set.empty).contains(i.toLong)
    }
    assert(hits >= 35, s"recall ${hits / 50.0} below 0.7")
    // rerank cosines are exact (q21's scorer), never the ADC estimate
    val exact = Similarity.bruteForceTopK(df, queries, 550)
      .select("q_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    got.foreach { case (q, v, c) =>
      assert(v != q); assert(exact((q, v)) == c, s"($q,$v)")
    }
  }

  test("ivfPqIncrement: reproduces the landed-codebook one-shot exactly") {
    val df = corpus(500, 50).toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    // batch ids avoid BOTH stride residues (7 mod 25, 11 mod 50), so
    // the union-sourced codebooks coincide with the landed-sourced
    // ones and the incremental face must equal ivfPqTopK on the union
    // bit-for-bit — the append path introduces zero drift
    val batchIds = Seq(13L, 113L, 213L, 313L, 413L)
    val batch = df.filter(col("vec_id").isin(batchIds: _*))
    val landed = df.filter(!col("vec_id").isin(batchIds: _*))
    val inc = Similarity.ivfPqIncrement(landed, batch, queries, 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val one = Similarity.ivfPqTopK(df, queries, 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(inc == one, s"diff: ${(inc diff one) ++ (one diff inc)}")
  }

  test("servedNdcg: exhaustive probe serves the ideal exactly (ndcg = 1e6)") {
    val df = corpus(200, 20).toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    // nprobe covers every coarse cell and the rerank cut exceeds the
    // corpus: the shortlist contains the exact top-k, the rerank is
    // the exact scorer, so served ≡ ideal and dcg folds to idcg
    val full = Similarity.servedNdcg(df, queries, 5,
        nprobe = 100, rerankFactor = 100)
      .select("q_id", "dcg", "idcg", "ndcg_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(full.size == 20, full.size.toString)
    assert(full.forall(r => r._2 == r._3 && r._4 == 1000000L),
      full.filterNot(r => r._4 == 1000000L).toString)
    // the default narrow config can only lose gain: ndcg in [0, 1e6]
    val dflt = Similarity.servedNdcg(df, queries, 5)
      .select("q_id", "ndcg_ppm").as[(Long, Long)].collect().toSeq
    assert(dflt.size == 20 &&
      dflt.forall(r => r._2 >= 0L && r._2 <= 1000000L), dflt.toString)
  }

  test("semanticThresholdSweep: hand-checked retention per cosine threshold") {
    // one fine cell (centroid id 7 ≡ 7 mod 25 and mod 125): pairs
    // (1,2)=1.0, (1,3)=(2,3)=(3,7)=0.6, (1,7)=(2,7)=1.0
    val docs = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.6f, 0.8f)),
      (7L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticThresholdSweep(docs,
        Seq(5000, 8000, 9999))
      .orderBy("thr_e4")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (5000L, 3L, 1L),   // 2, 3 and 7 all have a ≥0.5 lower-id mate
      (8000L, 2L, 2L),   // 3 survives: its best lower-id cosine is 0.6
      (9999L, 2L, 2L)),  // exact dups still flagged at the top setting
      got.toString)
  }

  test("sampleCoverage: per-cell proportionality ratio, exact integers") {
    // two fine cells (centroids 7 dir-A, 32 dir-B; coarse = {7}):
    // cell 7 = {1,2,7}, cell 32 = {11,12,32}; sample = {1,11,12} →
    // rep(7) = 1·6e6/(3·3) = 666666, rep(32) = 2·6e6/(3·3) = 1333333
    val a = Seq(1.0f, 0.0f); val b = Seq(0.0f, 1.0f)
    val emb = Seq((1L, a), (2L, a), (7L, a), (11L, b), (12L, b), (32L, b))
      .toDF("vec_id", "embedding")
    // sample id 99 matches no corpus vector → the dangling sentinel
    val sample = emb.filter(col("vec_id").isin(1L, 11L, 12L))
      .select("vec_id")
      .unionByName(Seq(99L).toDF("vec_id"))
    val got = Similarity.sampleCoverage(emb, sample)
      .orderBy("c_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (-1L, 0L, 1L, None),
      (7L, 3L, 1L, Some(666666L)),
      (32L, 3L, 2L, Some(1333333L))), got.toString)
  }

  test("semanticStratSample: k smallest hash60 per cell, deterministic") {
    val a = Seq(1.0f, 0.0f); val b = Seq(0.0f, 1.0f)
    val emb = Seq((1L, a), (2L, a), (7L, a), (11L, b), (12L, b), (32L, b))
      .toDF("vec_id", "embedding")
    // hash order within cell 7: 7 < 1 < 2; within cell 32: 32 < 11 < 12
    val got = Similarity.semanticStratSample(emb, k = 2)
      .orderBy("c_id", "rk")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (7L, 7L, 1L), (1L, 7L, 2L),
      (32L, 32L, 1L), (11L, 32L, 2L)), got.toString)
  }

  test("semanticSafeSplit: whole cluster shares one deterministic side") {
    // all four vectors form one CC at minCosine 0.3 (label 1);
    // hash60("1") % 100 = 48 → train at pct 50, eval at pct 40
    val docs = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.6f, 0.8f)), (7L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val s50 = Similarity.semanticSafeSplit(docs, trainPct = 50)
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(s50.map(_._1) == Seq(1L, 2L, 3L, 7L), s50.toString)
    assert(s50.map(_._2).distinct == Seq(1L), s50.toString)
    assert(s50.map(_._3).distinct == Seq("train"), s50.toString)
    val s40 = Similarity.semanticSafeSplit(docs, trainPct = 40)
      .as[(Long, Long, String)].collect().toSeq
    assert(s40.map(_._3).distinct == Seq("eval"), s40.toString)
  }

  test("semanticSafeSplitPinned: a landed append can never flip a released doc's side") {
    // One fine centroid (id 7; ≡7 mod 25) → one cell, so clusters are
    // pure cosine CCs. Landed: A={7,10,11} (label 7, hash60("7")%100=55
    // → train at 80), B={1,2} (label 1 → 48 → train). The append adds
    // id 0 into A — min-label relabels A to 0, and hash60("0")%100=98
    // → the NAIVE recompute flips every released A doc to eval. The
    // pinned face must not: released docs keep their side, the new
    // member inherits from min-id pinned cluster-mate 7, and the
    // genuinely-new orthogonal cluster {3} hashes fresh.
    val a = Seq(1f, 0f, 0f); val b = Seq(0f, 1f, 0f); val c = Seq(0f, 0f, 1f)
    val landed = Seq((1L, b), (2L, b), (7L, a), (10L, a), (11L, a))
      .toDF("vec_id", "embedding")
    val grown = Seq((0L, a), (1L, b), (2L, b), (3L, c),
      (7L, a), (10L, a), (11L, a)).toDF("vec_id", "embedding")
    graft.util.CacheRegistry.releaseAll()
    val pinned = Similarity.pinnedSemanticSplit(landed, 80)
    val naive = Similarity.semanticSafeSplit(grown, trainPct = 80)
      .select("vec_id", "split").as[(Long, String)].collect().toMap
    // the failure mode being fixed, demonstrated: naive flips A
    assert(naive(7L) == "eval" && naive(10L) == "eval", naive.toString)
    assert(naive(1L) == "train", naive.toString)
    val got = Similarity.semanticSafeSplitPinned(grown, pinned, 80)
      .orderBy("vec_id")
      .as[(Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, "train", "inherited"),
      (1L, 1L, "train", "pinned"),
      (2L, 1L, "train", "pinned"),
      (3L, 3L, "train", "fresh"),
      (7L, 0L, "train", "pinned"),
      (10L, 0L, "train", "pinned"),
      (11L, 0L, "train", "pinned")), got.toString)
    // the absolute invariant, stated as such: every released id keeps
    // its pinned side verbatim
    val pinMap = pinned.as[(Long, String)].collect().toMap
    got.filter(r => pinMap.contains(r._1))
      .foreach(r => assert(r._3 == pinMap(r._1), r.toString))
    graft.util.CacheRegistry.releaseAll()
  }

  test("rotatePinnedSplit: pin transitivity — releases survive two appends") {
    // pin0 over landed {1,2,7,10,11} (clusters A={7,10,11}→train,
    // B={1,2}→train, as the pinned spec above); append 1 adds 0 (joins
    // A, relabels it 0) and 3 (fresh C, hash60("3")=23→train); pin1 =
    // the rotation. Append 2 adds 4 (joins A — must inherit through
    // pin1's min-id member 0) and 5 (fresh D, hash60("5")=64→train at
    // 80). Every pin0 doc AND every pin1 doc keeps its side verbatim.
    val a = Seq(1f, 0f, 0f, 0f); val b = Seq(0f, 1f, 0f, 0f)
    val c = Seq(0f, 0f, 1f, 0f); val d = Seq(0f, 0f, 0f, 1f)
    val landed = Seq((1L, b), (2L, b), (7L, a), (10L, a), (11L, a))
      .toDF("vec_id", "embedding")
    val grown1 = Seq((0L, a), (1L, b), (2L, b), (3L, c),
      (7L, a), (10L, a), (11L, a)).toDF("vec_id", "embedding")
    val grown2 = Seq((0L, a), (1L, b), (2L, b), (3L, c), (4L, a),
      (5L, d), (7L, a), (10L, a), (11L, a)).toDF("vec_id", "embedding")
    graft.util.CacheRegistry.releaseAll()
    val pin0 = Similarity.pinnedSemanticSplit(landed, 80)
    val pin1 = Similarity.rotatePinnedSplit(grown1, pin0, 80, "rel1")
    val pin1Map = pin1.as[(Long, String)].collect().toMap
    val got = Similarity.semanticSafeSplitPinned(grown2, pin1, 80)
      .orderBy("vec_id")
      .as[(Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, "train", "pinned"),
      (1L, 1L, "train", "pinned"),
      (2L, 1L, "train", "pinned"),
      (3L, 3L, "train", "pinned"),
      (4L, 0L, "train", "inherited"),
      (5L, 5L, "train", "fresh"),
      (7L, 0L, "train", "pinned"),
      (10L, 0L, "train", "pinned"),
      (11L, 0L, "train", "pinned")), got.toString)
    // transitivity stated twice over: pin0 ⊆ pin1 verbatim, and the
    // final release matches pin1 verbatim on every pin1 member
    val pin0Map = pin0.as[(Long, String)].collect().toMap
    pin0Map.foreach { case (id, s) => assert(pin1Map(id) == s, s"$id") }
    got.filter(r => pin1Map.contains(r._1))
      .foreach(r => assert(r._3 == pin1Map(r._1), r.toString))
    graft.util.CacheRegistry.releaseAll()
  }

  test("embeddingHealthReport: planted pathologies counted, healthy rows profiled") {
    val rows: Seq[(Long, Array[Float])] = Seq(
      1L -> Array(3f, 4f),                  // norm 5 -> ne4 50000
      2L -> Array(0f, 0f),                  // zero norm
      3L -> Array(Float.NaN, 1f),           // non-finite
      4L -> Array(Float.PositiveInfinity, 0f), // non-finite
      5L -> null,                           // null row
      6L -> Array(1f, 0f, 0f))              // dim mismatch, norm 1
    // a NULL element INSIDE a vector is a caught pathology, not a
    // silently unprofiled row (primitive Array[Float] can't hold one,
    // so the hole is planted column-wise)
    val withHole = rows.toDF("vec_id", "embedding").unionByName(
      Seq(7L).toDF("vec_id").select(col("vec_id"),
        array(lit(1f), lit(null).cast("float")).as("embedding")))
    val got = Similarity.embeddingHealthReport(withHole)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(got == ((7L, 1L, 3L, 1L, 2L, 3L, 0L, 50000L, 60000L)),
      got.toString)
  }

  test("codebookDrift: replayed landed multiset reads exactly 1e6; shifted batch drifts above") {
    val landedRows = (0L until 20L).map(i =>
      (i, Array(1f, 0.2f * (i % 4).toFloat, 0.1f, 0f)))
    val landed = landedRows.toDF("vec_id", "embedding")
    // batch replicating the landed vector multiset: identical residual
    // sums and counts, so the cross-multiplied ratio is EXACTLY 1e6
    val same = landedRows.map { case (id, v) => (id + 100L, v) }
      .toDF("vec_id", "embedding")
    val r1 = Similarity.codebookDrift(landed, same,
        ivfStride = 4, ivfOffset = 1)
      .orderBy("grp")
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(r1.map(_._1) == Seq("batch", "landed"), r1.toString)
    assert(r1(1)._5.isEmpty, r1.toString) // landed row carries no drift
    assert(r1(0)._5.contains(1000000L), r1.toString)
    assert(r1(0)._2 == 20L && r1(1)._2 == 20L, r1.toString)
    // near-orthogonal batch: quantizes far worse than the codebook's
    // own corpus — the monitor must read well above 1e6
    val ortho = (0L until 20L).map(i =>
        (i + 100L, Array(0f, 0f, 0.1f * (i % 3).toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.codebookDrift(landed, ortho,
        ivfStride = 4, ivfOffset = 1)
      .filter(col("grp") === "batch")
      .as[(String, Long, Long, Long, Option[Long])].collect().head
    assert(r2._5.exists(_ > 1000000L), r2.toString)
    assert(r2._4 >= r2._3, r2.toString) // max residual >= mean residual
  }

  test("ivfPqRecall: monotone in nprobe and rerank, one row per config") {
    val data = corpus(500, 50)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    val got = Similarity.ivfPqRecall(df, queries, 5,
        configs = Seq((1, 4), (2, 4), (4, 4), (2, 1)))
      .orderBy("nprobe", "rerank_factor")
      .as[(Int, Int, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) ==
      Seq((1, 4), (2, 1), (2, 4), (4, 4)), got.toString)
    val byCfg = got.map(r => (r._1, r._2) -> r._5).toMap
    // widening the probe can only add candidates; widening the
    // shortlist can only add rerank survivors — recall is monotone in
    // each dial separately (pooled counts, same truth denominator)
    assert(byCfg((1, 4)) <= byCfg((2, 4)), byCfg.toString)
    assert(byCfg((2, 4)) <= byCfg((4, 4)), byCfg.toString)
    assert(byCfg((2, 1)) <= byCfg((2, 4)), byCfg.toString)
    // every truth row is counted exactly once per config
    assert(got.forall(r => r._3 == got.head._3 && r._4 <= r._3),
      got.toString)
  }

  test("powerIterationTop: hand-computed rounds, negative components, anchor") {
    // 3 rows on axis 0 + 1 half-scale row on axis 1:
    // A·v0 → y = (3e18, 2.5e17); v1 = (1e6, 2.5e17·1e6 div 3e18)
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val r1 = Similarity.powerIterationTop(df, iters = 1)
      .as[(Int, Long)].collect().toMap
    assert(r1 == Map(0 -> 1000000L, 1 -> 83333L), r1.toString)
    // round 2: s = (1e12 ×3, 5e5·83333); y = (3e18, 5e5·41666500000)
    val r2 = Similarity.powerIterationTop(df, iters = 2)
      .as[(Int, Long)].collect().toMap
    assert(r2 == Map(0 -> 1000000L, 1 -> 6944L), r2.toString)
    // anti-correlated dims renormalize with their sign intact
    val neg = Seq((1L, Seq(1.0f, -0.5f))).toDF("vec_id", "embedding")
    val rn = Similarity.powerIterationTop(neg, iters = 1)
      .as[(Int, Long)].collect().toMap
    assert(rn == Map(0 -> 1000000L, 1 -> -500000L), rn.toString)
  }

  test("varianceExplained: rank-1 corpus reads exactly 1e6 ppm; mixes read less") {
    // all mass on axis 0: v = (1e6, 0); λ = Σs²/vᵀv = trace exactly
    val rank1 = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r1 = Similarity.varianceExplained(rank1, iters = 1)
      .as[(Long, Long, Long, Long)].collect().head
    // per-vector means: (1e24 + 2.5e23) div (1e12·2) = 6.25e11 both
    assert(r1 == (625000000000L, 625000000000L, 1000000L, 2L),
      r1.toString)
    // an orthogonal second axis pulls the ratio strictly below 1e6
    val mixed = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val rm = Similarity.varianceExplained(mixed, iters = 2)
      .as[(Long, Long, Long, Long)].collect().head
    assert(rm._3 < 1000000L && rm._3 > 500000L, rm.toString)
    assert(rm._1 < rm._2 && rm._4 == 3L, rm.toString)
  }

  test("pcaProjection: exact e12 products along the iterated direction") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val p = Similarity.pcaProjection(df, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(p == Map(1L -> 1000000000000L, 2L -> 1000000000000L,
      3L -> 1000000000000L, 4L -> 41666500000L), p.toString)
  }

  test("pqTopK scores are exact cosines, at most k rows per query, no self") {
    val data = corpus(200, 20)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") >= 10000L)
    val rows = Similarity.pqTopK(df, queries, 5)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val exact = Similarity.bruteForceTopK(df, queries, 220)
      .select("q_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.size <= 5)
      assert(rs.map(_._2).sorted == (1 to rs.size))
      rs.foreach { case (qid, _, vid, cos) =>
        assert(vid != qid)
        // rerank recomputes the exact rounded cosine
        assert(exact((qid, vid)) == cos, s"($qid,$vid)")
      }
    }
  }
}
