package graft

import org.apache.spark.sql.functions._

import graft.ops.{LlmDedup, LlmSim}

/** Ground-truth checks for the non-oracled LLM operators (FIXTURES.md §4):
  * planted near-duplicates for the fuzzy dedup family, recall for LSH ANN,
  * bounds for the HLL sketch. */
class LlmOpsSpec extends SparkSuite {
  import spark.implicits._

  private val baseText =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "under the warm table near the old stone wall by the river bank"

  /** Corpus with two planted near-dup pairs and unrelated filler. */
  private def planted = Seq(
    (1L, baseText, "en"),
    (2L, baseText.replace("quick", "fast"), "en"),          // near-dup of 1
    (3L, "completely different words about spark catalyst optimizer plans and shuffles and joins and aggregates and exchanges and partitions and codegen stages running for scale on large clusters", "en"),
    (4L, "completely different words about spark catalyst optimizer plans and shuffles and joins and aggregates and exchanges and partitions and codegen stages running at scale on large clusters", "en"), // near-dup of 3
    (5L, "nothing in common with anything else here pineapple bicycle umbrella quantum", "en"),
  ).toDF("doc_id", "text", "lang")

  test("minhash+LSH finds planted near-dups and skips unrelated docs") {
    val pairs = LlmDedup.minhashPairs(planted, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((3L, 4L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("capped (KMV-sketch) verification sets keep planted-dup recall unchanged") {
    // SCALE.md mitigation for the O(total shingles) verify-join shuffle:
    // sh_set capped to the k smallest hashes. At a cap well below the docs'
    // shingle counts the detected pair set must not change on planted dups.
    val full = LlmDedup.minhashPairs(planted, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val capped = LlmDedup.minhashPairs(planted, threshold = 0.5, maxSet = 12)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == full, s"capped=$capped full=$full")
    assert(capped.contains((1L, 2L)) && capped.contains((3L, 4L)))
    // and on the real fixture corpus at test scale
    val fullFix = LlmDedup.minhashPairs(Tables.load(spark, sfDir, "documents"), 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cappedFix = LlmDedup.minhashPairs(Tables.load(spark, sfDir, "documents"), 0.5,
      maxSet = 64).select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cappedFix == fullFix, s"fixture drift: ${cappedFix.size} vs ${fullFix.size}")
  }

  test("KMV pairwise estimator is unbiased for size-asymmetric pairs") {
    // ADVICE r4: for A ⊂ B with |B| = 2|A| (true J = 0.5), the naive
    // |A'∩B'|/|A'∪B'| over capped sketches estimates ≈ 1/3; the standard
    // KMV form (intersection ratio over the k smallest union hashes) stays
    // near 0.5. Hash values are uniform-random longs, as in production.
    val rnd = new scala.util.Random(11)
    val a = Array.fill(2000)(rnd.nextLong()).distinct.sorted
    val extra = Array.fill(2000)(rnd.nextLong()).distinct
    val b = (a ++ extra).distinct.sorted
    val k = 256
    val aK = a.take(k); val bK = b.take(k) // sorted ⇒ k smallest = KMV sketch
    val df = Seq((aK, bK)).toDF("sa", "sb")
    val kmv = df.select(
      graft.functions.SortedKmvJaccard(col("sa"), col("sb"), k).as("j"))
      .as[Double].head()
    val naiveInter = df.select(
      graft.functions.SortedIntersectCount(col("sa"), col("sb")).as("i"))
      .as[Int].head()
    val naive = naiveInter.toDouble / (aK.length + bK.length - naiveInter)
    val trueJ = a.length.toDouble / b.length
    assert(math.abs(kmv - trueJ) < 0.1, s"kmv=$kmv true=$trueJ")
    assert(naive < trueJ - 0.1, s"naive=$naive should be visibly biased down")
    // uncapped, the estimator IS exact Jaccard
    val exact = df.select(
      graft.functions.SortedKmvJaccard(col("sa"), col("sb"), Int.MaxValue).as("j"))
      .as[Double].head()
    val exactRef = {
      val i = aK.toSet.intersect(bK.toSet).size
      i.toDouble / (aK.length + bK.length - i)
    }
    assert(exact == exactRef)
  }

  test("cluster rounds never unpersist a concurrent query's cached blocks") {
    // VERDICT r4 wrong #3: cleanup must be scoped to the algorithm's own
    // checkpoint generations, not a diff of the global persistent registry.
    val foreign = spark.sparkContext.parallelize(1 to 100, 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    foreign.count() // materialize blocks
    try {
      LlmDedup.dupClusters(planted, threshold = 0.5).count()
      assert(spark.sparkContext.getPersistentRDDs.contains(foreign.id),
        "foreign RDD swept from the persistent registry")
      assert(foreign.getStorageLevel.useMemory,
        "foreign RDD storage level cleared by cluster-round cleanup")
    } finally foreign.unpersist()
  }

  test("dup clustering groups transitive near-dups, singletons stay alone") {
    val chain = planted.unionByName(Seq(
      // near-dup of doc 2 (and transitively of doc 1)
      (6L, baseText.replace("quick", "fast").replace("dog", "wolf"), "en"))
      .toDF("doc_id", "text", "lang"))
    val out = LlmDedup.dupClusters(chain, threshold = 0.5)
      .as[(Long, Long, Long)].collect()
      .map { case (doc, cl, sz) => doc -> (cl, sz) }.toMap
    assert(out(1L) == (1L, 3L) && out(2L) == (1L, 3L) && out(6L) == (1L, 3L),
      s"chain cluster wrong: $out")
    assert(out(3L) == (3L, 2L) && out(4L) == (3L, 2L))
    assert(out(5L) == (5L, 1L))
  }

  test("SQL minhash twin (udaf + sorted_intersect_count) matches the kernel path") {
    val kernel = graft.SparkEntry.queries("dedup_fuzzy_minhash")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSet
    val sql = graft.SparkEntry.queries("dedup_minhash_sql")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(sql == kernel, s"sql=${sql.size} kernel=${kernel.size}")
    assert(sql.nonEmpty || kernel.isEmpty)
  }

  test("simhash hamming blocking finds the nearest planted pair") {
    val pairs = LlmDedup.simhashPairs(planted, maxHamming = 12)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((3L, 4L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("ngram jaccard on planted corpus scores dup pairs above threshold") {
    val pairs = LlmDedup.ngramJaccardPairs(planted, n = 2, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
    // registered operating point: trigram shingles, t=0.5
    val tri = LlmDedup.ngramJaccardPairs(planted, n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(tri == Set((1L, 2L), (3L, 4L)))
  }

  test("embedding LSH dedup finds a planted near-identical vector") {
    val v = (0 until 64).map(i => math.sin(i + 1).toFloat).toArray
    val nearDup = v.clone(); nearDup(0) = nearDup(0) + 0.001f
    val other = (0 until 64).map(i => math.cos(3 * i + 2).toFloat).toArray
    val emb = Seq((1L, v), (2L, nearDup), (3L, other))
      .toDF("vec_id", "embedding")
    val pairs = LlmDedup.embeddingDupPairs(emb, dim = 64, threshold = 0.99)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("LSH ANN recalls clustered neighbors (planted clusters)") {
    // The fixture embeddings are isotropic noise (no structure for ANY ANN
    // to exploit), so recall is asserted on planted clusters instead.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(5)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 100).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val approx = LlmSim.lshTopK(emb, queryId = 0L, k = 10, dim = 64)
      .select("vec_id").as[Long].collect()
    // query 0 is in cluster 0 (ids ≡ 0 mod 5): neighbors must be clustermates
    val sameCluster = approx.count(_ % 5 == 0)
    assert(sameCluster >= 8, s"only $sameCluster/10 from the query's cluster")
  }

  test("kmeans IVF recalls clustered neighbors and prunes the corpus") {
    // Same planted-cluster corpus as the LSH test: 5 well-separated centers,
    // ids ≡ c mod 5. The IVF probe must recover clustermates AND touch only
    // the probed cells (pruning is the point of the index).
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(5)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 100).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val approx = LlmSim.kmeansIvfTopK(emb, queryId = 0L, k = 10,
      clusters = 8, iters = 4, nProbe = 2).select("vec_id").as[Long].collect()
    val sameCluster = approx.count(_ % 5 == 0)
    assert(sameCluster >= 8, s"only $sameCluster/10 from the query's cluster")
    // pruning: with 8 cells over 5 tight clusters, 2 probed cells must hold
    // strictly less than the full corpus
    val unit = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        (id, graft.functions.VecKernels.normalize(v)) })
    val cents = LlmSim.kmeansCentroids(unit, clusters = 8, iters = 4)
    val sizes = unit.mapPartitions(_.map { case (_, v) =>
      graft.functions.VecKernels.nearestCentroid(v, cents) })
      .groupByKey(identity).count().collect().toMap
    assert(sizes.size >= 2, "kmeans collapsed to a single cell")
    val probedMax = sizes.values.toSeq.sorted.takeRight(2).sum
    assert(probedMax < 100, s"2 largest cells hold the whole corpus: $sizes")
  }

  test("repetition metrics: planted repetitive vs diverse docs") {
    val docs = Seq(
      (1L, "a a a a"),       // 4 tokens, 1 distinct; one bigram "a a" ×3
      (2L, "w x y z"),       // all distinct; 3 distinct bigrams, each once
      (3L, "go go stop go go stop"), // heavy bigram repetition
      (4L, ""),              // empty: all zeros, no div-by-zero
    ).toDF("doc_id", "text")
    val m = graft.ops.LlmText.repetitionStats(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // doc 1: dup_token = 1e6*(4-1)/4; "a a": occ 3×len3=9 of 9 total
    assert(m(0) == (1L, 4L, 750000L, 1000000L, 1000000L))
    // doc 2: no repetition anywhere; 3 bigrams à 3 chars, top 3/9
    assert(m(1) == (2L, 4L, 0L, 333333L, 0L))
    // doc 3: 6 tokens 2 distinct; bigrams: "go go"×2(5), "go stop"×2(7), "stop go"×1(7)
    // occ chars: 10+14+7=31, top 14, dup 24
    assert(m(2) == (3L, 6L, 666666L, 451612L, 774193L))
    // doc 4: zeros everywhere
    assert(m(3) == (4L, 0L, 0L, 0L, 0L))
  }

  test("hash split is deterministic, complete, and near 80/10/10") {
    val q = graft.SparkEntry.queries("split_train_test")
    val a = q(spark, sfDir).as[(Long, String, String)].collect()
    val b = q(spark, sfDir).as[(Long, String, String)].collect()
    assert(a.toSeq == b.toSeq, "split assignment changed between runs")
    val n = a.length.toDouble
    val frac = a.groupBy(_._3).view.mapValues(_.length / n).toMap
    assert(frac.keySet == Set("train", "val", "test"))
    assert(math.abs(frac("train") - 204.0 / 256) < 0.06, s"train=${frac("train")}")
    assert(math.abs(frac("val") - 26.0 / 256) < 0.05, s"val=${frac("val")}")
    assert(math.abs(frac("test") - 26.0 / 256) < 0.05, s"test=${frac("test")}")
  }

  test("approx_count_distinct is within rsd bounds of the exact count") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val exact = li.select(countDistinct(col("l_orderkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.02))
      .as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("multimodal passthrough preserves binary payload bytes exactly") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = java.nio.file.Files.createTempDirectory("graft_mm_spec").toString
    docs.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    val joined = docs.as("a").join(back.as("b"), "doc_id")
      .filter(col("a.payload") =!= col("b.payload"))
    assert(joined.count() == 0)
  }

  test("multimodal_decode decodes REAL PNG bytes, matching the closed-form pixels") {
    // independent re-derivation of what the oracle checks: decode output
    // equals the rendered closed form, which only holds if ImageIO parsed
    // genuine PNG bytes (header + lossless pixel data) correctly
    val got = graft.ops.LlmSim.queries("multimodal_decode")(spark, sfDir)
      .as[(Long, Int, Int, Long, Long)].collect()
    assert(got.length == 500)
    got.take(50).foreach { case (id, w, h, sum, bright) =>
      assert(w == 8 + (id % 9).toInt && h == 8 + ((id * 7) % 9).toInt)
      var expSum = 0L
      var expBright = 0L
      for (x <- 0 until w; y <- 0 until h) {
        val r = (id + 31L * x + 17L * y) % 256
        expSum += r + ((1L * x * y + id) % 256) + ((x + y + 2L * id) % 256)
        if (r > 127) expBright += 1
      }
      assert(sum == expSum && bright == expBright,
        s"doc $id: decoded ($sum,$bright) vs closed form ($expSum,$expBright)")
    }
  }
}
