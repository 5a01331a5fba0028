package graft.ops

import graft.SparkSpec
import graft.queries.Relational
import org.apache.spark.sql.functions._

/** Semantics tests for the training-data operators, on the sf0.001
  * corpus (planted near-dups) plus synthetic micro-fixtures.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = sf("documents")

  test("minhash LSH buckets find the planted near-dup pairs") {
    // ground truth: pairs with word-3gram jaccard ≥ 0.9
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "corpus should contain planted near-dups")

    val buckets = Dedup.lshBuckets(docs, "doc_id", "text", 16, 4)
      .collect()
    // every truth pair should share ≥1 band bucket (min/max doc of a
    // 2-doc bucket IS the pair; larger buckets need the full member
    // list, so check via bands directly)
    val bands = Dedup.lshBands(
      Dedup.minhashSignatures(docs, "doc_id", "text", 16), "doc_id", 16, 4)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getLong(0)))
      .groupBy(t => (t._1, t._2)).values.map(_.map(_._3).toSet)
    val caught = truth.filter { case (a, b) =>
      bands.exists(s => s.contains(a) && s.contains(b))
    }
    assert(caught == truth,
      s"LSH missed near-dup pairs: ${truth.diff(caught)}")
    assert(buckets.forall(_.getLong(2) > 1))
  }

  test("simhash: near-dup docs get close hashes, distinct docs don't collide much") {
    val hs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) =
      a.zip(b).count { case (x, y) => x != y }
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val nearDist = pairs.map { case (a, b) => hamming(hs(a), hs(b)) }
    assert(nearDist.forall(_ <= 6),
      s"near-dups should be hamming-close: $nearDist")
  }

  test("minhash estimate scores planted near-dups high") {
    val est = Dedup.minhashEstimatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    // every true near-dup pair is a candidate, and its signature
    // estimate reflects the ≈0.98 true jaccard (16 hashes → generous
    // tolerance)
    truth.foreach { p =>
      assert(est.contains(p), s"pair $p missing from estimates")
      assert(est(p) >= 0.75, s"pair $p estimated ${est(p)}")
    }
  }

  test("maxBucketSize bounds the LSH pair blowup from a planted hot bucket") {
    // 40 byte-identical docs (one band value shared by all 40 → a
    // 40-deep bucket in EVERY band) + one planted near-dup pair with
    // distinct text. Uncapped, the hot bucket alone contributes
    // C(40,2) = 780 candidate pairs.
    val boiler = (0L until 40L).map(i => (i, "the same boilerplate row " * 8))
    val a = (1 to 60).map(i => s"word$i").mkString(" ")
    val hot = (boiler ++ Seq((100L, a), (101L, a + " iota")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashEstimatePairs(hot, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size >= 780 + 1)
    val capped = Dedup.minhashEstimatePairs(hot, "doc_id", "text",
        maxBucketSize = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hot bucket is gone (bounded pair count), the planted pair
    // survives via its own 2-deep buckets — conservative, never invents
    assert(capped.contains((100L, 101L)), s"planted pair lost: $capped")
    assert(capped.size <= 40, s"cap did not bound pairs: ${capped.size}")
    assert(capped.subsetOf(uncapped))
  }

  test("simhash mapPartitions kernel matches the column-expression simhash32") {
    val viaCols = docs
      .select(col("doc_id"), Dedup.simhash32(col("text")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaKernel = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaKernel == viaCols)
  }

  test("ngramJaccardPairs: maxDocFreq drops hot shingles from the intersection") {
    val df = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c x"), (4L, "a b c y"))
      .toDF("doc_id", "text")
    def pairs(cap: Long) =
      Dedup.ngramJaccardPairs(df, "doc_id", "text", 0.1, maxDocFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    // uncapped: "a b c" (df=4) intersects everything
    assert(pairs(Long.MaxValue) == Set(
      (1L, 2L, 1.0), (1L, 3L, 0.333), (1L, 4L, 0.333),
      (2L, 3L, 0.333), (2L, 4L, 0.333), (3L, 4L, 0.333)))
    // cap 3: the hot shingle leaves the intersection (denominators
    // keep the full count) — only the true dup pair survives, at the
    // conservative J = 1/(2+2-1)
    assert(pairs(3L) == Set((1L, 2L, 0.333)))
  }

  test("containmentPairs: subset doc scores 1.0 where Jaccard misses it") {
    import spark.implicits._
    // doc 1 = 10 words fully embedded in doc 2's 40 words
    val small = (0 until 10).map(i => s"w$i").mkString(" ")
    val big = ((0 until 10) ++ (100 until 130)).map(i => s"w$i")
      .mkString(" ")
    val df = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val c = Dedup.containmentPairs(df, "doc_id", "text", 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // 8 shingles of doc 1 all inside doc 2's 38
    assert(c((1L, 2L)) == 1.0, s"containment small→big: $c")
    assert(c((2L, 1L)) == 0.211, s"containment big→small: $c")
    // symmetric Jaccard on the same pair is far below any dedup cut
    val j = Dedup.ngramJaccardPairs(df, "doc_id", "text", 0.0)
      .collect().map(r => r.getDouble(2)).head
    assert(j == 0.211, s"jaccard: $j")
  }

  test("cluster-keyed split cannot leak a planted near-dup pair") {
    import spark.implicits._
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      v % 100
    }
    // two ids the doc-id split sends to DIFFERENT sides
    val idVal = (0L until 10000L).find(bucket(_) < 1).get
    val idTrain = (0L until 10000L).find(bucket(_) >= 2).get
    val text = (0 until 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(idVal -> text, idTrain -> text).toDF("doc_id", "text")
    val pairs = Dedup.minhashEstimatePairs(docs, "doc_id", "text",
        numHashes = 16, numBands = 4)
      .filter(col("est_jaccard") >= 0.5)
    assert(pairs.count() == 1, "identical docs must pair")
    // doc-id split: the pair straddles (this IS q100's leak)
    val byDoc = Sampling.split(docs, "doc_id", 1, 1)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc(idVal) != byDoc(idTrain), "planted ids must straddle")
    // cluster-keyed split: both land on the cluster's side
    val labels = Dedup.clusters(pairs, "a", "b")
      .select(col("id").as("doc_id"), col("cluster"))
    val keyed = docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("skey"))
    val byCluster = Sampling.split(keyed, "skey", 1, 1)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byCluster(idVal) == byCluster(idTrain),
      s"cluster split leaked: $byCluster")
    labels.unpersist()
  }

  test("dedupCorpusBest keeps the best-scored member, not the min id") {
    import spark.implicits._
    val scored = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9), // cluster {1,2,3}: 2 wins (tie→min id)
      (7L, 0.5)                        // singleton: kept
    ).toDF("doc_id", "prob")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Dedup.dedupCorpusBest(scored, "doc_id", pairs, "prob")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(out(1L) == ((1L, false)), s"min-id member must LOSE: $out")
    assert(out(2L) == ((1L, true)), s"best scorer wins (tie → min id): $out")
    assert(out(3L) == ((1L, false)), out.toString)
    assert(out(7L) == ((7L, true)), "singleton survives")
    assert(out.values.count(_._2) == 2, "exactly one kept per cluster")
  }

  test("fingerprint equates mirrors across whitespace/case drift only") {
    import spark.implicits._
    val fp = Seq(
      "Hello  world FOO", // mirror of the next, modulo drift
      "hello world\tfoo",
      "hello world bar" // one word differs: distinct
    ).toDF("text").select(TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(fp(0) == fp(1), "whitespace/case drift must not split a mirror")
    assert(fp(0) != fp(2), "different content must not collide")
  }

  test("weightedSample matches plain Scala and skews toward weight") {
    import spark.implicits._
    def md32(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 200 rows: even ids weight 9.0, odd ids weight 1.0
    val rows = (0L until 200L).map(i =>
      i -> (if (i % 2 == 0) 9.0 else 1.0))
    val df = rows.toDF("id", "w")
    val k = 40
    val got = Sampling.weightedSample(df, "id", "w", k)
    val gotIds = got.select("id").collect().map(_.getLong(0)).toSet
    // independent reimplementation of the A-ES key
    val want = rows.map { case (id, w) =>
      val lnu = r6(math.log((md32(id.toString) + 1) / 4294967296.0))
      (r6(-lnu / w), id)
    }.sorted.take(k).map(_._2).toSet
    assert(gotIds == want)
    // weight-9 rows must dominate a weight-proportional sample
    val heavy = gotIds.count(_ % 2 == 0)
    assert(heavy >= k / 2 + 5, s"heavy rows not favored: $heavy/$k")
    // the global bottom-k is a TakeOrdered, not a full sort
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("CDC chunks re-sync after an insertion; fixed-width chunks do not") {
    import spark.implicits._
    // deterministic ~1.5k-char text; edit = one word inserted near
    // the front, the worst case for fixed-width chunking
    val words = (0 until 300).map(i => s"w$i")
    val base = words.mkString(" ")
    val edited = (words.take(5) ++ Seq("INSERTED") ++ words.drop(5))
      .mkString(" ")
    val df = Seq((0L, base), (1L, edited)).toDF("doc_id", "text")
    def sharedFrac(rows: org.apache.spark.sql.DataFrame): Double = {
      val byDoc = rows.select("doc_id", "fp").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getString(1)).toSet).toMap
      byDoc(0L).intersect(byDoc(1L)).size.toDouble / byDoc(0L).size
    }
    val cdc = sharedFrac(TextOps.cdcChunkRows(df, "doc_id", "text"))
    val fixed = sharedFrac(TextOps.chunkRows(df, "doc_id", "text"))
    // CDC re-syncs within a window of the edit: most chunks survive.
    // Fixed-width boundaries all shift after the insertion.
    assert(cdc >= 0.7, s"cdc shared frac $cdc")
    assert(fixed <= 0.2, s"fixed-width shared frac $fixed")
    assert(cdc > fixed)
  }

  test("redactPii replaces emails and phones, leaves clean text alone") {
    val in = Seq(
      "mail me at jane.doe+x@corp.example.org today",
      "call +1-555-867-5309 or 020-7946-0958 now",
      "no pii here at all").toDF("t")
    val out = in.select(TextOps.redactPii(col("t")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq(
      "mail me at <EMAIL> today",
      "call <PHONE> or <PHONE> now",
      "no pii here at all"), out)
  }

  test("hash sampling: deterministic, nested by rate, split covers all rows") {
    def ids(pct: Int) = Sampling.hashSample(docs, "doc_id", pct)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s10 = ids(10)
    assert(s10 == ids(10)) // re-run selects the SAME rows
    val s50 = ids(50)
    // raising the rate only ADDS rows (bucket < 10 ⊂ bucket < 50) —
    // the property that makes rate changes incremental, not a reshuffle
    assert(s10.subsetOf(s50))
    assert(math.abs(s50.size / 500.0 - 0.5) < 0.15, s"${s50.size}")

    val split = Sampling.split(docs, "doc_id", 10, 10)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.values.sum == 500)
    assert(split.keySet == Set("train", "val", "test"))
    assert(split("train") > split("val") && split("train") > split("test"))

    // stratified mix at rate 100 keeps everything in that stratum;
    // rate 0 (absent stratum) keeps nothing
    val mixed = Sampling.stratifiedMix(docs, "doc_id", "source",
      Seq("src0" -> 100)).select("source").distinct().collect()
    assert(mixed.map(_.getString(0)).toSeq == Seq("src0"))
  }

  test("clusters: min-label propagation resolves transitive components") {
    // two components: {1,2,3,7} via a chain (needs >1 propagation
    // round: 7-3, 3-2, 2-1) and {10,11}; 5 stays unclustered
    val pairs = Seq((2L, 1L), (3L, 2L), (7L, 3L), (10L, 11L))
      .toDF("a", "b")
    val cl = Dedup.clusters(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L))

    // empty pair frame → empty cluster frame, correct schema
    val empty = Dedup.clusters(pairs.filter(col("a") < 0), "a", "b")
    assert(empty.columns.toSeq == Seq("id", "cluster"))
    assert(empty.isEmpty)
  }

  test("clustersStar equals clusters on a mixed random component graph") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),              // path component → 1
      (10L, 11L), (11L, 12L), (10L, 12L),        // triangle → 10
      (20L, 21L),                                // pair → 20
      (30L, 31L), (31L, 32L), (30L, 33L), (33L, 34L)) // tree → 30
      .toDF("a", "b")
    def lab(df: org.apache.spark.sql.DataFrame) = {
      val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      df.unpersist(); m
    }
    val star = lab(Dedup.clustersStar(pairs, "a", "b"))
    val prop = lab(Dedup.clusters(pairs, "a", "b"))
    assert(star == prop, s"star=$star prop=$prop")
    assert(star(4L) == 1L && star(12L) == 10L && star(34L) == 30L)
  }

  test("clustersStar resolves a 200-node chain in logarithmic rounds") {
    // diameter 200: min-label propagation would need ~200 rounds;
    // the star pair must converge well under the 64-round cap
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.clustersStar(chain, "a", "b")
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels.unpersist()
    assert(m.size == 200 && m.values.forall(_ == 1L),
      s"bad labels: ${m.filter(_._2 != 1L).take(5)}")
  }

  test("dedupCorpus keeps one canonical doc per cluster plus singletons") {
    val corpus = Seq((1L, "x"), (2L, "x"), (3L, "x"), (5L, "y"),
      (7L, "x"), (10L, "z"), (11L, "z"))
      .toDF("doc_id", "payload")
    val pairs = Seq((2L, 1L), (3L, 2L), (7L, 3L), (10L, 11L))
      .toDF("a", "b")
    val kept = Dedup.dedupCorpus(corpus, "doc_id", pairs)
    assert(kept.columns.toSeq == Seq("doc_id", "payload"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 5L, 10L))
  }

  test("dedupCorpus on the real corpus removes exactly the planted near-dups") {
    val pairs = Dedup.minhashEstimatePairs(docs, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
    val clustered = Dedup.clusters(pairs, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(clustered.nonEmpty, "corpus should contain planted near-dups")
    val survivors = Dedup.dedupCorpus(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val removed = clustered.collect { case (id, cl) if id != cl => id }.toSet
    val canonical = clustered.map(_._2).toSet
    assert(survivors.size == docs.count() - removed.size)
    assert(canonical.subsetOf(survivors))
    assert(removed.forall(!survivors.contains(_)))
  }

  test("keepFirst keeps exactly the minimum-order row per key") {
    val df = Seq((1, "a", 10), (1, "b", 5), (2, "c", 7), (2, "d", 9))
      .toDF("k", "v", "ord")
    val kept = Dedup.keepFirst(df, Seq("k"), Seq(col("ord").asc))
      .select("k", "v").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(kept == Set((1, "b"), (2, "c")))
  }

  test("cosine brute force: self-similarity excluded, symmetry holds") {
    val emb = sf("embeddings")
    val out = Similarity.cosineBruteForce(emb, "vec_id", "embedding",
      col("vec_id") % 100 === 0, threshold = -2.0) // keep all pairs
    val rows = out.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    val n = emb.count()
    val nq = emb.filter(col("vec_id") % 100 === 0).count()
    assert(rows.length == nq * (n - 1))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.000001))
  }

  test("bucketed cosine is a subset of brute force with equal scores") {
    val emb = sf("embeddings")
    val bf = Similarity.cosineBruteForce(emb, "vec_id", "embedding",
      col("vec_id") % 100 === 0, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bk = Similarity.cosineBucketed(emb, "vec_id", "embedding",
      col("vec_id") % 100 === 0, 0.2, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(bk.keySet.subsetOf(bf.keySet))
    assert(bk.forall { case (k, v) => bf(k) == v })
  }

  test("embedding near-dup pairs: bucketed self-join subset of brute force") {
    val emb = sf("embeddings")
    val brute = Similarity.cosineBruteForce(emb, "vec_id", "embedding",
        org.apache.spark.sql.functions.lit(true), 0.4)
      .filter(col("qid") < col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bucketed = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
        threshold = 0.4, bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(brute.nonEmpty)
    assert(bucketed.keySet.subsetOf(brute.keySet))
    assert(bucketed.forall { case (k, v) => brute(k) == v })
  }

  test("embeddingNearDups auto-sizes cells: 10x the input, >=8x the cells") {
    // pure sizing law: +>=3 bits (>=8x cells) per 10x input, monotonic,
    // clamped to the discriminating range of the sign prefix
    for (n <- Seq(10L * 1000, 1000L * 1000, 100L * 1000 * 1000)) {
      val b = Dedup.autoBits(n)
      val b10 = Dedup.autoBits(10 * n)
      assert(b10 >= b + 3, s"n=$n: bits $b -> $b10 under 10x growth")
    }
    assert(Dedup.autoBits(100) == 1)          // tiny input: one split
    assert(Dedup.autoBits(Long.MaxValue) == 24) // clamp
    // the default (auto) path is the explicit path at the auto size
    val emb = sf("embeddings")
    val auto = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pinned = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.4,
        bits = Dedup.autoBits(emb.count()))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == pinned && auto.nonEmpty)
  }

  test("ivf nprobe=2 recall dominates nprobe=1 and never invents pairs") {
    val emb = sf("embeddings")
    def run(np: Int) = {
      val m = Similarity.ivfSearch(emb, "vec_id", "embedding",
          col("vec_id") % 100 === 0, col("vec_id") % 50 === 7,
          threshold = 0.2, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      spark.catalog.clearCache() // ivfSearch persists the cell assignment
      m
    }
    val np1 = run(1)
    val np2 = run(2)
    // probing MORE cells can only add pairs — np1 ⊆ np2, scores equal
    assert(np1.keySet.subsetOf(np2.keySet))
    assert(np1.forall { case (k, v) => np2(k) == v })
    // recall vs the exact brute-force truth does not decrease
    val truth = Similarity.cosineBruteForce(emb, "vec_id", "embedding",
        col("vec_id") % 100 === 0, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val r1 = np1.keySet.intersect(truth).size.toDouble / truth.size
    val r2 = np2.keySet.intersect(truth).size.toDouble / truth.size
    assert(r2 >= r1, s"nprobe=2 recall $r2 < nprobe=1 recall $r1")
    // and the IVF tiers only ever surface true-cosine pairs (no
    // approximation on the score itself, only on the candidate set)
    assert(np2.keySet.subsetOf(truth))
  }

  test("cosineTopK: ranks contiguous, scores non-increasing, subset of brute force") {
    val emb = sf("embeddings")
    val topk = Similarity.cosineTopK(emb, "vec_id", "embedding",
        col("vec_id") % 100 === 0, k = 5, bits = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(topk.nonEmpty)
    val byQ = topk.groupBy(_._1)
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._4)
      // ranks are 1..n with n <= k
      assert(sorted.map(_._4).toSeq == (1 to sorted.length), s"qid=$qid")
      assert(sorted.length <= 5)
      // scores never increase with rank
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._3 >= y._3
        case _ => true
      }, s"qid=$qid")
    }
    // every (qid, id, cos) is a true brute-force pair with equal score
    val truth = Similarity.cosineBruteForce(emb, "vec_id", "embedding",
        col("vec_id") % 100 === 0, threshold = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(topk.forall { case (q, v, c, _) => truth((q, v)) == c })
  }

  test("multimodal: binary plumbing round-trips and features are deterministic") {
    val media = Multimodal.asMedia(docs.limit(50), "doc_id", "text")
    assert(media.schema("content").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(f => f.features.forall(v => v >= 0f && v < 1f)))
    // determinism: second run identical
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.id -> f.checksum).toMap
    assert(feats.forall(f => again(f.id) == f.checksum))
    // sampling shrinks payloads
    val sampled = Multimodal.sampleBytes(media, 4)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Array[Byte]]("content").length).toMap
    val orig = media.collect().map(r => r.getLong(0) ->
      r.getAs[Array[Byte]]("content").length).toMap
    assert(sampled.forall { case (id, len) =>
      len == (orig(id) + 3) / 4
    })
    // resize: every payload exactly the target size (truncate/pad),
    // and the preserved prefix is byte-identical to the original
    val resized = Multimodal.resizeBytes(media, 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("content"))
    val origBytes = media.collect().map(r => r.getLong(0) ->
      r.getAs[Array[Byte]]("content")).toMap
    assert(resized.forall(_._2.length == 64))
    assert(resized.forall { case (id, b) =>
      val o = origBytes(id)
      b.take(math.min(64, o.length)).sameElements(o.take(64))
    })
  }

  test("multimodal features feed the ANN operator end-to-end") {
    // the advertised pipeline: binary payload → decode stub → fixed-
    // width feature vector → cosine search over the features
    val media = Multimodal.asMedia(docs.limit(100), "doc_id", "text")
    val feats = Multimodal.extractFeatures(media)
      .select(col("id").as("vec_id"), col("features").as("embedding"))
    val hits = Similarity.cosineBruteForce(feats, "vec_id", "embedding",
      col("vec_id") % 20 === 0, threshold = 0.9)
    val rows = hits.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) <= 1.000001))
    // stub features are dense positive 8-dim vectors → high cosine is
    // common; the operator must return a non-trivial result set
    assert(rows.nonEmpty)
  }

  test("incremental dedup: batch vs signature store, survivors update the store") {
    val docs = sf("documents")
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val store = Dedup.minhashSignatures(hist, "doc_id", "text", 16)
    val decisions = Dedup.incrementalDecisions(batch, store,
        "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every batch doc gets exactly one decision
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(decisions.keySet == batchIds)
    assert(decisions.values.forall(
      Set("kept", "hist_dup", "batch_dup").contains))
    // docs under 3 tokens have no signature and can never match —
    // they are correctly always "kept"; exclude them from the
    // guarantees below
    def noSig(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(size(split(col("text"), " ", -1)) < 3).count()
    // a batch doc re-submitted IN the store must be flagged hist_dup:
    // plant the store's own twin by shifting ids (id+1 keeps the text)
    val planted = Dedup.incrementalDecisions(
      hist.withColumn("doc_id", col("doc_id") + 1), store,
      "doc_id", "text").collect().map(r => r.getString(1))
    assert(planted.count(_ == "hist_dup") == hist.count() - noSig(hist),
      s"identical-text batch should be hist_dup: ${planted.toSet}")
    // dedupIncremental: survivors = kept rows; store grows by survivors
    val (survivors, updated) = Dedup.dedupIncremental(batch, store,
      "doc_id", "text")
    val keptIds = decisions.filter(_._2 == "kept").keySet
    assert(survivors.select("doc_id").collect().map(_.getLong(0)).toSet
      == keptIds)
    assert(updated.count() == store.count() + keptIds.size)
    // idempotence: re-running the SURVIVORS against the updated store
    // keeps none of them (each now matches its own stored signature)
    val again = Dedup.incrementalDecisions(survivors, updated,
      "doc_id", "text").filter(col("status") === "kept").count()
    assert(again == noSig(survivors),
      s"$again survivors re-survived against the updated store")
  }

  test("image decode: ImageIO roundtrip recovers the exact test-card pixels") {
    // encoder-side truth, recomputed directly from the coefficients
    def expectSums(id: Long, w: Int, h: Int): (Long, Long, Long) = {
      val s = new Array[Long](3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val (ic, xc, yc, off) = Multimodal.channelCoefs(c)
        s(c) += ((ic * id + xc * x + yc * y + off) % 256).toInt
      }
      (s(0), s(1), s(2))
    }
    // pure roundtrip: PNG bytes → javax.imageio decode → exact sums
    for (id <- Seq(0L, 1L, 17L, 499L)) {
      val st = Multimodal.decodeImageStats(id,
        Multimodal.testCardPng(id, 8, 8)).get
      assert((st.width, st.height) == (8, 8))
      assert((st.sum_r, st.sum_g, st.sum_b) == expectSums(id, 8, 8), s"id=$id")
    }
    // undecodable / null payloads are None, not a crash
    assert(Multimodal.decodeImageStats(1L, "not a png".getBytes).isEmpty)
    assert(Multimodal.decodeImageStats(1L, null).isEmpty)
    // distributed path: syntheticImages → imageStats over a frame
    val media = Multimodal.syntheticImages(docs.limit(20), "doc_id", 8, 8)
    val stats = Multimodal.imageStats(media).collect()
    assert(stats.length == 20)
    assert(stats.forall(s =>
      (s.sum_r, s.sum_g, s.sum_b) == expectSums(s.id, 8, 8)))
    // extractFeatures dispatches kind=image through the real codec:
    // f = [w, h, meanR, varR, meanG, varG, meanB, varB]
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.id -> f.features).toMap
    assert(feats.values.forall(f => f(0) == 8f && f(1) == 8f))
    stats.foreach { s =>
      val f = feats(s.id)
      assert(math.abs(f(2) - s.sum_r / 64.0) < 1e-3, s"id=${s.id} meanR")
      assert(math.abs(f(4) - s.sum_g / 64.0) < 1e-3, s"id=${s.id} meanG")
      assert(math.abs(f(6) - s.sum_b / 64.0) < 1e-3, s"id=${s.id} meanB")
    }
  }

  test("resizeImages: NN resample is pixel-exact, up and down; non-images pass through") {
    def expectResized(id: Long, sw: Int, sh: Int, dw: Int,
        dh: Int): (Long, Long, Long) = {
      val s = new Array[Long](3)
      for (y <- 0 until dh; x <- 0 until dw; c <- 0 until 3) {
        val (ic, xc, yc, off) = Multimodal.channelCoefs(c)
        s(c) += ((ic * id + xc * (x * sw / dw) + yc * (y * sh / dh)
          + off) % 256).toInt
      }
      (s(0), s(1), s(2))
    }
    val media = Multimodal.syntheticImages(docs.limit(10), "doc_id", 8, 8)
    for ((dw, dh) <- Seq((3, 5), (16, 4))) { // down AND up scale
      val stats = Multimodal.imageStats(
        Multimodal.resizeImages(media, dw, dh)).collect()
      assert(stats.length == 10)
      stats.foreach { s =>
        assert((s.width, s.height) == (dw, dh))
        assert((s.sum_r, s.sum_g, s.sum_b) ==
          expectResized(s.id, 8, 8, dw, dh), s"id=${s.id} ${dw}x$dh")
      }
    }
    // non-image payloads pass through unmodified
    import spark.implicits._
    val junk = Seq((1L, "not an image".getBytes("UTF-8")))
      .toDF("id", "content")
    val out = Multimodal.resizeImages(junk, 4, 4).collect()
    assert(out.head.getAs[Array[Byte]](1).sameElements(
      "not an image".getBytes("UTF-8")))
  }

  test("asof join picks the latest right row at-or-before each left time") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:01:00"), "t2"),
      (2L, ts("2024-01-01 10:00:00"), "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:05"), 101.0), // exactly at t1 → visible
      (1L, ts("2024-01-01 10:00:30"), 102.0),
      (2L, ts("2024-01-01 10:00:01"), 50.0)) // after t3 → not visible
      .toDF("k", "ts", "quote")
    val out = AsOf.asofJoin(trades, quotes, "k", "ts")
      .select("trade", "quote").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map("t1" -> Some(101.0), "t2" -> Some(102.0), "t3" -> None))
  }

  test("asof join carries the matched row atomically (no field mixing)") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, ts("2024-01-01 10:00:10"), "L"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:01"), Some(5.0), Option.empty[Double]),
      (1L, ts("2024-01-01 10:00:02"), Option.empty[Double], Some(7.0)))
      .toDF("k", "ts", "x", "y")
    val r = AsOf.asofJoin(left, right, "k", "ts")
      .select("x", "y").head()
    // the latest right row is (null, 7.0); per-column carry would
    // fabricate (5.0, 7.0)
    assert(r.isNullAt(0) && r.getDouble(1) == 7.0, r.toString)
  }

  test("approx_count_distinct within 15% of exact on lineitem keys") {
    // default HLL rsd is 5%; 3σ ≈ 15% is the stable deterministic
    // bound for this cardinality (observed ~6.4% at sf0.001).
    // q34 = approx (rows-only in the driver gate), q36 = exact
    // (oracled); this spec is the bridge between the two.
    val approx = Relational.q34.run(spark, "/root/testdata/sf0.001").head()
    val exact = Relational.q36.run(spark, "/root/testdata/sf0.001").head()
    Seq(0, 1).foreach { i =>
      val (a, e) = (approx.getLong(i), exact.getLong(i))
      assert(math.abs(a - e).toDouble / e < 0.15, s"col $i: approx=$a exact=$e")
    }
  }

  test("salted join and salted sum match their unsalted equivalents") {
    val rnd = new scala.util.Random(3)
    // heavily skewed: 90% of rows share key 1
    val big = (0 until 2000)
      .map(i => (if (rnd.nextInt(10) < 9) 1 else rnd.nextInt(50), i.toDouble))
      .toDF("k", "v")
    val small = (0 until 50).map(k => (k, s"dim$k")).toDF("k", "name")

    val plainJ = big.join(small, "k").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).sortBy(_.toString)
    val saltedJ = Skew.saltedJoin(big, small, "k", salt = 8).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).sortBy(_.toString)
    assert(saltedJ.toSeq == plainJ.toSeq)

    val plainS = big.groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val saltedS = Skew.saltedSum(big, "k", "v", salt = 8)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(saltedS.keySet == plainS.keySet)
    assert(saltedS.forall { case (k, v) => math.abs(v - plainS(k)) < 1e-6 })
  }

  test("winnowing: docs sharing a long substring share a fingerprint") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val df = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"completely different head $shared and tail"),
      (3L, "nothing in common with the others at all zzz"))
      .toDF("doc_id", "text")
    val fps = TextOps.winnowRows(df, "doc_id", "text", k = 8, w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // guarantee: shared substring of length >= w+k-1 = 11 → overlap
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    // sanity: doc 3 shares nothing long with doc 1
    assert((fps(1L) intersect fps(3L)).isEmpty)
  }

  test("text ops: token count and fingerprint invariants") {
    val df = Seq("the cat sat", "THE  CAT  SAT", "unique words here")
      .toDF("text")
    val toks = df.select(TextOps.tokenCount(col("text"))).collect()
      .map(_.getInt(0)).toSeq
    assert(toks.head == 3)
    val fps = df.select(TextOps.fingerprint(col("text"))).collect()
      .map(_.getString(0))
    // whitespace-normalized lowercase: rows 0 and 1 collide
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("repetitionStats: exact gram-char arithmetic on hand-checked docs") {
    val df = Seq(
      (0L, "g", "a b a b a b"),   // "a b"×3,"b a"×2 → top2 = 3·3 = 9;
                                  // "a b a"×2 + "b a b"×2 → dup3 = 20
      (1L, "g", "x y z"),         // no repeats: top2 = 3, dup3 = 0
      (2L, "g", "hello"),         // < 2 tokens → both 0
      (3L, "g", ""),              // split("", -1) = [""] → both 0
      // top2 follows the most FREQUENT gram ("a b"×3 → 9), not the
      // long rare one ("interdisciplinary interdepartmental"×2 → 70)
      (4L, "g", "a b a b a b interdisciplinary interdepartmental " +
        "interdisciplinary interdepartmental"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.repetitionStats(df, "doc_id", "source", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) == ((11L, 9L, 20L)))
    assert(out(1L) == ((5L, 3L, 0L)))
    assert(out(2L) == ((5L, 0L, 0L)))
    assert(out(3L) == ((0L, 0L, 0L)))
    assert(out(4L) == ((83L, 9L, 20L)))
  }

  test("repetitionStats is a codegen'd expression — no object ser/de, " +
      "struct computed once — and counts CODE POINTS like the oracle") {
    // U+1D11E (musical G clef): 2 UTF-16 units, 1 code point — the
    // case where the old typed kernel's String.length diverged from
    // DuckDB length(); every count below is in code points
    val g = "𝄞"
    val df = Seq((0L, "g", s"$g a $g a $g a")).toDF("doc_id", "source",
      "text")
    // n_chars 11 (6 tokens + 5 spaces); "𝄞 a"×3 → top2 = 3·3 = 9
    // (UTF-16 would say 3·4 = 12); two duplicated 3-grams of 5 code
    // points each → dup3 = 2·5 + 2·5 = 20
    val out = TextOps.repetitionStats(df, "doc_id", "source", "text")
      .collect().map(r =>
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).head
    assert(out == ((11L, 9L, 20L)))
    val q = TextOps.repetitionStats(docs, "doc_id", "source", "text")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("DeserializeToObject") &&
      !plan.contains("SerializeFromObject"),
      s"kernel must stay inside codegen:\n$plan")
    // "*(N)" prefixes are the WholeStageCodegen stage markers — the
    // kernel projection must carry one
    assert("\\*\\(\\d+\\) Project \\[.*repetition_stats".r
      .findFirstIn(plan).isDefined,
      s"kernel projection must be codegen-staged:\n$plan")
    assert("repetition_stats\\(".r.findAllIn(plan).size == 1,
      s"the struct must be computed once, not per extracted field:\n$plan")
  }

  test("repetitionStats matches a plain-Scala recompute on the corpus") {
    def brute(text: String): (Long, Long, Long) = {
      val t = text.split(" ", -1)
      def counts(k: Int) = (0 to t.length - k)
        .map(i => t.slice(i, i + k).mkString(" "))
        .groupBy(identity).map { case (g, o) => (g, o.size.toLong) }
      val top2 = if (t.length < 2) 0L
        else {
          val m = counts(2)
          val c = m.values.max
          c * m.collect { case (g, cc) if cc == c => g.length.toLong }.max
        }
      val dup3 = if (t.length < 3) 0L
        else counts(3).collect { case (g, c) if c > 1 => c * g.length }.sum
      (text.length.toLong, top2, dup3)
    }
    val expect = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> brute(r.getString(1))).toMap
    val got = TextOps.repetitionStats(docs, "doc_id", "source", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    assert(got.values.exists(_._3 > 0), "corpus should contain repeats")
  }

  test("decontaminate flags docs sharing n-grams with the eval slice") {
    val df = Seq(
      (7L, "alpha beta gamma delta epsilon"), // eval (pred: id % 100 == 7)
      (1L, "alpha beta gamma delta zeta"),    // shares 2 3-grams with eval
      (2L, "one two three four five six"),    // shares nothing
      (3L, "x alpha beta gamma y"))           // shares exactly 1 3-gram
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(df, "doc_id", "text",
        col("doc_id") % 100 === 7, k = 3, minOverlap = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(!out.contains(7L), "eval docs must not appear in the output")
    assert(out(1L) == ((3L, 2L, true)))
    assert(out(2L) == ((4L, 0L, false)))
    assert(out(3L) == ((3L, 1L, false)), "below minOverlap must not flag")
  }

  test("kmeans: two planted blobs converge to their exact means") {
    val pts = Seq( // blob A around 0, blob B around 10 (2-dim)
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 1.0f)), (2L, Seq(0.0f, 1.0f)),
      (10L, Seq(10.0f, 10.0f)), (11L, Seq(11.0f, 11.0f)),
      (12L, Seq(10.0f, 11.0f)))
      .toDF("vec_id", "embedding")
    // seeds: one per blob (ids 0 and 10)
    val cents = Similarity.kmeansCentroids(pts, "vec_id", "embedding",
        col("vec_id") === 0 || col("vec_id") === 10, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(cents.keys.map(_._1).toSet == Set(0L, 10L))
    // exact means, rounded to 6 (HALF_UP) by the trainer
    assert(cents((0L, 1)) == 0.333333)
    assert(cents((0L, 2)) == 0.666667)
    assert(cents((10L, 1)) == 10.333333)
    assert(cents((10L, 2)) == 10.666667)
  }

  test("semDedup drops the higher-id near-identical vector, keeps the rest") {
    val pts = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (5L, Seq(1.0f, 0.001f, 0.0f)), // cos≈1 vs id 0 → dropped
      (6L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal → kept
      (20L, Seq(-1.0f, -1.0f, 8.0f)),
      (21L, Seq(-1.0f, -1.0f, 8.1f))) // cos≈1 vs id 20 → dropped
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(pts, "vec_id", "embedding",
      col("vec_id") === 0 || col("vec_id") === 20, iters = 1)
    val out = Similarity.semDedup(pts, "vec_id", "embedding", cents, 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(0L -> true, 5L -> false, 6L -> true,
      20L -> true, 21L -> false))
  }

  test("capPerGroup keeps the top-n per group with deterministic ranks") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.5), ("a", 3L, 0.9), ("a", 4L, 0.1),
      ("b", 5L, 0.2))
      .toDF("g", "id", "score")
    val out = Sampling.capPerGroup(df, Seq("g"),
        Seq(col("score").desc, col("id").asc), n = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    // ties on score break by id: 1 then 3; 2 and 4 cut; b keeps its one
    assert(out == Set(("a", 1L, 1), ("a", 3L, 2), ("b", 5L, 1)))
  }

  test("budgetFill keeps rows while the running token total fits") {
    val df = Seq(
      ("en", 1L, 0.9, 40L), ("en", 2L, 0.8, 50L), ("en", 3L, 0.7, 20L),
      ("de", 4L, 0.1, 99L), ("de", 5L, 0.05, 2L))
      .toDF("lang", "id", "q", "ntok")
    val out = Sampling.budgetFill(df, Seq("lang"),
        Seq(col("q").desc, col("id").asc), col("ntok"), budget = 100L)
      .collect().map(r => (r.getLong(1), r.getLong(4))).toMap
    // en: 40, 90 fit; +20 would be 110 → cut. de: 99, +2 → cut.
    assert(out == Map(1L -> 40L, 2L -> 90L, 4L -> 99L))
  }

  test("quantizeInt8: max component hits ±127, zero vector stays zero") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pts = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(pts, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getDouble(3)))).toMap
    assert(out((1L, 2)) == ((-127, r6(1.0 / 127))))
    assert(out((1L, 1))._1 == 64) // 0.5/(1/127) = 63.5 → HALF_UP 64
    assert(out((1L, 3))._1 == 32) // 0.25/(1/127) = 31.75 → 32
    assert(out((2L, 1)) == ((0, 0.0)) && out((2L, 3)) == ((0, 0.0)))
  }

  test("chunkRows: first occurrence wins, repeated span detected across docs") {
    val shared = "a b c d e f g h" // exactly one 8-word chunk
    val df = Seq(
      (1L, s"$shared tail one"),
      (2L, s"$shared tail two"),
      (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val ch = TextOps.chunkRows(df, "doc_id", "text", w = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // doc 1: chunks [a..h], [tail one]; doc 2: [a..h], [tail two]
    assert(ch.count(_._1 == 1L) == 2 && ch.count(_._1 == 3L) == 1)
    val fp = ch.groupBy(t => (t._1, t._2)).view.mapValues(_.head._3)
    assert(fp((1L, 0)) == fp((2L, 0)), "shared span must share fingerprint")
    assert(fp((1L, 1)) != fp((2L, 1)))
  }

  test("annRecallAtK: one shared cell gives perfect recall") {
    // first coordinate positive everywhere → 1-bit sign bucket puts
    // ALL vectors in one cell → LSH candidates = brute-force set
    val pts = Seq(
      (0L, Seq(1.0f, 0.1f)), (1L, Seq(1.0f, 0.2f)), (2L, Seq(2.0f, -0.1f)),
      (3L, Seq(0.5f, 0.9f)), (4L, Seq(0.7f, -0.8f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.annRecallAtK(pts, "vec_id", "embedding",
        col("vec_id") === 0, k = 3, bits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((0L, 3L, 1.0)), out.mkString(","))
  }

  test("multi-table LSH recall dominates single-table on every query") {
    val emb = sf("embeddings")
    val pred = col("vec_id") % 100 === 0
    def recalls(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val single = recalls(Similarity.annRecallAtK(
      emb, "vec_id", "embedding", pred, k = 5, bits = 4))
    val multi = recalls(Similarity.recallAgainstExact(
      emb, "vec_id", "embedding", pred, k = 5,
      Similarity.multiTableTopK(emb, "vec_id", "embedding", pred, k = 5,
        Seq((1, 4), (5, 4), (9, 4)))))
    assert(single.keySet == multi.keySet)
    single.foreach { case (qid, r) =>
      assert(multi(qid) >= r, s"multi-table recall dropped for qid=$qid")
    }
    // ≥ is guaranteed (table 1 of the multi set IS the single-table
    // slice, so candidates are a superset); strictness is corpus-
    // dependent and is demonstrated by the oracled q64-vs-q65 pair
  }

  test("semDedup on the corpus: every cell's min-id member survives") {
    val emb = sf("embeddings")
    val cents = Similarity.kmeansFit(emb, "vec_id", "embedding",
      col("vec_id") % 50 === 7, iters = 1)
    val rows = Similarity.semDedup(emb, "vec_id", "embedding", cents, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == emb.count())
    rows.groupBy(_._2).foreach { case (cell, members) =>
      val minId = members.map(_._1).min
      assert(members.find(_._1 == minId).get._3,
        s"min-id member of cell $cell must be kept")
    }
  }
}
