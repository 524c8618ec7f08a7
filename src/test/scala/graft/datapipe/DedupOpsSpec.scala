package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Dedup/similarity operators against the planted near-duplicates in the
  * driver's synthetic documents table (sf0.01: 500 docs, ~25 near-dup
  * pairs at jaccard ≥ 0.98). */
class DedupOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"
  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("exact dedup: 500 distinct texts, all groups size 1") {
    val d = DedupOps.exactDedup(docs)
    assert(d.count() == 500)
    assert(d.filter(col("n_copies") > 1).count() == 0)
  }

  test("canonical dedup merges case/punct/whitespace variants; raw dedup cannot") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox"),
      (2L, "The  quick   BROWN fox!!"),   // case + ws runs + punct
      (3L, "the quick, brown; fox..."),   // punct only
      (4L, "an entirely different text"),
      (5L, "an entirely different text"), // raw-identical to 4
      (6L, "thequickbrownfox")            // NOT a variant (no spaces)
    ).toDF("doc_id", "text")
    val got = DedupOps.canonicalDedup(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 3)
    val byCanon = got.map(g => g._2 -> g).toMap
    // 1/2/3 fold to one group, keep-first id 1, three DISTINCT raws
    assert(byCanon(1L) == ((byCanon(1L)._1, 1L, 3L, 3L)))
    // 4/5 fold as raw-identical: one distinct raw
    assert(byCanon(4L) == ((byCanon(4L)._1, 4L, 2L, 1L)))
    // 6 stays alone — canonicalization never merges genuinely different text
    assert(byCanon(6L) == ((byCanon(6L)._1, 6L, 1L, 1L)))
    // raw exact dedup sees 1/2/3 as three separate groups
    assert(DedupOps.exactDedup(d).count() == 5)
  }

  test("gram OOV score: covered docs score zero, novel grams count occurrences") {
    import spark.implicits._
    val ref = Seq((101L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val d = Seq(
      (1L, "alpha beta gamma"),          // all bigrams in ref -> 0 OOV
      (2L, "alpha beta zeta eta zeta eta"), // beta-zeta, zeta-eta x2, eta-zeta OOV
      (3L, "solo"),                       // < 2 tokens -> zero grams
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = QualityScore.gramOovScore(d, ref).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2L, 0L)))
    // doc 2 bigrams: alpha-beta(in), beta-zeta, zeta-eta, eta-zeta, zeta-eta -> 4 OOV of 5
    assert(got(2L) == ((5L, 4L)))
    assert(got(3L) == ((0L, 0L)))
    assert(got(4L) == ((0L, 0L)))
  }

  test("minhash LSH finds the planted near-dup pairs") {
    val pairs = DedupOps.minhashNearDupPairs(docs, 0.5).collect()
    assert(pairs.length >= 20 && pairs.length <= 40, s"got ${pairs.length}")
    assert(pairs.forall(r =>
      r.getAs[Long]("n_inter").toDouble / r.getAs[Long]("n_union") >= 0.5))
    // known planted pair from the seeded data
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 98L && r.getAs[Long]("id_b") == 290L))
  }

  test("md5-based minhash: same planted pairs, engine == driver-side band brute force") {
    // the md5Based path (q13/q54/q55's oracle-portable variant) must
    // produce exactly the candidate-verified pairs a driver-side
    // recomputation of Hashing.minhashBandsMd5 predicts
    val pairs = DedupOps.minhashNearDupPairs(docs, 0.5, md5Based = true)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val local = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
      .filter(_._2.trim.nonEmpty)
    // driver-side banding: (band_idx, key) -> members, buckets 2..64
    val buckets = scala.collection.mutable.HashMap.empty[(Int, String), List[Long]]
    local.foreach { case (id, text) =>
      Hashing.minhashBandsMd5(text, 128, 3, 32).zipWithIndex.foreach {
        case (k, b) => buckets((b, k)) = id :: buckets.getOrElse((b, k), Nil)
      }
    }
    val shingleSets = local.toMap.map { case (id, t) => id -> Hashing.shingleSet(t, 3) }
    val expected = buckets.values
      .filter(m => m.size >= 2 && m.size <= 64)
      .flatMap(m => m.combinations(2).map(p => (p.min, p.max)))
      .toSet[(Long, Long)]
      .filter { case (a, b) =>
        val (i, u) = Hashing.jaccardCounts(shingleSets(a), shingleSets(b))
        i >= 0.5 * u
      }
    assert(pairs == expected)
    assert(pairs.contains((98L, 290L))) // known planted pair
  }

  test("mulmodP61 matches BigInt arithmetic across the operand range") {
    val p = BigInt(Hashing.P61)
    val vals = Seq(0L, 1L, 2L, Hashing.P61 - 1, Hashing.P61 / 2,
      0x1234_5678_9abc_def0L & (Hashing.P61 - 1), 0x0fff_ffff_ffff_fff7L)
    for (a <- vals; x <- vals) {
      val want = (BigInt(a) * BigInt(x)) % p
      assert(BigInt(Hashing.mulmodP61(a, x)) == want, s"a=$a x=$x")
    }
  }

  test("incremental dedup equals driver-side recomputation over the same index") {
    import spark.implicits._
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val idx = DedupOps.minhashIndex(corpus, md5Based = true)
    val got = DedupOps.minhashNearDupIncremental(batch, idx, docs, 0.5,
        md5Based = true)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // driver-side: band every doc, replay the engine's exact rules
    val local = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
      .filter(_._2.trim.nonEmpty)
    val bands = local.map { case (id, t) =>
      id -> Hashing.minhashBandsMd5(t, 128, 3, 32) }.toMap
    val inBatch = (id: Long) => id % 10 == 0
    val byKey = scala.collection.mutable.HashMap
      .empty[(Int, String), (List[Long], List[Long])] // (corpus, batch)
    bands.foreach { case (id, ks) =>
      ks.zipWithIndex.foreach { case (k, b) =>
        val e = byKey.getOrElse((b, k), (Nil, Nil))
        byKey((b, k)) = if (inBatch(id)) (e._1, id :: e._2) else (id :: e._1, e._2)
      }
    }
    val shingleSets = local.toMap.map { case (id, t) => id -> Hashing.shingleSet(t, 3) }
    def verified(p: (Long, Long)) = {
      val (i, u) = Hashing.jaccardCounts(shingleSets(p._1), shingleSets(p._2))
      i >= 0.5 * u
    }
    val cross = byKey.values.collect {
      case (corp, bat) if corp.nonEmpty && corp.size <= 64 && bat.nonEmpty =>
        for (c <- corp; b <- bat) yield (math.min(c, b), math.max(c, b))
    }.flatten.toSet
    val intra = byKey.values.collect {
      case (_, bat) if bat.size >= 2 && bat.size <= 64 =>
        bat.combinations(2).map(p => (p.min, p.max))
    }.flatten.toSet
    assert(got == (cross ++ intra).filter(verified))
    // the planted near-dups that span the batch/corpus split are found
    assert(got.nonEmpty)
  }

  test("minhash survivors drop one side of each pair") {
    val nPairs = DedupOps.minhashNearDupPairs(docs, 0.5).count()
    val survivors = DedupOps.minhashDedupSurvivors(docs, 0.5).count()
    assert(survivors < 500)
    assert(survivors >= 500 - nPairs)
  }

  test("simhash hamming<=3 finds the same planted dups") {
    val pairs = DedupOps.simhashNearDupPairs(docs, maxHamming = 3).collect()
    // coarser than minhash for word-level edits: catches 17 of 25 planted
    assert(pairs.length >= 15 && pairs.length <= 40, s"got ${pairs.length}")
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 267L && r.getAs[Long]("id_b") == 413L))
  }

  test("simhash maxHamming=0 finds exact-simhash duplicates (mask edge)") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashNearDupPairs(df, maxHamming = 0).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("id_a") == 1L && pairs.head.getAs[Long]("id_b") == 2L)
  }

  test("simhash near-dup pairs survive null and empty text rows") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"),
      (3L, null.asInstanceOf[String]), (4L, null.asInstanceOf[String]),
      (5L, "   "), (6L, ""))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashNearDupPairs(df, maxHamming = 3, md5Based = true)
      .collect() // must not NPE on the null simhashes
    // identical docs pair at hamming 0; null-text docs are dropped;
    // token-less docs (5, 6) share simhash 0 and pair with each other
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L
      && r.getAs[Long]("hamming") == 0L))
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 5L && r.getAs[Long]("id_b") == 6L))
    assert(!pairs.exists(r => r.getAs[Long]("id_a") == 3L || r.getAs[Long]("id_b") == 3L))
  }

  test("minhash near-dup pairs survive null text rows") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"),
      (3L, null.asInstanceOf[String]), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashNearDupPairs(df, 0.5).collect() // must not NPE
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L))
  }

  test("jaccard is symmetric and bounded") {
    val a = Hashing.shingleSet("the quick brown fox jumps over the lazy dog", 3)
    val b = Hashing.shingleSet("the quick brown fox leaps over the lazy dog", 3)
    val j = Hashing.jaccardSorted(a, b)
    assert(j == Hashing.jaccardSorted(b, a))
    assert(j > 0.0 && j < 1.0)
    assert(Hashing.jaccardSorted(a, a) == 1.0)
  }

  test("knn brute force: k neighbors per query, deterministic") {
    val queries = emb.filter(col("vec_id") < 5)
    val knn = Similarity.knnBruteForce(emb, queries, k = 5).collect()
    assert(knn.length == 25)
    val byQuery = knn.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach(rows => assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
    // no self-matches
    assert(knn.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
  }

  test("ivf knn recalls most brute-force neighbors") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.knnBruteForce(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.knnIvf(emb, queries, k = 5, nCells = 8, nProbe = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall") // nProbe=4 of 8 cells
  }

  test("IVF coarse centroids are bit-identical across partitionings (full-corpus trainer)") {
    val c1 = Similarity.trainCentroids(emb.repartition(1), nCells = 8)
    val c8 = Similarity.trainCentroids(emb.repartition(8), nCells = 8)
    assert(c1.length == 8)
    assert(c1.map(_.toSeq).toSeq == c8.map(_.toSeq).toSeq)
    // PQ codebooks train through the same fixed-point machinery
    val p1 = Similarity.trainPq(emb.repartition(1), m = 8, ks = 16)
    val p8 = Similarity.trainPq(emb.repartition(8), m = 8, ks = 16)
    assert(p1.map(_.map(_.toSeq).toSeq).toSeq == p8.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("lsh knn recalls brute-force neighbors and is deterministic") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.knnBruteForce(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.knnLsh(emb, queries, k = 5, nBits = 6, nProbe = 16)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // near-orthogonal 64-dim embeddings are LSH's worst case (bit
    // agreement prob ~0.6 for true neighbors); 16 of 64 buckets probed
    // via margin-ordered 1- and 2-bit flips recovers the majority
    assert(recall >= 0.5, s"LSH recall too low: $recall")
    val again = Similarity.knnLsh(emb, queries, k = 5, nBits = 6, nProbe = 16)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(approx == again) // deterministic hyperplanes, no RNG state
  }

  test("cosine near-dup blocking is EXACT: equals brute force at sf0.01") {
    import spark.implicits._
    val cos = udf((x: Seq[Float], y: Seq[Float]) =>
      Similarity.cosine(x.toArray, y.toArray))
    val a = emb.select(col("vec_id").as("id"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id2"), col("embedding").as("vb"))
    val exact = a.join(b, col("id") < col("id2"))
      .withColumn("sim", cos(col("va"), col("vb")))
      .filter(col("sim") >= 0.45)
      .select("id", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.cosineNearDupPairs(emb, 0.45, nCells = 22)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == exact,
      s"missing=${exact -- blocked} extra=${blocked -- exact}")
  }

  test("cosine near-dup chunking bounds a hot cell and stays exact") {
    import spark.implicits._
    // 300 near-parallel vectors: all of them land in ONE cell — the
    // regime where an unchunked collect_list materializes the entire
    // cell as a single multi-hundred-row task payload
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        if (d == 0) 1.0f else 0.01f * ((i * (d + 3)) % 17)).toSeq)
    }.toDF("vec_id", "embedding")
    val cos = udf((x: Seq[Float], y: Seq[Float]) =>
      Similarity.cosine(x.toArray, y.toArray))
    val aa = vecs.select(col("vec_id").as("id"), col("embedding").as("va"))
    val bb = vecs.select(col("vec_id").as("id2"), col("embedding").as("vb"))
    val exact = aa.join(bb, col("id") < col("id2"))
      .withColumn("sim", cos(col("va"), col("vb")))
      .filter(col("sim") >= 0.999)
      .select("id", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity
      .cosineNearDupPairs(vecs, 0.999, nCells = 1, maxCell = 16)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(blocked == exact,
      s"exact=${exact.size} blocked=${blocked.size} " +
        s"missing=${(exact -- blocked).take(5)} extra=${(blocked -- exact).take(5)}")
    // the chunk hash actually used splits the 300-member cell into
    // ceil(300/16)=19 groups whose sizes concentrate near 16 — no task
    // ever holds anything close to the whole cell
    val sizes = vecs
      .select(pmod(xxhash64(col("vec_id")), lit(19L)).as("c"))
      .groupBy("c").count().collect().map(_.getLong(1))
    assert(sizes.length == 19 && sizes.max <= 48, sizes.sorted.mkString(","))
  }

  test("simhash recursive blocking is EXACT: equals brute force (oversized bucket)") {
    import spark.implicits._
    // 400 docs drawn from a tiny shared vocabulary so simhashes
    // concentrate on few block values — the regime where a fixed bucket
    // cap silently dropped pairs
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val rnd = new scala.util.Random(7)
    val docsDf = (0 until 400).map { i =>
      (i.toLong, Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val hashes = DedupOps.simhashes(docsDf, md5Based = true).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact = (for {
      (ia, sa) <- hashes; (ib, sb) <- hashes
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val blocked = DedupOps.simhashNearDupPairs(docsDf, maxHamming = 3, md5Based = true)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == exact,
      s"exact=${exact.size} blocked=${blocked.size} missing=${(exact -- blocked).take(5)}")
  }

  test("pq knn recalls most brute-force neighbors after exact re-rank") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.knnBruteForce(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val pq = Similarity.knnPq(emb, queries, k = 5, m = 8, ks = 16, refine = 8).collect()
    assert(pq.length == 25)
    val approx = pq.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 64-dim random-ish embeddings compress 32x (256B -> 8B); with an
    // 8x-overfetch exact re-rank the shortlist recovers most true
    // neighbors despite the lossy codes
    assert(recall >= 0.5, s"PQ recall too low: $recall")
    // determinism: same corpus => same codebooks => same result
    val again = Similarity.knnPq(emb, queries, k = 5, m = 8, ks = 16, refine = 8).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(again == approx)
  }

  test("ivf-pq knn recall and determinism (composed index)") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.knnBruteForce(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivfpq = Similarity.knnIvfPq(emb, queries, k = 5,
      nCells = 8, nProbe = 6, m = 8, ks = 16, refine = 8).collect()
    assert(ivfpq.length == 25)
    val approx = ivfpq.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // two lossy stages compose (cell pruning x code quantization);
    // the exact re-rank recovers what the shortlist retains
    assert(recall >= 0.4, s"IVF-PQ recall too low: $recall")
    val again = Similarity.knnIvfPq(emb, queries, k = 5,
      nCells = 8, nProbe = 6, m = 8, ks = 16, refine = 8).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(again == approx)
  }

  test("winnowMd5Hex matches winnow structure and is deterministic") {
    val fp1 = Hashing.winnowMd5Hex("a b c d e f g h i j k l m n o p", 4, 4)
    val fp2 = Hashing.winnowMd5Hex("a b c d e f g h i j k l m n o q", 4, 4)
    assert(fp1.intersect(fp2).nonEmpty)
    assert(fp1.sameElements(Hashing.winnowMd5Hex("a b c d e f g h i j k l m n o p", 4, 4)))
    assert(fp1.forall(_.length == 16))
    assert(Hashing.winnowMd5Hex("", 4, 8).isEmpty)
    // md5Low64 matches DuckDB md5_number_lower('abc') = 8250560606382298838
    assert(Hashing.md5Low64("abc") == 8250560606382298838L)
  }

  test("winnow fingerprints: near-dup docs share most fingerprints") {
    val fp1 = Hashing.winnow("a b c d e f g h i j k l m n o p", 4, 4)
    val fp2 = Hashing.winnow("a b c d e f g h i j k l m n o q", 4, 4)
    val fp3 = Hashing.winnow("z y x w v u t s r q p o n m l k", 4, 4)
    assert(fp1.intersect(fp2).length > 0)
    assert(fp1.intersect(fp3).isEmpty)
    assert(fp1.sameElements(Hashing.winnow("a b c d e f g h i j k l m n o p", 4, 4)))
  }

  test("langid detects real language samples") {
    assert(LangId.detect("The quick brown fox jumps over the lazy dog and runs away into the forest") == "en")
    assert(LangId.detect("Der schnelle braune Fuchs springt über den faulen Hund und läuft in den Wald") == "de")
    assert(LangId.detect("Le renard brun rapide saute par dessus le chien paresseux dans la forêt") == "fr")
    assert(LangId.detect("El rápido zorro marrón salta sobre el perro perezoso y corre por el bosque") == "es")
    assert(LangId.detect("敏捷的棕色狐狸跳过了懒狗然后跑进了森林里面去了") == "zh")
    assert(LangId.detect("Быстрая коричневая лиса перепрыгивает через ленивую собаку") == "ru")
    assert(LangId.detect("") == "und")
    assert(LangId.detect("12345 67890 !!!") == "und")
  }

  test("repetition metrics count duplicate bigrams exactly") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val d = Seq(
      (1L, "a b a b a b"),       // bigrams: ab,ba,ab,ba,ab -> 5 total, 2 distinct, max 3
      (2L, "x y z"),             // xy,yz -> 2 total, 2 distinct, max 1
      (3L, "solo"),              // < 2 tokens -> zeros
      (4L, null.asInstanceOf[String]), // null text -> zeros
    ).toDF("doc_id", "text")
    val got = QualityScore.repetitionMetrics(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((5L, 2L, 3L)), got(1L))
    assert(got(2L) == ((2L, 2L, 1L)), got(2L))
    assert(got(3L) == ((0L, 0L, 0L)))
    assert(got(4L) == ((0L, 0L, 0L)))
    // the derived Gopher ratios: doc 1 dup fraction 3/5, top-gram 3/5
    val (t, dist, mx) = got(1L)
    assert((t - dist).toDouble / t == 0.6 && mx.toDouble / t == 0.6)
  }

  test("ngram novelty: df==1 grams are novel, shared grams are not, short/null docs zero") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c"),      // bigrams: "a b" (shared with doc 2), "b c" (unique)
      (2L, "a b a b"),    // distinct bigrams: "a b" (shared), "b a" (unique)
      (3L, "solo"),       // < 2 tokens -> zeros
      (4L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val got = QualityScore.ngramNovelty(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2L, 1L)), got(1L))
    assert(got(2L) == ((2L, 1L)), got(2L))
    assert(got(3L) == ((0L, 0L)))
    assert(got(4L) == ((0L, 0L)))
  }

  test("rank normalization equals the per-source window form, ties broken by id") {
    import spark.implicits._
    val d = Seq(
      (1L, "a", 10L), (2L, "a", 5L), (3L, "a", 10L), (4L, "a", 1L),
      (5L, "b", 7L), (6L, "b", 7L),
    ).toDF("doc_id", "source", "score")
    val got = QualityScore.rankNormalize(d, "source", "doc_id", "score")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("src_rank"), r.getAs[Long]("n_src")))).toMap
    // source a order by (score, id): 4(1), 2(5), 1(10), 3(10)
    assert(got(4L) == ((1L, 4L)) && got(2L) == ((2L, 4L)))
    assert(got(1L) == ((3L, 4L)) && got(3L) == ((4L, 4L)))
    assert(got(5L) == ((1L, 2L)) && got(6L) == ((2L, 2L)))
    // invariant under physical repartitioning
    val again = QualityScore.rankNormalize(d.repartition(5), "source", "doc_id", "score")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("src_rank"), r.getAs[Long]("n_src")))).toMap
    assert(again == got)
  }

  test("rank normalization never windows over a bare source partition") {
    import spark.implicits._
    val d = Seq((1L, "a", 10L)).toDF("doc_id", "source", "score")
    val p = QualityScore.rankNormalize(d, "source", "doc_id", "score")
      .queryExecution.executedPlan.toString
    // every row-data window partitions by (source, score), never source
    // alone; the source-only cumsum runs on aggregate rows upstream
    val rowWindows = "Window \\[row_number\\(\\)[^\\n]*".r.findAllIn(p).toList
    assert(rowWindows.nonEmpty)
    rowWindows.foreach(w => assert(w.contains("__rscore") || w.contains("score"),
      s"row_number window must include the score in its partition key: $w"))
  }

  test("quality metrics are integer-exact and score bounded") {
    val m = QualityScore.scored(docs).collect()
    assert(m.length == 500)
    m.foreach { r =>
      val score = r.getAs[Double]("quality_score")
      assert(score >= 0.0 && score <= 1.0)
      assert(r.getAs[Long]("n_stopwords") <= r.getAs[Long]("n_tokens"))
    }
  }
}
