package graft

import graft.ops.{TextOps, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured evidence for the size-parameterized banding keys (the round-3
  * "weak at corpus scale" pair): candidate-pair counts at two corpus sizes
  * (n and 4n) under the default and the scaled configs.
  *
  * What the numbers must show:
  *  - the DEFAULT keys (8-bit simhash blocks / 8 hyperplanes) generate
  *    spurious candidates ∝ n²/K with small K — growth from n to 4n is
  *    ~quadratic (≈16×) because the key space is saturated;
  *  - the SCALED keys (16-bit blocks / 16 planes) cut candidates by orders
  *    of magnitude and their growth stays well below quadratic at these
  *    sizes (the true-pair linear term dominates the shrunken n²/K term);
  *  - recall of planted duplicates is UNCHANGED at the scaled config
  *    (pigeonhole still guarantees radius nBlocks-1; identical vectors
  *    always share every signature).
  */
class BandingScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic corpus: `n` docs of 30 words from a 5000-word vocab,
    * every 20th doc duplicated exactly (doc_id + 1000000) — so true pairs
    * grow linearly with n while spurious banding collisions grow with n²/K.
    */
  private def textCorpus(n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = (0 until n).map { i =>
      (i.toLong, (0 until 30).map(_ => s"w${rnd.nextInt(5000)}").mkString(" "))
    }
    val dups = base.filter(_._1 % 20 == 0).map { case (id, t) => (id + 1000000L, t) }
    spark.createDataset(base ++ dups).toDF("doc_id", "text").repartition(8)
  }

  /** Clustered corpus (the shape a real embedding dedup sees): n/10 cluster
    * centers with 10 members each (center + 5% noise, pairwise angle ≈ 3°),
    * so TRUE near-dup pairs (same cluster) grow linearly with n while
    * spurious banding collisions grow with n²/K. vec_id = cluster*10+member,
    * so cluster membership is `vec_id / 10` — spurious pairs are countable
    * exactly.
    */
  private def vecCorpus(n: Int) = {
    import spark.implicits._
    val rows = (0 until n / 10).flatMap { c =>
      val rnd = new scala.util.Random(1000 + c)
      val center = Array.fill(32)(rnd.nextGaussian())
      (0 until 10).map { m =>
        ((c * 10 + m).toLong, center.map(_ + 0.05 * rnd.nextGaussian()))
      }
    }
    spark.createDataset(rows).toDF("vec_id", "nv").repartition(8)
  }

  test("simhash: 16-bit blocks cut candidates ~2 orders and break the quadratic trend") {
    val (n1, n2) = (1500, 6000)
    def count(n: Int, bits: Int): Long =
      TextOps.simhashCandidates(spark, textCorpus(n), blockBits = bits).count()
    val c8a = count(n1, 8); val c8b = count(n2, 8)
    val c16a = count(n1, 16); val c16b = count(n2, 16)
    val g8 = c8b.toDouble / c8a
    val g16 = c16b.toDouble / c16a
    info(f"blockBits=8:  n=$n1 -> $c8a%,d cands, n=$n2 -> $c8b%,d (growth $g8%.1fx)")
    info(f"blockBits=16: n=$n1 -> $c16a%,d cands, n=$n2 -> $c16b%,d (growth $g16%.1fx)")
    // Default keys: spurious term n²/32 dominates → ~quadratic growth.
    assert(g8 > 10.0, s"expected ~16x quadratic growth at 8-bit blocks, got $g8")
    // Scaled keys: 512x smaller spurious term → far fewer candidates and
    // growth well below the 16x quadratic signature at these sizes.
    assert(c16a * 50 < c8a && c16b * 50 < c8b,
      s"expected >=50x candidate reduction at 16-bit blocks ($c8a->$c16a, $c8b->$c16b)")
    assert(g16 < g8 / 1.5 && g16 < 12.0,
      s"expected sub-quadratic growth at 16-bit blocks, got $g16 (8-bit: $g8)")
  }

  test("simhash: 16-bit blocks keep 100% recall inside the pigeonhole radius (3)") {
    val corpus = textCorpus(1500)
    val found = TextOps.simhashCandidates(spark, corpus, blockBits = 16)
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Ground truth by brute force over the collected fingerprints.
    graft.functions.SimhashBits.register(spark)
    val fps = corpus.select(col("doc_id"),
        call_function("simhash_bits", col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val truth = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa(0) ^ fb(0)) + java.lang.Long.bitCount(fa(1) ^ fb(1))
      if h <= 3
    } yield (a, b)).toSet
    assert(truth.nonEmpty, "corpus must contain planted radius-0 pairs")
    assert(found == truth,
      s"16-bit banding missed ${truth -- found} / invented ${found -- truth}")
  }

  test("simhash: 1-bit multi-index probes restore radius-7 recall at 16-bit blocks, still ≪ 8-bit candidates") {
    val (n1, n2) = (1500, 6000)
    def count(n: Int, bits: Int, probe: Int): Long =
      TextOps.simhashCandidates(spark, textCorpus(n), blockBits = bits, probeRadius = probe).count()
    val c8a = count(n1, 8, 0); val c8b = count(n2, 8, 0)
    val cpa = count(n1, 16, 1); val cpb = count(n2, 16, 1)
    info(f"8-bit exact:      n=$n1 -> $c8a%,d cands, n=$n2 -> $c8b%,d")
    info(f"16-bit + probes:  n=$n1 -> $cpa%,d cands, n=$n2 -> $cpb%,d")
    // Same radius-7 guarantee as the 8-bit config, at a fraction of the
    // candidate mass (expected ratio ~ (17·4/2^16)/(8/2^8) ≈ 1/30).
    assert(cpa * 5 < c8a && cpb * 5 < c8b,
      s"expected >=5x candidate reduction vs 8-bit blocks ($c8a->$cpa, $c8b->$cpb)")
    // Recall: the probed candidate set must contain EVERY radius-7 pair
    // (ground truth by brute force over collected fingerprints).
    val corpus = textCorpus(n1)
    graft.functions.SimhashBits.register(spark)
    val fps = corpus.select(col("doc_id"),
        call_function("simhash_bits", col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val truth = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa(0) ^ fb(0)) + java.lang.Long.bitCount(fa(1) ^ fb(1))
      if h <= 7
    } yield (a, b)).toSet
    val found = TextOps.simhashCandidates(spark, corpus, blockBits = 16, probeRadius = 1)
      .filter(col("hamming") <= 7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "corpus must contain planted pairs")
    assert(found == truth,
      s"multi-index probing missed ${truth -- found} / invented ${found -- truth}")
  }

  test("embedding LSH: 16 planes collapse spurious candidates; recall compensated by tables") {
    import org.apache.spark.sql.DataFrame
    val (n1, n2) = (1000, 4000)
    val spuriousF = floor(col("id_a") / 10) =!= floor(col("id_b") / 10)
    def stats(n: Int, planes: Int, tables: Int = 4): (Long, Long) = {
      val c = VectorOps.lshCandidatePairs(vecCorpus(n), planes, tables, dim = 32)
      val rows = c.select(count(lit(1)), count(when(spuriousF, 1))).head
      (rows.getLong(0), rows.getLong(1))
    }
    val (c8a, s8a) = stats(n1, 8); val (c8b, s8b) = stats(n2, 8)
    val (c16a, s16a) = stats(n1, 16); val (c16b, s16b) = stats(n2, 16)
    val g8 = c8b.toDouble / c8a
    val g16 = c16b.toDouble / c16a
    info(f"nPlanes=8:  n=$n1 -> $c8a%,d cands ($s8a%,d spurious), n=$n2 -> $c8b%,d ($s8b%,d) growth $g8%.1fx")
    info(f"nPlanes=16: n=$n1 -> $c16a%,d cands ($s16a%,d spurious), n=$n2 -> $c16b%,d ($s16b%,d) growth $g16%.1fx")
    // Default keys: the n²/2^8 spurious term dominates → ~quadratic growth.
    assert(g8 > 8.0, s"expected near-quadratic growth at 8 planes, got $g8")
    // Scaled keys: spurious collapses (>=40x both sizes) and total candidate
    // growth tracks the LINEAR true-pair term, not n².
    assert(s16a * 40 < s8a && s16b * 40 < s8b,
      s"expected >=40x spurious reduction at 16 planes ($s8a->$s16a, $s8b->$s16b)")
    assert(g16 < 7.0 && g16 < g8 / 1.8,
      s"expected near-linear growth at 16 planes, got $g16 (8 planes: $g8)")
    // Recall at the scaled config: stricter buckets lose some near-dup pairs
    // per table; raising `tables` recovers them (the standard LSH trade).
    val truePairs = (n1 / 10) * (10 * 9 / 2).toLong
    def recall(tables: Int): Double = {
      val (c, s) = stats(n1, 16, tables)
      (c - s).toDouble / truePairs
    }
    val r4 = recall(4); val r8 = recall(8)
    info(f"recall of same-cluster pairs at 16 planes: tables=4 -> $r4%.4f, tables=8 -> $r8%.4f")
    assert(r4 > 0.95, s"16-plane/4-table recall too low: $r4")
    assert(r8 >= r4 && r8 > 0.99, s"doubling tables must recover recall: $r4 -> $r8")
  }

  test("IVF: candidates per query are a ~nprobe/nlist corpus fraction; growth linear in n") {
    val nQueries = 20
    // The REAL quantizer: hash-stratified centroid sample (the same
    // ivfCentroids annIvf runs), at both nlist configs.
    def count(n: Int, nlist: Int, nprobe: Int): Long = {
      val vecs = vecCorpus(n).withColumnRenamed("nv", "v")
      val cents = VectorOps.ivfCentroids(vecs, nlist)
      VectorOps.ivfCandidates(vecs, cents, nQueries, nprobe).count()
    }
    val (n1, n2) = (2000, 8000)
    val c1 = count(n1, 16, 4); val c2 = count(n2, 16, 4)
    val brute1 = nQueries.toLong * (n1 - 1); val brute2 = nQueries.toLong * (n2 - 1)
    val f1 = c1.toDouble / brute1; val f2 = c2.toDouble / brute2
    val g = c2.toDouble / c1
    info(f"nlist=16/nprobe=4: n=$n1 -> $c1%,d cands (${f1 * 100}%.1f%% of brute force), " +
      f"n=$n2 -> $c2%,d (${f2 * 100}%.1f%%), growth $g%.1fx")
    // Probing replaces the full per-query scan with a bounded corpus
    // fraction (nprobe/nlist = 25% nominal; imbalance tolerance 2x)…
    assert(f1 < 0.5 && f2 < 0.5, s"candidates not bounded by probing: $f1, $f2")
    // …and candidate growth is LINEAR in n (4x corpus -> ~4x candidates),
    // never the quadratic growth of a saturated banding key.
    assert(g < 6.0, s"expected ~4x linear candidate growth, got $g")
    // More cells at fixed nprobe cut the probed fraction proportionally.
    val c1w = count(n1, 64, 4)
    info(f"nlist=64/nprobe=4: n=$n1 -> $c1w%,d cands (${c1w * 100.0 / brute1}%.1f%% of brute force)")
    assert(c1w * 2 < c1, s"quadrupling nlist must cut candidates ($c1 -> $c1w)")
  }

  test("IVF: hash-stratified centroids keep cells balanced at two corpus sizes") {
    // Cell balance is the whole point of IVF: the per-query cost bound
    // n·nprobe/nlist only holds when no cell hoards the corpus. The
    // hash-stratified sample places centroids with probability proportional
    // to data density (a uniform random sample of the corpus), so on this
    // CLUSTERED corpus — the skewed shape an untrained first-n quantizer
    // degrades on — max/mean population stays a small constant.
    def balance(n: Int, nlist: Int): (Long, Double, Long) = {
      val vecs = vecCorpus(n).withColumnRenamed("nv", "v")
      val cents = VectorOps.ivfCentroids(vecs, nlist)
      val pops = VectorOps.ivfAssignments(vecs, cents)
        .groupBy("cid").count().select("count")
        .collect().map(_.getLong(0))
      val mean = n.toDouble / pops.length
      (pops.max, mean, pops.length.toLong)
    }
    for (n <- Seq(2000, 8000)) {
      val (mx, mean, cells) = balance(n, 16)
      info(f"n=$n%,d nlist=16: $cells cells, max pop $mx%,d, mean $mean%.0f, max/mean ${mx / mean}%.2fx")
      assert(cells >= 14, s"hash strata should nearly all be hit, got $cells/16")
      assert(mx / mean <= 4.0,
        f"cell imbalance ${mx / mean}%.2fx exceeds 4x at n=$n (max $mx, mean $mean%.0f)")
    }
  }
}
