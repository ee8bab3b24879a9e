package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.sources.Tables

class DedupSpec extends SparkSpec {

  test("exact dedup: one row per distinct text, copies sum to row count") {
    val docs = Tables.documents(spark, sf)
    val rows = Dedup.exactDedup(spark, sf).collect()
    assert(rows.length === docs.select(col("text")).distinct().count())
    assert(rows.map(_.getAs[Long]("n_copies")).sum === docs.count())
  }

  test("hash-based exact dedup groups identically to text-based") {
    val byText = Dedup.exactDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byHash = Dedup.exactDedupByHash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byText === byHash)
  }

  test("minhash signatures: one per doc, all in [0, P)") {
    val sig = Dedup.minhashSignatures(spark, sf).collect()
    assert(sig.length === Tables.documents(spark, sf).count())
    sig.foreach { r =>
      (0 until Dedup.numHashes).foreach { j =>
        val s = r.getAs[Long](s"sig_$j")
        assert(s >= 0 && s < Dedup.P)
      }
    }
  }

  test("minhash LSH pairs: subset of brute-force pairs with high recall") {
    val brute = Dedup.jaccardPairsBrute(spark, sf, maxDocId = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDupPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "corpus should contain planted near-dups")
    // precision is exact: every LSH pair is Jaccard-verified
    assert(lsh.subsetOf(brute))
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"minhash recall $recall below 0.8")
  }

  test("simhash: near-dup texts land within small hamming distance") {
    val sig = Dedup.simhash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sig.size === Tables.documents(spark, sf).count())
    val nearDups = Dedup.jaccardPairsBrute(spark, sf, maxDocId = Long.MaxValue,
      minJaccard = 0.95).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    val hammings = nearDups.map { case (a, b) =>
      java.lang.Long.bitCount(sig(a) ^ sig(b))
    }
    // ≥95% shingle overlap → expect most simhashes within a few bits
    assert(hammings.count(_ <= 3).toDouble / hammings.length >= 0.7)
  }

  test("simhash pairs: hamming verified and consistent with signatures") {
    val sig = Dedup.simhash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    val pairs = Dedup.simhashDupPairs(spark, sf).collect()
    pairs.foreach { r =>
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming"))
      assert(a < b)
      assert(h <= 3)
      assert(h === java.lang.Long.bitCount(sig(a) ^ sig(b)))
    }
  }

  test("dup clusters: edge endpoints share a rep; rep is the component minimum") {
    val edges = Dedup.minhashDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rep = Dedup.dupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every edge endpoint is labeled, and both ends agree
    edges.foreach { case (a, b) =>
      assert(rep.contains(a) && rep.contains(b))
      assert(rep(a) === rep(b), s"edge ($a,$b) split across clusters")
    }
    // rep is a member of its own cluster and is the minimum member
    rep.groupBy(_._2).foreach { case (r, members) =>
      assert(members.keySet.min === r)
    }
    // reference union-find over the same edges gives identical components
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    rep.foreach { case (d, r) => assert(find(d) === r, s"doc $d") }
  }

  test("embedding near-dup pairs: ordered, cosine above threshold") {
    val rows = Dedup.embeddingDupPairs(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val c = r.getAs[Double]("cos_sim")
      assert(c >= 0.4 && c <= 1.0 + 1e-9)
    }
  }

  test("embedding LSH near-dup: exact precision, usable recall vs brute force") {
    val brute = Dedup.embeddingDupPairs(spark, sf, maxVecId = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingDupPairsLsh(spark, sf).collect()
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision exact by construction: every LSH pair is a true pair
    assert(lshPairs.subsetOf(brute),
      s"false positives: ${lshPairs.diff(brute).take(5)}")
    lsh.foreach(r => assert(r.getAs[Double]("cos_sim") >= 0.4 - 1e-9))
    // recall: bucket collisions must surface most true pairs
    val recall = lshPairs.intersect(brute).size.toDouble / math.max(1, brute.size)
    assert(recall >= 0.5, s"LSH recall $recall below 0.5 (${brute.size} true pairs)")
  }
}
