package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends SparkSuite {

  test("embeddingPairsLsh finds cross-cell near-dups the cell-blocked variant misses") {
    import org.apache.spark.sql.{functions => F}
    val e = graft.sources.Tables.embeddings(spark, sf)
    // ground truth: ALL pairs at cos >= 0.35, regardless of cell
    val rows = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val truth = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      if cos(rows(i)._2, rows(j)._2) >= 0.35
    } yield (math.min(rows(i)._1, rows(j)._1), math.max(rows(i)._1, rows(j)._1))).toSet
    assert(truth.nonEmpty, "fixture must contain near-dup pairs")

    val got = graft.operators.Dedup.embeddingPairsLsh(e, "vec_id", "embedding", threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no false positives (exact cosine verify) and solid recall
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth)}")
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.7, s"recall $recall too low (${got.size}/${truth.size})")

    // and it must find pairs the label-blocked variant cannot see
    val blocked = graft.operators.Dedup.embeddingPairs(e, "vec_id", "embedding", "label",
        threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.diff(blocked).nonEmpty, "fixture has no cross-cell pairs; test is vacuous")
    assert(got.diff(blocked).nonEmpty, "LSH variant found nothing beyond cell blocking")
  }
  import spark.implicits._

  test("exact dedup collapses identical texts to min id") {
    val df = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "cc dd")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "text", "doc_id").orderBy("keep_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash est_jaccard tracks exact n-gram jaccard on near-identical docs") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = a + " tomorrow"          // high overlap
    val c = "completely different words nothing shared here at all whatsoever believe me"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(df, "doc_id", "text", threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((1L, 2L)), "near-identical pair must survive LSH + threshold")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    assert(pairs((1L, 2L)) > 0.5)
  }

  test("pinned minhash face: exact duplicates score 1.0, estimator tracks exact jaccard") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = a + " tomorrow"          // high overlap
    val c = "completely different words nothing shared here at all whatsoever believe me"
    val df = Seq((1L, a), (2L, b), (3L, c), (101L, a)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairsPinned(df, "doc_id", "text", threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // an exact duplicate shares every signature slot: estimate is exactly 1.0
    assert(pairs.get((1L, 101L)).contains(1.0),
      s"exact duplicate must band together and score 1.0, got $pairs")
    assert(pairs.contains((1L, 2L)), "near-identical pair must survive banding + threshold")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    assert(pairs((1L, 2L)) > 0.5)
    // estimates are multiples of 1/k by construction
    pairs.values.foreach(v => assert((v * 12).round / 12.0 == v, s"non-slot-fraction estimate $v"))
  }

  test("pinned minhash face rejects k not divisible by bands") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashPairsPinned(df, "doc_id", "text", k = 10, bands = 4)
    }
  }

  test("ngram jaccard pairs verify exact overlap on LSH candidates") {
    val docs = Tables.documents(spark, sf)
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every reported pair's jaccard must genuinely exceed the threshold,
    // recomputed independently per pair
    val byId = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def sh(t: String): Set[String] =
      t.trim.toLowerCase.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    got.foreach { case (a, b, j) =>
      val (sa, sb) = (sh(byId(a)), sh(byId(b)))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(exact - j) < 1e-9, s"pair ($a,$b)")
      assert(j >= 0.5)
    }
    assert(got.nonEmpty)
  }

  test("all-pairs exact jaccard is a superset of the LSH face with identical values") {
    val docs = Tables.documents(spark, sf)
    def asMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val all = asMap(Dedup.ngramJaccardAllPairs(docs, "doc_id", "text", threshold = 0.5))
    val lsh = asMap(Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5))
    assert(all.nonEmpty)
    // LSH candidates can only MISS true pairs, never invent them, and
    // a shared pair's exact value is bit-identical (same expression)
    assert(lsh.keySet.subsetOf(all.keySet),
      s"LSH face emitted pairs the exact face lacks: ${lsh.keySet -- all.keySet}")
    lsh.foreach { case (k, v) => assert(all(k) == v, s"value drift on $k") }
    // and on this fixture the banding recall is high
    assert(lsh.size >= (all.size * 0.7).toInt,
      s"LSH recall collapsed: ${lsh.size}/${all.size}")
  }

  test("simhash hamming distance is 0 for identical docs, large for disjoint ones") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val c = "one two three four five six seven eight"
    val df = Seq((1L, a), (2L, a), (3L, c)).toDF("doc_id", "text")
    val sims = Dedup.simhashes(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(3L)) > 10)
    val pairs = Dedup.simhashPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("pinned simhash face: hamming 0 for identical docs, fingerprint matches a reference fold") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "alpha beta gamma delta epsilon zeta eta iota" // one token differs
    val c = "one two three four five six seven eight"
    val df = Seq((1L, a), (2L, a), (3L, b), (4L, c)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairsPinned(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0), "identical docs must pair at hamming 0")
    // no pair with the disjoint doc under the default threshold
    assert(!pairs.keySet.exists { case (x, y) => x == 4L || y == 4L })

    // fingerprint law: reimplement the vote fold independently
    def refSim(text: String): Long = {
      val toks = text.trim.toLowerCase.split("\\s+")
      val votes = Array.fill(52)(0L)
      for (t <- toks) {
        val h = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(13), 16)
        for (j <- 0 until 52) votes(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
      }
      (0 until 52).map(j => if (votes(j) > 0) 1L << j else 0L).sum
    }
    // pair (1,3): one-token edit — hamming must equal the reference fingerprints' distance
    pairs.get((1L, 3L)).foreach { hm =>
      assert(hm == java.lang.Long.bitCount(refSim(a) ^ refSim(b)))
    }
    // and the reference distance itself must be small enough to band-collide
    assert(java.lang.Long.bitCount(refSim(a) ^ refSim(b)) <
      java.lang.Long.bitCount(refSim(a) ^ refSim(c)))
  }

  test("pinned simhash face rejects bits not divisible by bands, bits > 52") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashPairsPinned(df, "doc_id", "text", bits = 30, bands = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashPairsPinned(df, "doc_id", "text", bits = 56, bands = 4)
    }
  }

  test("embeddingDropList: exact clusters collapse, near reps drop, survivors are clean") {
    // 3 exact clusters (A: 1,4,7 / B: 2,5 / C: 3) where A≈B near-dup
    // and C is orthogonal-ish
    val a = Array(1.0f, 0.0f, 0.0f, 0.1f)
    val b = Array(0.99f, 0.05f, 0.0f, 0.1f) // cos(a,b) ~ 0.995
    val c = Array(0.0f, 0.0f, 1.0f, 0.0f)
    val df = Seq((1L, a), (4L, a), (7L, a), (2L, b), (5L, b), (3L, c))
      .toDF("vec_id", "embedding")
    val got = Dedup.embeddingDropList(df, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    // exact: 4,7 -> 1 and 5 -> 2; near: rep 2 drops against rep 1
    assert(got.toSeq == Seq((2L, 1L, "near"), (4L, 1L, "exact"), (5L, 2L, "exact"), (7L, 1L, "exact")))
    // survivors = everything minus drop list = {1, 3}
    val dropped = got.map(_._1).toSet
    assert(Set(1L, 2L, 3L, 4L, 5L, 7L).diff(dropped) == Set(1L, 3L))
  }

  test("embeddingDropList output is LINEAR in replicas where pairs are quadratic") {
    val e = Tables.embeddings(spark, sf).orderBy("vec_id").limit(50)
    val maxId = e.agg(F.max("vec_id")).head().getLong(0) + 1
    val replicated = (0 until 5).map(i =>
      e.select((F.col("vec_id") + F.lit(i * maxId)).as("vec_id"), F.col("embedding")))
      .reduce(_ unionByName _)
    val n = replicated.count()
    val drops = Dedup.embeddingDropList(replicated, "vec_id", "embedding", threshold = 0.35)
    // every id appears at most once => output bounded by corpus size
    assert(drops.count() == drops.select("drop_id").distinct().count())
    assert(drops.count() < n)
    // each replica beyond the first must drop as an exact dup: >= 4/5 of rows
    assert(drops.filter($"reason" === "exact").count() == (n - n / 5),
      "all exact replicas beyond the representative must drop")
    // whereas the pairs API on the same corpus is quadratic in cluster size:
    val pairCount = Dedup.embeddingPairsLsh(replicated, "vec_id", "embedding", threshold = 0.35).count()
    assert(pairCount > 2 * drops.count(),
      s"fixture sanity: pairs ($pairCount) should dwarf drop rows (${drops.count()})")
  }

  test("textDropList: exact clusters collapse on content hash, near reps drop via minhash") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = a + " tomorrow" // near-dup of a
    val c = "completely different words nothing shared here at all whatsoever believe me"
    val df = Seq((1L, a), (4L, a), (7L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = Dedup.textDropList(df, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(got.toSeq == Seq((2L, 1L, "near"), (4L, 1L, "exact"), (7L, 1L, "exact")))
    // output linear under replication: every id at most once
    val rep5 = (0 until 5).map(i =>
      df.select((F.col("doc_id") + F.lit(i * 100L)).as("doc_id"), F.col("text")))
      .reduce(_ unionByName _)
    val drops = Dedup.textDropList(rep5, "doc_id", "text", threshold = 0.3)
    assert(drops.count() == drops.select("drop_id").distinct().count())
    assert(drops.filter($"reason" === "exact").count() >= 20,
      "each text now has 5 exact copies: 4/5 of every cluster must drop exact")
  }

  test("connectedComponents matches a reference union-find on random graphs") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 4) {
      val n = 60
      val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // plain-Scala union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // min node id per component is the expected root
      val rootOf = nodes.groupBy(id => find(id.toInt)).values
        .flatMap { comp => val m = comp.min; comp.map(_ -> m) }.toMap
      val sizeOf = rootOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap

      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got.keySet == nodes.toSet, s"trial $trial: node set mismatch")
      nodes.foreach { id =>
        assert(got(id)._1 == rootOf(id), s"trial $trial: root($id)")
        assert(got(id)._2 == sizeOf(rootOf(id)), s"trial $trial: size($id)")
      }
    }
  }

  test("connectedComponents closes transitive chains the drop list leaves open") {
    // path graph 0-1-2-...-9: max diameter per edge count — A~B, B~C
    // never gives A~C as a pair, but they are one duplicate cluster
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(chain, "id_a", "id_b").collect()
    assert(out.length == 10)
    assert(out.forall(r => r.getLong(1) == 0L && r.getLong(2) == 10L))
    // two components + duplicate/reversed input pairs
    val two = Seq((5L, 3L), (3L, 5L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val m = Dedup.connectedComponents(two, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m == Map(3L -> ((3L, 3L)), 4L -> ((3L, 3L)), 5L -> ((3L, 3L)),
      10L -> ((10L, 2L)), 11L -> ((10L, 2L))))
    // empty input: empty output, right schema
    val empty = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b")
    assert(empty.columns.toSeq == Seq("id", "root", "cluster_size"))
    assert(empty.count() == 0)
  }

  test("connectedComponents reliable-checkpoint path: identical result, intermediate stages cleaned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt-").toString
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(chain, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val durable = Dedup.connectedComponents(chain, "id_a", "id_b", checkpointDir = Some(dir))
    val got = durable.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == local)
    // rotation: every round dropped its predecessor — exactly one
    // edges-* stage (the last, backing the returned frame) remains
    val stages = new java.io.File(dir).listFiles().filter(_.getName.startsWith("edges-"))
    assert(stages.length == 1, s"stale stages: ${stages.map(_.getName).mkString(",")}")
    // caller-owned cleanup releases everything
    graft.operators.Staging.drop(spark, dir)
    assert(!new java.io.File(dir).exists())
  }

  test("embedding pairs match brute-force within-cell cosine at threshold") {
    val e = Tables.embeddings(spark, sf)
    val got = Dedup.embeddingPairs(e, "vec_id", "embedding", "label", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = e.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble), r.getInt(2)))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    val want = (for {
      (ia, va, la) <- rows; (ib, vb, lb) <- rows
      if la == lb && ia < ib && cos(va, vb) >= 0.3
    } yield (ia, ib)).toSet
    assert(got == want)
  }

  test("editDistancePairs matches brute-force levenshtein where banding is complete") {
    import org.apache.spark.sql.{functions => F}
    val spark2 = spark
    import spark2.implicits._
    val names = Seq(
      "lavender chiffon", "lavender chiffox", "lavender chiffonne", // 1 and 2 edits
      "midnight plum", "midnight plumb", "midnight pluum",
      "crimson steel", "completely different phrase", "crimson steal")
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = graft.operators.Dedup.editDistancePairs(df, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      i <- names.indices; j <- names.indices
      if i < j && lev(names(i), names(j)) <= 2
    } yield (i.toLong, j.toLong, lev(names(i), names(j)))).toSet
    // every name is >= q*(k+1) = 9 chars, so candidates are complete
    assert(got == want && want.nonEmpty)
    // the threshold bites: a 3-edit pair exists and is excluded
    assert(lev(names(0), names(2)) <= 2 && lev(names(3), names(5)) <= 2)
    assert(!got.exists { case (a, b, _) => (a, b) == (6L, 7L) })
  }
}
