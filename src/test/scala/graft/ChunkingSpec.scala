package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Chunking
import graft.sources.Tables

class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  private val chunk = 8
  private val overlap = 3
  private val step = chunk - overlap

  private def docsOf(ns: Seq[Int]) =
    ns.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(t => s"w${i}_$t").mkString(" "))
    }.toDF("doc_id", "text")

  test("chunks reconstruct the document exactly (all lengths 0..40, several windows)") {
    for ((c, o) <- Seq((chunk, overlap), (5, 0), (5, 4), (12, 6), (1, 0))) {
      val out = Chunking.chunkByTokens(docsOf(0 to 40), "doc_id", "text", c, o)
        .orderBy("doc_id", "chunk_id")
        .collect()
        .groupBy(_.getLong(0))
      for ((docId, rows) <- out) {
        val rebuilt = rows.sortBy(_.getLong(1)).zipWithIndex.flatMap { case (r, i) =>
          val toks = r.getString(4).split(" ").toSeq
          if (i == 0) toks else toks.drop(o)
        }
        val expected = (1 to (docId.toInt)).map(t => s"w${docId}_$t")
        assert(rebuilt.toSeq == expected, s"doc $docId mismatch at chunk=$c overlap=$o")
      }
    }
    // blank/empty docs emit nothing
    val blank = Seq((99L, "   "), (100L, "")).toDF("doc_id", "text")
    assert(Chunking.chunkByTokens(blank, "doc_id", "text", chunk, overlap).count() == 0)
  }

  test("window laws: sizes, overlap, last-chunk reach") {
    val rows = Chunking.chunkByTokens(docsOf(Seq(1, chunk, chunk + 1, 30)), "doc_id", "text",
      chunk, overlap).orderBy("doc_id", "chunk_id").collect()
    // docsOf indexes doc_id 0..3 with n = 1, chunk, chunk+1, 30
    val byDoc = rows.groupBy(_.getLong(0)).map { case (k, v) => (k, v.sortBy(_.getLong(1))) }
    // n <= chunk -> exactly one chunk of n tokens
    assert(byDoc(0L).length == 1 && byDoc(0L).head.getLong(3) == 1L)
    assert(byDoc(1L).length == 1 && byDoc(1L).head.getLong(3) == chunk.toLong)
    // n = chunk+1 -> two chunks, second longer than overlap
    assert(byDoc(2L).length == 2)
    assert(byDoc(2L)(1).getLong(3) > overlap)
    // general doc: all but last are full, last reaches the end
    val d30 = byDoc(3L)
    assert(d30.init.forall(_.getLong(3) == chunk.toLong))
    val last = d30.last
    assert(last.getLong(1) * step + last.getLong(3) == 30L, "last chunk must reach the end")
    // consecutive chunks share exactly `overlap` tokens
    d30.sliding(2).foreach { case Array(a, b) =>
      val aToks = a.getString(4).split(" ").toSeq
      val bToks = b.getString(4).split(" ").toSeq
      assert(aToks.takeRight(overlap) == bToks.take(overlap))
    }
  }

  test("chunking is map-only (no Exchange) and stays in codegen") {
    val out = Chunking.chunkByTokens(Tables.documents(spark, sf), "doc_id", "text", 64, 16)
    // string match: AdaptiveSparkPlanExec hides children from collect
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n${plan.take(1000)}")
    // one codegen span holds filter+split+explode+slice (renders as "*(1)")
    assert(plan.contains("*(1) Project"))
  }

  test("payload columns ride through to every chunk") {
    val docs = Seq((1L, "web", (1 to 20).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", 8, 3, payloadCols = Seq("source"))
      .collect()
    assert(out.length > 1)
    assert(out.forall(_.getString(1) == "web"), "payload must replicate per chunk")
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "source", "chunk_id", "n_tokens", "chunk_len", "chunk_text"))
  }

  test("zero overlap partitions the token stream") {
    val out = Chunking.chunkByTokens(docsOf(Seq(20)), "doc_id", "text", 8, 0)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getLong(3)).sum == 20L)
    assert(out.flatMap(_.getString(4).split(" ")).length == 20)
  }

  // ── chunkByLines (the line-boundary-respecting sibling) ──

  private def lineDocsOf(lineWords: Seq[Seq[Int]]) =
    lineWords.zipWithIndex.map { case (ls, i) =>
      (i.toLong,
        ls.zipWithIndex.map { case (n, j) =>
          (1 to n).map(t => s"d${i}l${j}w$t").mkString(" ")
        }.mkString("\n"))
    }.toDF("doc_id", "text")

  test("chunkByLines: greedy fold against a driver-side reference, every budget 1..40") {
    val shapes = Seq(
      Seq(3, 5, 2, 8, 1), Seq(12), Seq(1, 1, 1, 1, 1, 1), Seq(50, 2, 3),
      Seq(4, 0, 4, 0, 4), Seq(7, 9, 2, 2, 2, 11, 3))
    val docs = lineDocsOf(shapes.map(_.map(n => n)))
    for (budget <- 1 to 40) {
      val got = Chunking.chunkByLines(docs, "doc_id", "text", budget)
        .orderBy("doc_id", "chunk_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
      shapes.zipWithIndex.foreach { case (ws0, i) =>
        // blank lines in the fixture come from n=0 (empty string line)
        val ws = ws0
        // reference fold
        var cid = 0; var acc = 0
        val ref = ws.map { w =>
          if (acc + w > budget && acc > 0) { cid += 1; acc = w } else acc += w
          cid
        }
        val rows = got(i.toLong)
        assert(rows.map(_.getLong(1)).toSeq == (0 to ref.max).map(_.toLong),
          s"budget=$budget doc=$i chunk ids")
        val tokensPerChunk = ref.zip(ws).groupBy(_._1).view
          .mapValues(_.map(_._2).sum).toMap
        rows.foreach { r =>
          assert(r.getLong(3) == tokensPerChunk(r.getLong(1).toInt),
            s"budget=$budget doc=$i chunk=${r.getLong(1)} tokens")
        }
        // reconstruction: chunks joined with \n give back the document
        val full = docs.where(F.col("doc_id") === i).collect().head.getString(1)
        assert(rows.map(_.getString(4)).mkString("\n") == full,
          s"budget=$budget doc=$i reconstruction")
      }
    }
  }

  test("chunkByLines: oversized line sits alone (anchored-greedy law)") {
    val out = Chunking.chunkByLines(lineDocsOf(Seq(Seq(3, 50, 4))), "doc_id", "text", 10)
      .orderBy("chunk_id").collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L)) // one line per chunk here
    assert(out(1).getLong(3) == 50L) // the oversized line, alone, over budget
    assert(out(0).getLong(3) <= 10 && out(2).getLong(3) <= 10)
  }

  test("chunkByLines is map-only (no Exchange)") {
    val plan = Chunking.chunkByLines(lineDocsOf(Seq(Seq(3, 4))), "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunkByLines must not shuffle:\n${plan.take(800)}")
  }

  test("chunkByLines: payloads ride through; blank lines flow with their chunk") {
    val docs = Seq((1L, "web", "a b c\n\nd e f")).toDF("doc_id", "source", "text")
    val out = Chunking.chunkByLines(docs, "doc_id", "text", 10, payloadCols = Seq("source"))
      .collect()
    assert(out.length == 1 && out.head.getString(1) == "web")
    assert(out.head.getAs[Long]("chunk_lines") == 3L)
    assert(out.head.getAs[Long]("chunk_tokens") == 6L)
    assert(out.head.getAs[String]("chunk_text") == "a b c\n\nd e f")
  }
}
