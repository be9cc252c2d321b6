package graft

import graft.operators.Boilerplate
import org.apache.spark.sql.{functions => F}

class BoilerplateSpec extends SparkSuite {

  import spark.implicits._

  private val header = "COOKIE NOTICE: we use cookies"
  private val footer = "(c) example.com - all rights reserved"

  /** 6 docs share a header+footer; each has unique body lines. */
  private lazy val corpus = Seq(
    (1L, s"$header\nalpha body one\n\nalpha body two\n$footer"),
    (2L, s"$header\nbeta body\n$footer"),
    (3L, s"$header\ngamma body\n$footer"),
    (4L, s"$header\ndelta body\n$footer"),
    (5L, s"$header\n$footer"),
    (6L, "standalone document with no chrome"),
    (7L, s"repeated inside\nrepeated inside\nrepeated inside\nunique tail")
  ).toDF("doc_id", "text")

  private def cleanMap(minDf: Int, broadcast: Boolean = true): Map[Long, (String, Long)] =
    Boilerplate.dropBoilerplateLines(corpus, "doc_id", "text", minDf, broadcast)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("cross-document boilerplate lines are removed, unique prose survives in order") {
    val m = cleanMap(minDf = 3)
    assert(m(1L) == (("alpha body one\n\nalpha body two", 2L)), m(1L))
    assert(m(2L) == (("beta body", 2L)))
    assert(m(6L) == (("standalone document with no chrome", 0L)))
  }

  test("a doc made entirely of boilerplate becomes empty, with all lines counted dropped") {
    val m = cleanMap(minDf = 3)
    assert(m(5L) == (("", 2L)), m(5L))
  }

  test("blank lines are structure: never counted, never dropped") {
    val m = cleanMap(minDf = 2)
    // doc 1 keeps its paragraph break even though '' occurs in many docs
    assert(m(1L)._1.contains("\n\n"), m(1L))
  }

  test("within-doc repetition does not make a line boilerplate (df counts distinct docs)") {
    val m = cleanMap(minDf = 2)
    assert(m(7L) == ((s"repeated inside\nrepeated inside\nrepeated inside\nunique tail", 0L)), m(7L))
  }

  test("df threshold is exact: a line in minDf-1 docs survives") {
    // header/footer are in 5 docs; at minDf=6 nothing is boilerplate
    val m = cleanMap(minDf = 6)
    assert(m(2L) == ((s"$header\nbeta body\n$footer", 0L)), m(2L))
  }

  test("shuffle-join droplist path matches the broadcast path") {
    assert(cleanMap(3, broadcast = true) == cleanMap(3, broadcast = false))
  }

  test("output is one row per input row") {
    val out = Boilerplate.dropBoilerplateLines(corpus, "doc_id", "text", 3)
    assert(out.count() == corpus.count())
    assert(out.select("doc_id").distinct().count() == corpus.count())
  }

  test("payloadCols ride through unchanged, in schema order, without a join-back") {
    val withSrc = corpus.withColumn("source", F.concat(F.lit("s"), F.col("doc_id") % 2))
    val out = Boilerplate.dropBoilerplateLines(withSrc, "doc_id", "text", 3,
      payloadCols = Seq("source"))
    assert(out.columns.toSeq == Seq("doc_id", "source", "clean_text", "lines_dropped"))
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == withSrc.select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
    // the cleaned text is identical with or without payload threading
    val base = cleanMap(3)
    val withPay = out.collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(withPay == base)
  }
}
