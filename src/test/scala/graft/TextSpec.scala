package graft

import org.apache.spark.sql.{functions => F}
import graft.functions.{text => T}

class TextSpec extends SparkSuite {
  import spark.implicits._

  test("token counts") {
    val df = Seq("the quick  brown fox", "a b c").toDF("text")
    val out = df.select(T.tokenCount(F.col("text"))).as[Int].collect()
    assert(out.toSeq == Seq(4, 3))
  }

  test("bpeish segments split alpha runs, digits, and punctuation marks") {
    val out = Seq("hello world42 x!").toDF("text")
      .select(T.bpeishCount(F.col("text"))).as[Int].collect()
    // hello, world, 42, x, !
    assert(out.head == 5)
  }

  test("fingerprint is order- and duplication-insensitive") {
    val df = Seq("red green blue", "blue blue red green", "red green yellow").toDF("text")
    val fps = df.select(T.fingerprint(F.col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("stopword ratio and quality score ranges") {
    val df = Seq("the cat sat on the mat", "zz xx yy ww").toDF("text")
    val sw = df.select(T.stopwordRatio(F.col("text"))).as[Double].collect()
    assert(math.abs(sw(0) - 3.0 / 6.0) < 1e-12)
    assert(sw(1) == 0.0)
    val q = df.select(T.qualityScore(F.col("text"))).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("language guess picks the matching lexicon") {
    val df = Seq(
      "the cat and the dog is in that house it seems",
      "el perro y la casa de los amigos en que vivimos",
      "der hund und die katze ist nicht ein problem zu haben",
      "qqq www eee").toDF("text")
    val out = df.select(T.langGuess(F.col("text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "de", "und"))
  }
}
