package graft

import org.apache.spark.sql.{functions => F}

/** APPROX_TOP_SUM — weighted SpaceSaving: exact-regime equality with
  * the plain group-sum top-k, partition invariance there, SpaceSaving
  * bounds and heavy-hitter survival under forced eviction.
  */
class TopSumSpec extends SparkSuite {
  import spark.implicits._

  private def data(n: Int): org.apache.spark.sql.DataFrame =
    Seq.tabulate(n)(i => (s"u${i % 23}", (i % 7 + 1).toLong))
      .toDF("item", "w")

  test("exact regime: equals the plain group-sum top-k; partition-order invariant") {
    val df = data(500)
    df.createOrReplaceTempView("ts_t")
    val got = GraftSql.load(spark,
      """SELECT APPROX_TOP_SUM(item, w, 5) AS tk FROM ts_t""")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    val want = df.groupBy("item").agg(F.sum("w").as("s"))
      .orderBy(F.col("s").desc, F.col("item")).limit(5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    // capacity >= distinct items => exact regardless of partitioning
    // (the raw registry form keeps the per-item error field)
    for (parts <- Seq(1, 7, 32)) {
      df.repartition(parts).createOrReplaceTempView("ts_p")
      val g = GraftSql.load(spark,
        "SELECT graft_approx_top_sum(item, w, 5, 1000) AS tk FROM ts_p")
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(g.map(t => (t._1, t._2)) == want, s"parts=$parts")
      assert(g.forall(_._3 == 0L), "exact regime carries zero error")
    }
  }

  test("grouped: one sketch per group, BigQuery's struct field names") {
    data(300).withColumn("g", F.expr("length(item) % 2"))
      .createOrReplaceTempView("ts_g")
    val rows = GraftSql.load(spark,
      """SELECT g, APPROX_TOP_SUM(item, w, 3) AS tk FROM ts_g GROUP BY g ORDER BY g""")
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val tk = r.getSeq[org.apache.spark.sql.Row](1)
      assert(tk.size == 3)
      assert(tk.map(_.getLong(1)) == tk.map(_.getLong(1)).sorted.reverse,
        "descending by summed weight")
    }
    // the struct spells BigQuery's (value, sum)
    val schema = GraftSql.load(spark,
      "SELECT APPROX_TOP_SUM(item, w, 3) AS tk FROM ts_g").schema
    val st = schema("tk").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSeq == Seq("value", "sum"))
  }

  test("forced eviction: SpaceSaving bounds hold and the heavy hitter survives") {
    // one dominant item + 40 light ones, capacity 8 (well under 41
    // distinct): heavy must surface, estimates must upper-bound truth
    val rows = (Seq.fill(200)(("HEAVY", 10L)) ++
      Seq.tabulate(400)(i => (s"light${i % 40}", 1L)))
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(rows).toDF("item", "w")
    df.createOrReplaceTempView("ts_e")
    val got = GraftSql.load(spark,
      "SELECT graft_approx_top_sum(item, w, 3, 8) AS tk FROM ts_e")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.head._1 == "HEAVY", s"heavy hitter must be rank 1: $got")
    // est >= true >= est - error
    assert(got.head._2 >= 2000L && got.head._2 - got.head._3 <= 2000L)
    // every estimate bounds its own truth the same way
    val truth = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    got.foreach { case (item, est, err) =>
      assert(est >= truth(item) && est - err <= truth(item),
        s"$item: est=$est err=$err true=${truth(item)}")
    }
  }

  test("louds and NULL handling") {
    data(10).createOrReplaceTempView("ts_l")
    intercept[Exception] {
      GraftSql.load(spark, "SELECT APPROX_TOP_SUM(item, w) AS tk FROM ts_l")
    }
    intercept[Exception] { // capacity below k
      GraftSql.load(spark, "SELECT graft_approx_top_sum(item, w, 5, 2) AS tk FROM ts_l").collect()
    }
    // NULL items/weights contribute nothing
    Seq((Option("a"), Option(1L)), (None, Option(5L)), (Option("b"), None),
      (Option("a"), Option(2L)))
      .toDF("item", "w").createOrReplaceTempView("ts_n")
    val tk = GraftSql.load(spark, "SELECT APPROX_TOP_SUM(item, w, 2) AS tk FROM ts_n")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(tk == Seq(("a", 3L)))
  }
}
