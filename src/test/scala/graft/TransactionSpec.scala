package graft

import java.nio.file.Files

import graft.sources.Versioned

/** BEGIN TRANSACTION ... COMMIT / ROLLBACK over registered Versioned
  * tables — BigQuery multi-statement transactions
  * (the stage-then-merge shape the reference runs as separate jobs,
  * fx_pipeline_with_merge.py:96-112, made one atomic commit).
  */
class TransactionSpec extends SparkSuite {
  import spark.implicits._

  private def table(): String = Files.createTempDirectory("graft-txn-").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("a committed transaction lands ONE commit per table; pre-image stays readable") {
    val t = table()
    Versioned.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t, Some(1000L))
    Versioned.register(spark, "txn_t1", t)
    Seq((2L, "B2"), (3L, "C")).toDF("id", "v").createOrReplaceTempView("txn_src1")
    GraftScript.run(spark,
      """BEGIN TRANSACTION;
        |MERGE INTO txn_t1 T USING txn_src1 S ON T.id = S.id
        |  WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *;
        |DELETE FROM txn_t1 WHERE id = 1;
        |COMMIT TRANSACTION;""".stripMargin)
    // exactly ONE new commit despite two verbs
    val cs = Versioned.commits(spark, t)
    assert(cs.map(_.version) == Seq(0L, 1L), s"got ${cs.map(_.version)}")
    assert(cs.last.action == "txn")
    assert(rows(spark.table("txn_t1")) == Set((2L, "B2"), (3L, "C")))
    assert(rows(Versioned.read(spark, t)) == Set((2L, "B2"), (3L, "C")))
    // the pre-image is version 0, readable AS OF its time
    assert(rows(Versioned.readAsOf(spark, t, 1000L)) == Set((1L, "a"), (2L, "b")))
  }

  test("read-your-writes inside the transaction; nothing visible on disk before COMMIT") {
    val t = table()
    Versioned.append(Seq((1L, "a")).toDF("id", "v"), t, Some(1000L))
    Versioned.register(spark, "txn_t2", t)
    GraftSql.load(spark, "BEGIN TRANSACTION")
    GraftSql.load(spark, "INSERT INTO txn_t2 VALUES (2, 'b')")
    // the transaction reads its own write...
    assert(GraftSql.load(spark, "SELECT count(*) AS n FROM txn_t2").head().getLong(0) == 2L)
    // ...but the TABLE still serves the committed version only
    assert(Versioned.commits(spark, t).size == 1)
    assert(rows(Versioned.read(spark, t)) == Set((1L, "a")))
    GraftSql.load(spark, "COMMIT")
    assert(rows(Versioned.read(spark, t)) == Set((1L, "a"), (2L, "b")))
  }

  test("an all-append transaction COMMITs as ONE O(batch) append commit") {
    val t = table()
    Versioned.append(Seq((1L, "a")).toDF("id", "v"), t, Some(1000L))
    Versioned.register(spark, "txn_t3", t)
    GraftScript.run(spark,
      """BEGIN TRANSACTION;
        |INSERT INTO txn_t3 VALUES (2, 'b');
        |INSERT INTO txn_t3 VALUES (3, 'c');
        |COMMIT;""".stripMargin)
    val cs = Versioned.commits(spark, t)
    assert(cs.size == 2 && cs.last.action == "txn insert")
    // append disposition: the commit EXTENDS the live set (copy-on-
    // write — version 0's directory is still live), and the appends
    // reader sees exactly the two new rows as the commit's delta
    assert(cs.last.live.startsWith(cs.head.live), "txn insert must be an append commit")
    val delta = Versioned.appendsBetween(spark, t, Some(cs.head.commitTsUs + 1), None)
    assert(rows(delta.select("id", "v")) == Set((2L, "b"), (3L, "c")))
  }

  test("ROLLBACK discards staged verbs and restores the session view") {
    val t = table()
    Versioned.append(Seq((1L, "a")).toDF("id", "v"), t, Some(1000L))
    Versioned.register(spark, "txn_t4", t)
    GraftScript.run(spark,
      """BEGIN TRANSACTION;
        |DELETE FROM txn_t4 WHERE id = 1;
        |INSERT INTO txn_t4 VALUES (9, 'z');
        |ROLLBACK TRANSACTION;""".stripMargin)
    assert(Versioned.commits(spark, t).size == 1, "ROLLBACK must land nothing")
    assert(rows(spark.table("txn_t4")) == Set((1L, "a")), "the view must restore")
    assert(rows(Versioned.read(spark, t)) == Set((1L, "a")))
  }

  test("crash mid-transaction: no partial visibility, auto-rollback on uncaught error") {
    val t = table()
    Versioned.append(Seq((1L, "a")).toDF("id", "v"), t, Some(1000L))
    Versioned.register(spark, "txn_t5", t)
    // ASSERT is EAGER (it collects) — the crash happens mid-script,
    // after the DELETE staged but before COMMIT
    intercept[Exception] {
      GraftScript.run(spark,
        """BEGIN TRANSACTION;
          |DELETE FROM txn_t5 WHERE id = 1;
          |ASSERT FALSE AS 'boom';
          |COMMIT;""".stripMargin)
    }
    // the staged DELETE never became visible; the view restored
    assert(Versioned.commits(spark, t).size == 1)
    assert(rows(spark.table("txn_t5")) == Set((1L, "a")))
    assert(rows(Versioned.read(spark, t)) == Set((1L, "a")))
    // the session is clean: a fresh transaction opens without complaint
    GraftSql.load(spark, "BEGIN TRANSACTION")
    GraftSql.load(spark, "ROLLBACK")
  }

  test("BigQuery's canonical handler pattern: EXCEPTION WHEN ERROR THEN ROLLBACK") {
    val t = table()
    Versioned.append(Seq((1L, "a")).toDF("id", "v"), t, Some(1000L))
    Versioned.register(spark, "txn_t6", t)
    // a CAUGHT error leaves the transaction open for the handler —
    // which rolls it back explicitly (the BigQuery docs' own shape)
    GraftScript.run(spark,
      """BEGIN
        |  BEGIN TRANSACTION;
        |  DELETE FROM txn_t6 WHERE id = 1;
        |  ASSERT FALSE AS 'midway failure';
        |  COMMIT TRANSACTION;
        |EXCEPTION WHEN ERROR THEN
        |  ROLLBACK TRANSACTION;
        |END;""".stripMargin)
    assert(Versioned.commits(spark, t).size == 1)
    assert(rows(spark.table("txn_t6")) == Set((1L, "a")))
  }

  test("multi-table transaction commits both tables; rollback restores both") {
    val ta = table(); val tb = table()
    Versioned.append(Seq((1L, "a")).toDF("id", "v"), ta, Some(1000L))
    Versioned.append(Seq((10L, "x")).toDF("id", "v"), tb, Some(1000L))
    Versioned.register(spark, "txn_ta", ta)
    Versioned.register(spark, "txn_tb", tb)
    GraftScript.run(spark,
      """BEGIN TRANSACTION;
        |INSERT INTO txn_ta VALUES (2, 'b');
        |UPDATE txn_tb SET v = 'X' WHERE id = 10;
        |COMMIT;""".stripMargin)
    assert(rows(Versioned.read(spark, ta)) == Set((1L, "a"), (2L, "b")))
    assert(rows(Versioned.read(spark, tb)) == Set((10L, "X")))
    GraftScript.run(spark,
      """BEGIN TRANSACTION;
        |DELETE FROM txn_ta WHERE id = 2;
        |DELETE FROM txn_tb WHERE id = 10;
        |ROLLBACK;""".stripMargin)
    assert(rows(Versioned.read(spark, ta)) == Set((1L, "a"), (2L, "b")))
    assert(rows(Versioned.read(spark, tb)) == Set((10L, "X")))
  }

  test("phase-two crash: single-table txn stays fully atomic (nothing lands)") {
    val t = table()
    Versioned.append(Seq((1L, "a")).toDF("id", "v"), t, Some(1000L))
    Versioned.register(spark, "txn_p2a", t)
    GraftSql.txnPhaseTwoFailpoint = _ => throw new RuntimeException("injected crash")
    try {
      val e = intercept[IllegalStateException] {
        GraftScript.run(spark,
          """BEGIN TRANSACTION;
            |INSERT INTO txn_p2a VALUES (2, 'b');
            |COMMIT;""".stripMargin)
      }
      // the failure happened BEFORE the only manifest: landed prefix
      // is empty — full atomicity, exactly the single-table contract
      assert(e.getMessage.contains("after landing []"))
      assert(Versioned.commits(spark, t).size == 1)
      assert(rows(spark.table("txn_p2a")) == Set((1L, "a")), "view must restore")
      assert(rows(Versioned.read(spark, t)) == Set((1L, "a")))
    } finally GraftSql.txnPhaseTwoFailpoint = _ => ()
    // the transaction is CLOSED: a fresh one opens without complaint
    GraftSql.load(spark, "BEGIN TRANSACTION")
    GraftSql.load(spark, "ROLLBACK")
  }

  test("phase-two crash mid-loop: multi-table prefix is COMMITTED, loudly named, txn closed") {
    val ta = table(); val tb = table()
    Versioned.append(Seq((1L, "a")).toDF("id", "v"), ta, Some(1000L))
    Versioned.append(Seq((10L, "x")).toDF("id", "v"), tb, Some(1000L))
    Versioned.register(spark, "txn_p2b1", ta)
    Versioned.register(spark, "txn_p2b2", tb)
    // crash on the SECOND table's manifest: the first is already the
    // on-disk truth (manifests are the per-table atomic points — the
    // documented multi-table prefix-exposure window)
    GraftSql.txnPhaseTwoFailpoint =
      name => if (name == "txn_p2b2") throw new RuntimeException("injected crash")
    try {
      val e = intercept[IllegalStateException] {
        GraftScript.run(spark,
          """BEGIN TRANSACTION;
            |INSERT INTO txn_p2b1 VALUES (2, 'b');
            |INSERT INTO txn_p2b2 VALUES (20, 'y');
            |COMMIT;""".stripMargin)
      }
      assert(e.getMessage.contains("after landing [txn_p2b1]"))
      assert(e.getMessage.contains("cannot be rolled back"))
      // table A's commit LANDED; table B kept its previous version
      assert(rows(Versioned.read(spark, ta)) == Set((1L, "a"), (2L, "b")))
      assert(rows(Versioned.read(spark, tb)) == Set((10L, "x")))
      // views restored to on-disk state — committed prefix included
      assert(rows(spark.table("txn_p2b1")) == Set((1L, "a"), (2L, "b")))
      assert(rows(spark.table("txn_p2b2")) == Set((10L, "x")))
    } finally GraftSql.txnPhaseTwoFailpoint = _ => ()
    // closed, not wedged: the next transaction opens cleanly
    GraftSql.load(spark, "BEGIN TRANSACTION")
    GraftSql.load(spark, "ROLLBACK")
  }

  test("louds: nested BEGIN, stray COMMIT/ROLLBACK, open at script end, EXPORT inside") {
    val t = table()
    Versioned.append(Seq((1L, "a")).toDF("id", "v"), t, Some(1000L))
    Versioned.register(spark, "txn_t7", t)
    assert(intercept[IllegalArgumentException] {
      GraftSql.load(spark, "COMMIT TRANSACTION")
    }.getMessage.contains("without an open transaction"))
    assert(intercept[IllegalArgumentException] {
      GraftSql.load(spark, "ROLLBACK")
    }.getMessage.contains("without an open transaction"))
    GraftSql.load(spark, "BEGIN TRANSACTION")
    try {
      assert(intercept[IllegalArgumentException] {
        GraftSql.load(spark, "BEGIN TRANSACTION")
      }.getMessage.contains("nested"))
      val dir = Files.createTempDirectory("graft-txn-export-").toString
      assert(intercept[IllegalArgumentException] {
        GraftSql.load(spark,
          s"EXPORT DATA OPTIONS(uri='$dir/out-*.csv', format='CSV') AS SELECT * FROM txn_t7")
      }.getMessage.contains("not allowed inside a transaction"))
    } finally GraftSql.load(spark, "ROLLBACK")
    // a script that leaves the transaction open is loud AND rolled back
    val e = intercept[IllegalArgumentException] {
      GraftScript.run(spark,
        """BEGIN TRANSACTION;
          |INSERT INTO txn_t7 VALUES (2, 'b');""".stripMargin)
    }
    assert(e.getMessage.contains("OPEN transaction"))
    assert(Versioned.commits(spark, t).size == 1)
    assert(rows(spark.table("txn_t7")) == Set((1L, "a")))
  }
}
