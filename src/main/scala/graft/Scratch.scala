package graft
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, d).count()
      println(f"$q%-22s rows=$n%-6d ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}
