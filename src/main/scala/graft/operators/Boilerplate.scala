package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Line-level boilerplate removal: the cross-document dedup pass that
  * strips navigation chrome, cookie banners, license headers and other
  * lines repeated across many documents while leaving each document's
  * unique prose intact (the CCNet/RefinedWeb "duplicated lines"
  * filter). Complements document-level dedup ([[Dedup]]): there the
  * unit is the document, here it is the line, and a line is
  * boilerplate when it appears in ≥ `minDf` DISTINCT documents.
  *
  * Scale shape: the line split is STAGED as its own projection (HOF
  * lambdas re-evaluate subtrees per element — see Dedup's perf note),
  * then posexplode is map-side; document frequency is two keyed
  * shuffles on 16-byte md5 line keys (distinct (doc, line) pairs, then
  * count — no countDistinct Expand, same shape as text_tf_df); the
  * droplist (lines with df ≥ minDf) is tiny by construction —
  * boilerplate is the repeated FEW — so it broadcasts, and the rebuild
  * is one shuffle on doc id with per-doc bounded state. For corpora
  * where the droplist could be large (tiny minDf over web-scale
  * lines), `broadcastDroplist = false` routes the anti-join through a
  * plain shuffle instead (same guard the tfidf idf table has).
  *
  * The exploded-lines projection feeds three consumers — droplist
  * document-frequency, the rebuild, and per-doc totals — and they
  * aggregate DIFFERENT subtrees (the rebuild sits below the
  * anti-join), so ReuseExchange cannot collapse them: an expensive
  * upstream `df` is evaluated up to 3×. Callers with a costly
  * subtree must stage it first — [[graft.CorpusPipeline]] stages its
  * regex gate via [[Staging.stage]] before calling here, after which
  * each pass is a cheap columnar re-read. `payloadCols` then ride
  * the staged frame through to the output, saving the caller a
  * join-back against `df`.
  *
  * Contract: empty lines are structure, not content — they never count
  * toward df and are never dropped, so paragraph breaks survive
  * cleaning. Line matching is exact (md5 of the raw line; 128-bit
  * space makes collisions ignorable, as in dedup_exact). Ids must be
  * unique (duplicate ids would collapse into one output row).
  */
object Boilerplate {

  /** Returns (idCol, payloadCols..., clean text under `outCol`,
    * `lines_dropped`) — one row per input id, text rebuilt from
    * surviving lines in original order; a doc whose every line is
    * boilerplate keeps an empty string. `payloadCols` are carried
    * through unchanged (constant per id), saving the caller a
    * join-back against the (possibly expensive) input subtree.
    */
  def dropBoilerplateLines(df: DataFrame, idCol: String, textCol: String, minDf: Int,
                           broadcastDroplist: Boolean = true,
                           outCol: String = "clean_text",
                           payloadCols: Seq[String] = Nil): DataFrame = {
    require(minDf >= 2, s"minDf $minDf must be >= 2 (1 would drop every line)")
    val id = F.col(idCol)
    val pays = payloadCols.map(F.col)
    // staged split: one split() per row, never under a lambda
    val lines = df
      .select(id +: pays :+ F.split(F.coalesce(F.col(textCol), F.lit("")), "\n").as("__ls"): _*)
      .select(id +: pays :+ F.posexplode(F.col("__ls")).as(Seq("__pos", "__line")): _*)
    val droplist = lines
      .filter(F.col("__line") =!= "")
      .select(id, F.md5(F.col("__line")).as("__lh")).distinct()
      .groupBy("__lh").agg(F.count(F.lit(1)).as("__df"))
      .filter(F.col("__df") >= minDf)
      .select("__lh")
    val dl = if (broadcastDroplist) F.broadcast(droplist) else droplist
    val kept = lines.join(dl, F.md5(F.col("__line")) === F.col("__lh"), "left_anti")
    val rebuilt = kept.groupBy(idCol).agg(
      F.concat_ws("\n",
        F.transform(F.array_sort(F.collect_list(F.struct(F.col("__pos"), F.col("__line")))),
          (x: Column) => x.getField("__line"))).as(outCol),
      F.count(F.lit(1)).as("__kept"))
    // per-doc totals + payload from the SAME lines subtree (split("")
    // yields one element, so every id has ≥1 line row); first() is
    // sound — payloads are constant within an id
    val totals = lines.groupBy(idCol).agg(
      F.count(F.lit(1)).as("__total"),
      payloadCols.map(c => F.first(F.col(c)).as(c)): _*)
    // a doc whose every non-empty line is boilerplate has no kept rows
    totals.join(rebuilt, Seq(idCol), "left")
      .select(id +: pays :+
        F.coalesce(F.col(outCol), F.lit("")).as(outCol) :+
        (F.col("__total") - F.coalesce(F.col("__kept"), F.lit(0L))).as("lines_dropped"): _*)
  }
}
