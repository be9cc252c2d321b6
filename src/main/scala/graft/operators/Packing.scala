package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Sequence packing: the training-sequence assembly stage of an LLM
  * data pipeline. Documents are concatenated greedily into fixed
  * token-budget sequences (context windows); padding waste is the
  * fraction of the budget left unfilled, so the packer's job is to
  * fill windows densely while staying deterministic and distributed.
  *
  * Distributed shape: the corpus is hash-bucketed (`bucket =
  * hash52(id) mod buckets` — uniform, engine-reproducible), sequences
  * never cross buckets, and each bucket is packed independently by a
  * STREAMING scan over its docs in (hash, id) order via
  * `flatMapSortedGroups`: Spark sorts within groups during the
  * exchange, the packer keeps O(1) state (current fill / seq / slot)
  * and buffers nothing — a bucket of any size streams through. At
  * 100 TB, `buckets` scales the parallelism (one task per bucket
  * group) and the only data movement is the one hash exchange.
  *
  * Greedy law (anchored, reproducible): docs in (hash52(id), id)
  * order; a doc opens a new sequence iff the current one is non-empty
  * and adding the doc would exceed `budget`. An oversized doc
  * (cost > budget) therefore sits alone in its own sequence. The
  * DuckDB oracle replays the same law as a recursive CTE over the
  * same integer ordering — every quantity is an exact integer, so
  * parity is arithmetic-free.
  *
  * Reference anchor: brief-mandated LLM-pipeline family (no direct
  * reference-file analog; BigQuery users run this as an export-side
  * loader step, which is exactly why the engine should own it).
  */
object Packing {

  // public: encoder-generated code instantiates these reflectively
  case class DocSlot(bucket: Long, h: Long, doc_id: Long, cost: Long)
  case class Packed(doc_id: Long, bucket: Long, seq: Long, slot: Long)

  /** Materialize packed sequences as training shards: one row per
    * SEQUENCE — (bucket, seq, text = member docs joined by `sep` in
    * slot order, doc_ids, doc_starts, n_docs, total_cost) — written as
    * bucket-partitioned parquet with `maxSeqsPerFile` bounding shard
    * size (training loaders want many same-sized files, not one giant
    * one; at 100 TB the writer's per-file record cap is what keeps
    * shard size flat as the corpus grows). The assembly adds ONE
    * shuffle on (bucket, seq) past [[packGreedy]]'s own; per-sequence
    * state is bounded by the budget. The last mile of the corpus
    * pipeline: mix (S4) → pack (S5) → export.
    *
    * `doc_ids` (slot order) and `doc_starts` (0-based char offset of
    * each doc in `text`) carry the document boundaries a training
    * loader needs for cross-document attention masking and for
    * provenance (which doc produced which span) — without them the
    * concatenation is irreversible. The prefix sums run as per-
    * sequence HOF lambdas over budget-bounded arrays (cheap integer
    * ops — nothing regex/split-shaped rides a lambda).
    */
  def exportSequences(df: DataFrame, idCol: String, textCol: String, costCol: String,
                      budget: Long, buckets: Int, path: String,
                      maxSeqsPerFile: Int = 1024, sep: String = "\n\n"): Unit = {
    require(maxSeqsPerFile > 0, s"maxSeqsPerFile $maxSeqsPerFile must be positive")
    val assigned = packGreedy(df, idCol, costCol, budget, buckets)
    assigned
      .join(df.select(F.col(idCol), F.col(textCol), F.col(costCol)), idCol)
      .groupBy("bucket", "seq")
      .agg(
        F.array_sort(F.collect_list(F.struct(F.col("slot"),
          F.col(textCol).as("t"), F.col(idCol).cast("long").as("d")))).as("__m"),
        F.count(F.lit(1)).as("n_docs"),
        F.sum(F.col(costCol)).cast("long").as("total_cost"))
      .select(
        F.col("bucket"), F.col("seq"),
        F.concat_ws(sep, F.transform(F.col("__m"), x => x.getField("t"))).as("text"),
        F.transform(F.col("__m"), x => x.getField("d")).as("doc_ids"),
        F.aggregate(F.col("__m"),
          F.struct(F.array().cast("array<long>").as("arr"), F.lit(0L).as("acc")),
          (s, x) => F.struct(
            F.array_append(s.getField("arr"), s.getField("acc")).as("arr"),
            (s.getField("acc") + F.length(x.getField("t")) + F.lit(sep.length.toLong)).as("acc")),
          s => s.getField("arr")).as("doc_starts"),
        F.col("n_docs"), F.col("total_cost"))
      .repartition(F.col("bucket"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxSeqsPerFile.toLong)
      .partitionBy("bucket")
      .parquet(path)
  }

  /** Pack docs into `budget`-bounded sequences; returns one row per
    * doc: (idCol, bucket, seq, slot) with seq dense from 0 per bucket
    * and slot 1-based within the sequence.
    *
    * Contract: rows with null id or null/non-positive cost are
    * excluded up front (a null id has no deterministic hash position;
    * a non-positive cost is a corrupt length upstream).
    */
  def packGreedy(df: DataFrame, idCol: String, costCol: String,
                 budget: Long, buckets: Int): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    require(buckets > 0, s"buckets $buckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .filter(F.col(idCol).isNotNull && F.col(costCol).isNotNull && F.col(costCol) > 0)
      .select(
        F.pmod(Sampling.hash52(F.col(idCol)), F.lit(buckets.toLong)).as("bucket"),
        Sampling.hash52(F.col(idCol)).as("h"),
        F.col(idCol).cast("long").as("doc_id"),
        F.col(costCol).cast("long").as("cost"))
      .as[DocSlot]
    prepared
      .groupByKey(_.bucket)
      .flatMapSortedGroups($"h", $"doc_id") { (bucket, docs) =>
        var seq = 0L; var fill = 0L; var slot = 0L
        docs.map { d =>
          if (fill > 0 && fill + d.cost > budget) { seq += 1; fill = 0; slot = 0 }
          fill += d.cost; slot += 1
          Packed(d.doc_id, bucket, seq, slot)
        }
      }
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }

  /** Deterministic global training-order shuffle — the step AFTER
    * packing: sequences written in pack order are correlated (a
    * bucket's neighbors share hash locality; a source's docs cluster
    * in time), and training wants each shard to be an unbiased sample
    * of the whole corpus. Rows get `shard = pmod(hash52(seed:id),
    * nShards)` and `pos` = their rank within the shard by (hash, id)
    * — a seeded pseudo-random permutation with NO global rank
    * materialized anywhere: membership is map-only, the within-shard
    * order is one exchange + sort on the shard key (exactly the work
    * a sorted shard write does), and everything is reproducible from
    * (seed, id) alone — re-running, or re-processing the corpus
    * incrementally, yields byte-identical shard order. Changing
    * `seed` re-deals the permutation (fresh data order per epoch
    * without materializing N copies).
    */
  def shuffleOrder(df: DataFrame, idCol: String, seed: Long,
                   nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    val h = Sampling.hash52(F.concat_ws(":", F.lit(seed), F.col(idCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(F.col("__h"), F.col(idCol))
    df.filter(F.col(idCol).isNotNull)
      .withColumn("__h", h)
      .withColumn("shard", F.pmod(F.col("__h"), F.lit(nShards.toLong)))
      .withColumn("pos", F.row_number().over(w).cast("long"))
      .drop("__h")
  }
}
