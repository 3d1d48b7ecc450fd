package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining (SURVEY §2.12 growth): documents are
  * concatenated in ascending-id order and split into fixed token-budget
  * chunks — the GPT-style "concat and chunk at context length" layout.
  * Each document's chunk id is `floor(tokens_before_it / budget)`, i.e. an
  * EXACT GLOBAL PREFIX SUM of token counts in id order.
  *
  * A window `sum() over (order by id)` expresses this declaratively but
  * plans as a single-task global sort at scale — so the operator computes
  * the prefix sum the distributed way:
  *   1. range-repartition by id + sort within partitions (partitions are
  *      now globally ordered id ranges);
  *   2. one tiny job collects PER-PARTITION token sums (≤ #partitions
  *      rows — bounded driver by construction);
  *   3. driver scan-left turns them into per-partition starting offsets
  *      (broadcast);
  *   4. one pass streams each partition with a running local sum + its
  *      offset.
  * Two scans of a two-long-column frame, no global sort, no shuffle beyond
  * the range exchange — the shape that survives 100 TB. The frame is
  * pinned between steps so both passes see ONE partitioning (range bounds
  * are sampled; the offsets must describe the exact layout the final pass
  * reads) — reliably checkpointed when the session has a checkpoint dir,
  * localCheckpoint'ed otherwise (see Sampling.pinPartitioning).
  */
object Packing {

  /** @return (idCol, n_tokens, chunk_id) — one row per document, chunk_id
    *         ascending with id, each chunk holding ~budget tokens (a doc
    *         straddling a boundary belongs to the chunk its FIRST token
    *         lands in, matching the concat-then-slice layout).
    *
    * Implementation note: the per-partition passes use the RDD's
    * `mapPartitionsWithIndex` — its index is a fixed property of the RDD —
    * and NOT `TaskContext.getPartitionId()`, which is the STAGE partition
    * id: when a downstream plan fuses this operator into a larger stage
    * (e.g. the physical Union an `exceptAll` builds), stage partition ids
    * are offset by sibling subtrees and every partition would silently
    * read the wrong offset. Caught by the LlmSpec composition test. */
  def packChunks(df: DataFrame, textCol: String, idCol: String,
                 budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val nPart = math.max(1, spark.sparkContext.defaultParallelism)
    // (round 16) both passes read this RDD — persist so the second does
    // not re-run the scan + range shuffle + sort. Rolling release
    // (Sampling.persistRolling) bounds the session's standing pins.
    val ranged = Sampling.persistRolling(df
      .select(col(idCol).cast("long"),
        TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .repartitionByRange(nPart, col(idCol))
      .sortWithinPartitions(idCol)
      .as[(Long, Long)]
      .transform(Sampling.pinPartitioning(_)) // reliable checkpoint when configured
      .rdd)
    val partSums = ranged.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator.single((pid, s))
    }.collect().sortBy(_._1).map(_._2) // ≤ nPart rows — bounded driver
    val offsets = spark.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
    val packed = ranged.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets.value(pid)
      it.map { case (id, n) =>
        val before = run
        run += n
        (id, n, before / budget)
      }
    }
    spark.createDataset(packed).toDF(idCol, "n_tokens", "chunk_id")
  }

  /** Sliding-window text chunking — the embedding/retrieval prep step
    * (documents are longer than an embedding model's context; chunks
    * overlap so no semantic unit is cut without a second chance): one row
    * per (doc, window), windows of `chunkChars` characters advancing by
    * `chunkChars - overlapChars`. A doc shorter than one chunk yields
    * exactly one (possibly short) chunk; the LAST window is clipped to
    * the text, and a window count of ceil((len - overlap) / stride)
    * guarantees full coverage with no all-overlap tail window. NULL text
    * yields no rows.
    *
    * Pure codegen (sequence → transform → posexplode): chunking runs
    * scan-side at I/O rate, output size ≈ len/stride rows per doc —
    * no UDF, no shuffle.
    *
    * @return (idCol, chunk_idx, chunk_text), chunk_idx 0-based */
  def chunkTexts(df: DataFrame, textCol: String, idCol: String,
                 chunkChars: Int, overlapChars: Int): DataFrame = {
    require(chunkChars > 0, s"chunkChars must be positive: $chunkChars")
    require(overlapChars >= 0 && overlapChars < chunkChars,
      s"overlap must be in [0, chunkChars): $overlapChars")
    val stride = chunkChars - overlapChars
    // the explicit isnull guard matters: greatest() SKIPS nulls, so a null
    // text would otherwise produce one null chunk instead of no rows
    val windows = expr(
      s"if(isnull($textCol), null, " +
        s"transform(sequence(0, greatest(cast(ceil((length($textCol) - $overlapChars) / $stride) as int), 1) - 1), " +
        s"i -> substring($textCol, i * $stride + 1, $chunkChars)))")
    df.select(col(idCol), posexplode(windows).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
  }

  /** DuckDB mirror of [[chunkTexts]] (DuckDB 1.0 table functions cannot
    * take lateral column args, so the window indices come from a scalar
    * `range()` list unnested in a CTE). `src` must expose `$idExpr` and
    * `$textExpr`. */
  def chunkTextsSql(src: String, idExpr: String, textExpr: String,
                    chunkChars: Int, overlapChars: Int): String = {
    val stride = chunkChars - overlapChars
    // the IS NOT NULL mirrors chunkTexts' isnull guard: DuckDB's greatest()
    // is NULL-ignoring like Spark's, so a NULL text would otherwise emit
    // one (id, 0, NULL) row here while Spark emits none
    s"""WITH graft_ch AS (SELECT $idExpr, $textExpr,
       |    unnest(range(0, CAST(greatest(ceil((length($textExpr) - $overlapChars) / $stride), 1) AS BIGINT))) AS i
       |  FROM $src WHERE $textExpr IS NOT NULL)
       |SELECT $idExpr, i AS chunk_idx,
       |  substring($textExpr, CAST(i AS INT) * $stride + 1, $chunkChars) AS chunk_text
       |FROM graft_ch""".stripMargin
  }

  /** Materialize the packed sequences themselves — the training-file rows
    * a loader actually reads: one row per chunk, documents concatenated in
    * ascending-id order with `sep`. [[packChunks]] decides membership (its
    * distributed prefix sum, no global sort); this adds one id-keyed join
    * to fetch the text back and one chunk-keyed shuffle to assemble. Per-
    * chunk memory is bounded by ~budget tokens by construction, so the
    * collect_list can never blow an executor.
    *
    * @return (chunk_id, packed, n_docs, n_tokens) */
  def packTexts(df: DataFrame, textCol: String, idCol: String,
                budget: Long, sep: String = " "): DataFrame = {
    val chunks = packChunks(df, textCol, idCol, budget)
    chunks.join(df.select(col(idCol), col(textCol)), idCol)
      .groupBy(col("chunk_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          e => e.getField(textCol)), sep).as("packed"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
  }
}
