package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary learning (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-training member of the pipeline family, exact and
  * hash-checkable against an unrolled-SQL oracle.
  *
  * The scalable formulation: BPE statistics depend only on WORD
  * frequencies, so the corpus collapses to a (word, freq) table first —
  * one vocab-bounded shuffle over any corpus size — and every merge
  * iteration then runs over that table, not the corpus. Each iteration
  * is: explode adjacent symbol pairs weighted by freq (scan-side
  * `arrays_zip` of shifted slices, the [[TextAnalysis.bigramSurprisal]]
  * construction), one partial-agg shuffle to sum pair counts, and a
  * 1-row argmax collect (count desc, then lexicographic pair — fully
  * deterministic, no float anywhere). The merge applies greedily
  * left-to-right over each word's symbols via the native
  * [[graft.functions.TextKernels.bpeApplyMerge]] kernel (round 16 — one
  * codegen call per row instead of an interpreted string-fold HOF);
  * [[applyMerge]] remains the executable fold spec the kernel mirrors
  * (KernelParitySpec pins equality) and the DuckDB oracle's
  * `list_reduce` reproduces it exactly.
  *
  * 100 TB story: the corpus is touched ONCE (word counts); nMerges
  * iterations each shuffle pair-count rows bounded by the live symbol
  * vocabulary, with the word table persisted (MEMORY_AND_DISK, lineage
  * kept) and the previous round released. Driver state is one (pair,
  * count) row per iteration. Reference scope: the reference tokenizes by
  * whitespace only (server.py:732-739) — subword learning is pipeline
  * growth per the builder brief.
  */
object Bpe {

  /** Atomic end-of-word marker symbol (classic BPE `</w>`): lets merges
    * distinguish word-final from word-internal contexts and makes every
    * learned token boundary-aware. */
  val EndOfWord = "</w>"

  /** Symbol separator inside the fold string — U+001F, guaranteed absent
    * from whitespace-tokenized text symbols. */
  private val Sep = "\u001f"

  final case class Merge(step: Int, lhs: String, rhs: String,
                         merged: String, cnt: Long)

  /** Learn `nMerges` BPE merge rules from `df[textCol]` (whitespace
    * pre-tokenization, lowercased). Returns (step, lhs, rhs, merged,
    * cnt) in learning order; stops early if the corpus runs out of
    * repeated pairs. Deterministic: exact integer counts, ties broken by
    * lexicographic (lhs, rhs). */
  def train(df: DataFrame, textCol: String, nMerges: Int): DataFrame =
    trainFromWordCounts(wordCounts(df, textCol), nMerges)

  /** The corpus→(word, freq) collapse — the ONLY corpus-sized pass of
    * training, and exactly the shape
    * [[graft.streaming.Streams.maintainAggregate]] keeps fresh under
    * ingest (group by word, count partials): stream word counts, fold,
    * and [[trainFromWordCounts]] retrains the tokenizer from the folded
    * store without ever re-touching documents. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** [[train]] from an already-aggregated (word, freq) frame — the
    * incremental-tokenizer entry point (BPE statistics are a pure
    * function of word frequencies, so a maintained count store IS the
    * training state). */
  def trainFromWordCounts(wf: DataFrame, nMerges: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 64,
      s"nMerges must be in 1..64, got $nMerges")
    val spark = wf.sparkSession
    val storage = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var words = wf
      .select(concat(chars(col("word")), array(lit(EndOfWord))).as("sym"),
        col("freq"))
      .persist(storage)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    // (round 16) ONE action per merge round, was two: the next round's
    // argmax collect is itself a full pass over the freshly-persisted
    // symbol table, so it doubles as the materialize-before-release
    // action the separate count() used to provide. The final round also
    // skips building the merged table nobody reads (the old loop paid a
    // whole applyMerge pass + count after the last rule was learned).
    def argmax(w: DataFrame): Array[Row] = pairCounts(w)
      .orderBy(col("c").desc, col("a").asc, col("b").asc)
      .limit(1).collect()
    var top = argmax(words)
    while (merges.length < nMerges && top.nonEmpty) {
      val (a, b, c) = (top.head.getString(0), top.head.getString(1),
        top.head.getLong(2))
      merges += Merge(merges.length + 1, a, b, a + b, c)
      if (merges.length < nMerges) {
        val next = words
          .select(graft.functions.TextKernels
            .bpe_apply_merge(col("sym"), a, b).as("sym"), col("freq"))
          .persist(storage)
        top = argmax(next) // materializes `next` before the release below
        words.unpersist()
        words = next
      } else top = Array.empty
    }
    words.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("step", "lhs", "rhs", "merged", "cnt")
  }

  /** Single-character symbols of a word (an explicit substring transform —
    * regex-split on "" leaves boundary empties behind, engine-dependent). */
  private def chars(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Adjacent symbol pairs weighted by word frequency: (a, b, c). */
  private def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("sym")) >= 2)
      .select(explode(arrays_zip(
        slice(col("sym"), lit(1), size(col("sym")) - 1).as("a"),
        slice(col("sym"), lit(2), size(col("sym")) - 1).as("b"))).as("p"),
        col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("c"))

  /** Apply one merge rule (a, b) → a+b to a symbol array, greedy
    * left-to-right, as a pure codegen'd fold: build a Sep-joined string
    * where the pair's second half is appended WITHOUT a separator when
    * the accumulator ends in Sep+a (an exact complete-symbol test — a
    * freshly merged a+b can never end in Sep+a, so cascading re-merges
    * within the round are impossible), then split back. */
  private[graft] def applyMerge(sym: Column, a: String, b: String): Column = {
    val folded = aggregate(sym, lit(""), (acc, x) =>
      when(acc.endsWith(lit(Sep + a)) && x === b, concat(acc, x))
        .otherwise(concat(acc, lit(Sep), x)))
    split(substring(folded, 2, Int.MaxValue), Sep)
  }

  /** Encode texts with an already-learned merge list (in learning
    * order): (idCol, tokens: array<string>) where each word's symbols
    * carry the [[EndOfWord]] marker on the final token. The merge chain
    * compiles to nested scan-side folds — zero shuffles at encode time,
    * the property that lets a 100 TB corpus tokenize at scan rate. */
  def encode(df: DataFrame, textCol: String, idCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    require(merges.length <= 64, "encode supports up to 64 chained merges")
    val words = df.select(col(idCol),
      posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    // (round 16) the whole merge chain runs in ONE codegen kernel call per
    // word ([[graft.functions.TextKernels.bpeEncodeWord]]) instead of
    // merges+1 interpreted HOF folds — applyMerge below stays as the
    // executable spec the kernel mirrors (KernelParitySpec pins equality).
    val sym = graft.functions.TextKernels
      .bpe_encode_word(col("word"), merges, EndOfWord)
    // word order is restored by sorting the collected (pos, sym) structs —
    // collect_list alone has no ordering contract
    words.select(col(idCol), col("pos"), sym.as("sym"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("sym")))),
        s => s.getField("sym"))).as("tokens"))
  }
}
