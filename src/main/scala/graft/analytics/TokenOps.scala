package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** TOKEN-AWARE text operations (VERDICT-r7 ask #8): a deterministic
  * subword tokenizer — greedy longest-match wordpiece over a broadcast
  * vocabulary built IN-PLAN from corpus word frequencies — and a
  * sequence-packing variant that budgets by TOKENS, the unit training
  * actually bills in (word-budget packing under-fills sequences of
  * short-word text and overflows sequences of rare-word text; the
  * token budget is what the accelerator sees).
  *
  * Design for 100 TB:
  *  - the vocabulary is ONE distributed word-count aggregate (shuffles
  *    (word, count) pairs only) truncated to [[VocabSize]] rows on the
  *    driver and BROADCAST — the classic small-dim broadcast shape;
  *  - tokenization is map-only (a per-row function over the broadcast
  *    vocab — no shuffle, no state);
  *  - packing reuses sp3's sharded streaming-greedy shape: per-shard
  *    running token sums over a PARTITIONED window, never a global
  *    one ([[TextOps.sp3SequencePack]]).
  *
  * Determinism (the property the whole gate stands on): vocabulary
  * selection breaks frequency ties by word (count desc, word asc);
  * greedy longest-match is a deterministic recurrence; no RNG, no
  * timestamps. Since r13 all four queries are in the full hash gate:
  * the greedy recurrence has a DuckDB recursive-CTE form (precomputed
  * per-position advances + a recursive walk — see [[wpCtes]]), so the
  * oracle recomputes tokenization from scratch; TokenOpsSpec's
  * driver-side reference implementation remains as the third
  * independent check.
  *
  * (Reference analog: the reference counts words nowhere — this is
  * part of the beyond-reference training-data surface, SURVEY.md §2's
  * LLM-pipeline block.)
  */
object TokenOps {

  /** Top-K corpus words kept as whole-word tokens for the GATE
    * queries. Deliberately TINY there: the synthetic corpus has a
    * closed ~31-word vocabulary, so a production-sized K would put
    * every word in-vocab and the greedy recurrence would never run —
    * 16 keeps a genuine head/tail split (frequent words whole, the
    * tail decomposing into pieces), which is the shape the operator
    * exists to exercise. Every entry point takes the size as a
    * parameter; [[ProductionVocabSize]] is the deployment default,
    * exercised at full width in TokenVocabSpec (VERDICT r10 ask #7). */
  val VocabSize = 16

  /** Deployment-scale vocabulary width. The driver truncate is K rows
    * and the broadcast is K strings (~a few hundred KB at 32k) — both
    * bounded by K, not by corpus size. */
  val ProductionVocabSize = 32768

  /** Tokens per packed training sequence ([[sp3bTokenPackOn]]). */
  val TokenPackBudget = 256

  /** The deterministic vocabulary: the corpus's [[VocabSize]] most
    * frequent words, ties broken by word — ONE aggregate over (word,
    * count) pairs, truncated on the driver. */
  def buildVocab(docs: DataFrame,
      vocabSize: Int = VocabSize): Seq[String] =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(vocabSize)
      .select("w").collect().map(_.getString(0)).toSeq

  /** Greedy longest-match piece count of ONE word against the vocab:
    * an in-vocab word is 1 token; otherwise the longest vocab entry
    * that prefixes the remaining suffix is consumed, and a position no
    * entry matches consumes one character as an unknown token (so
    * tokenization is total). The BERT-wordpiece recurrence with a
    * position-independent piece set. */
  private[analytics] def wordPieces(word: String, vocab: Set[String],
      maxLen: Int): Int = {
    if (word.isEmpty) 0
    else if (vocab.contains(word)) 1
    else {
      var pos = 0
      var pieces = 0
      val n = word.length
      while (pos < n) {
        var l = math.min(maxLen, n - pos)
        var hit = 0
        while (l >= 1 && hit == 0) {
          if (vocab.contains(word.substring(pos, pos + l))) hit = l
          l -= 1
        }
        pieces += 1
        pos += math.max(hit, 1) // unknown char: one unk token
      }
      pieces
    }
  }

  /** (token-count column builders) over a broadcast vocab: for a
    * whole space-separated text, for a word array, and for ONE word. */
  /** Corpus-keyed vocabulary memo — MODEL state under the
    * [[graft.analytics.SimilarityOps]] trainedCentroids discipline: the
    * vocab is a pure deterministic function of the immutable corpus
    * (count desc, word asc, LIMIT K), bounded by K, and was rebuilt per
    * gate invocation (one corpus aggregate + driver truncate per query
    * per bench rep across t11/t11b/t12/t15/sp3b). `variant`
    * distinguishes derived corpora of the same dir (t11b's wide
    * staging); the fingerprint invalidates on in-place rewrite. */
  private val vocabCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int), (String, Seq[String])]
  private def vocabFor(spark: SparkSession, dir: String, variant: String,
      vocabSize: Int)(docs: => DataFrame): Seq[String] = {
    val fp = Tables.fingerprint(spark, dir, "documents")
    vocabCache.get((dir, variant, vocabSize)) match {
      case Some((`fp`, v)) => v
      case _ =>
        val v = buildVocab(docs, vocabSize)
        vocabCache.put((dir, variant, vocabSize), (fp, v))
        v
    }
  }

  private def counters(spark: SparkSession, docs: DataFrame,
      vocabSize: Int = VocabSize,
      pre: Option[Seq[String]] = None)
      : (Column => Column, Column => Column, Column => Column) = {
    val vocab = pre.getOrElse(buildVocab(docs, vocabSize))
    val bc = spark.sparkContext.broadcast(
      (vocab.toSet, vocab.map(_.length).foldLeft(1)(math.max)))
    val countWords = (ws: Seq[String]) => {
      val (set, maxLen) = bc.value
      var sum = 0L
      ws.foreach(w => sum += wordPieces(w, set, maxLen))
      sum
    }
    val textUdf = udf((text: String) =>
      if (text == null) 0L
      else countWords(text.split(' ').toIndexedSeq))
    val arrUdf = udf((ws: Seq[String]) =>
      if (ws == null) 0L else countWords(ws))
    val wordUdf = udf((w: String) => {
      val (set, maxLen) = bc.value
      if (w == null) 0L else wordPieces(w, set, maxLen).toLong
    })
    (textUdf(_), arrUdf(_), wordUdf(_))
  }

  /** T11: per-document wordpiece token statistics — whitespace words,
    * subword tokens under the corpus-frequency vocab, and the
    * tokens-per-word expansion in integer BASIS POINTS (integral
    * arithmetic hashes identically everywhere; a float ratio would
    * flip at half-way boundaries). The expansion is the signal a
    * token-budgeted pipeline filters and bills on. */
  def t11Wordpiece(spark: SparkSession, dir: String): DataFrame =
    t11WordpieceOn(spark, Tables.documents(spark, dir), VocabSize,
      Some(vocabFor(spark, dir, "plain", VocabSize)(
        Tables.documents(spark, dir))))

  def t11WordpieceOn(spark: SparkSession, docs: DataFrame,
      vocabSize: Int = VocabSize,
      vocab: Option[Seq[String]] = None): DataFrame = {
    val (countText, _, _) = counters(spark, docs, vocabSize, vocab)
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        countText(col("text")).as("wp_tokens"))
      .withColumn("expansion_bp",
        expr("wp_tokens * 10000 DIV ws_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Head/tail shape of the [[wideCorpusOf]] staging: every doc shares
    * [[WideHeadWords]] head words (frequency = corpus size, always in
    * vocab) and contributes [[WideTailWords]] doc-keyed SINGLETON tail
    * words — 500 docs already stage 40,010 distinct words, so the
    * [[ProductionVocabSize]] truncate genuinely cuts at every SF. */
  val WideHeadWords = 10
  val WideTailWords = 80

  /** Deterministic wide-vocabulary corpus DERIVED from the documents
    * table (a pure function of doc_id — any fresh JVM restages
    * identically): the TokenVocabSpec 40k-word shape, generated at
    * corpus scale instead of a fixed 4000 rows. */
  def wideCorpusOf(docs: DataFrame): DataFrame = {
    val heads = (0 until WideHeadWords).map(h => s"head$h").mkString(" ")
    docs.select(col("doc_id"),
      concat_ws(" ", lit(heads) +: (0 until WideTailWords).map(k =>
        concat(lit("w"), col("doc_id") * WideTailWords + lit(k))): _*)
        .as("text"))
  }

  /** T11B: the t11 wordpiece statistics at DEPLOYMENT vocabulary width
    * (VERDICT-r11 #6) — the 32,768-entry vocab build (bounded driver
    * truncate + broadcast) and the greedy recurrence over a corpus
    * wide enough that the truncate CUTS, inside the bench/gate instead
    * of only in TokenVocabSpec. Like t11, the greedy recurrence has no
    * SQL form — spec-verified against the driver-side reference. */
  def t11bWordpieceWide(spark: SparkSession, dir: String): DataFrame =
    t11WordpieceOn(spark,
      wideCorpusOf(Tables.documents(spark, dir)), ProductionVocabSize,
      Some(vocabFor(spark, dir, "wide", ProductionVocabSize)(
        wideCorpusOf(Tables.documents(spark, dir)))))

  /** SP3B: TOKEN-BUDGET sequence packing — the t5 chunk stream packed
    * into ~[[TokenPackBudget]]-token training sequences by the same
    * sharded streaming-greedy recurrence as word-budget sp3 (chunk →
    * pack floor(tokens_before / budget) within its shard). Chunk token
    * counts come from the wordpiece tokenizer, so a chunk of rare long
    * words occupies proportionally more of its sequence — what the
    * accelerator's context window actually experiences. */
  def sp3bTokenPack(spark: SparkSession, dir: String): DataFrame =
    sp3bTokenPackOn(spark, Tables.documents(spark, dir), VocabSize,
      Some(vocabFor(spark, dir, "plain", VocabSize)(
        Tables.documents(spark, dir))))

  def sp3bTokenPackOn(spark: SparkSession, docs: DataFrame,
      vocabSize: Int = VocabSize,
      vocab: Option[Seq[String]] = None): DataFrame = {
    val (_, countArr, _) = counters(spark, docs, vocabSize, vocab)
    val words = split(col("text"), " ")
    val chunks = docs
      .select(col("doc_id"), words.as("ws"),
        posexplode(sequence(lit(0), size(words) - 1,
          lit(TextOps.ChunkStride))).as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("ws"), col("start") + 1,
          lit(TextOps.ChunkWords)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        countArr(col("chunk")).as("n_tokens"))
      .withColumn("shard",
        pmod(col("doc_id"), lit(TextOps.PackShards.toLong)))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("shard"))
      .orderBy(col("doc_id"), col("chunk_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    chunks
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"tokens_before DIV $TokenPackBudget"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("shard"), col("pack_id"))
  }

  /** Tokens per [[t12TokenChunks]] training chunk. */
  val ChunkTokenBudget = 64

  /** T12: TOKEN-BUDGET chunking — t5's word-stride chunking re-keyed
    * to the tokenizer: each document's word stream is cut into chunks
    * of ~[[ChunkTokenBudget]] wordpiece tokens (word w lands in chunk
    * floor(tokens_before_w / budget) — the same arithmetic split the
    * sp3 family uses, so a rare-long-word region yields SHORTER word
    * runs per chunk and a stopword region longer ones; a fixed word
    * stride would overflow the former's context budget). Per-doc
    * cumulative sums run under a doc-partitioned window — parallel
    * across documents, never a global window. */
  def t12TokenChunks(spark: SparkSession, dir: String): DataFrame =
    t12TokenChunksOn(spark, Tables.documents(spark, dir), VocabSize,
      Some(vocabFor(spark, dir, "plain", VocabSize)(
        Tables.documents(spark, dir))))

  def t12TokenChunksOn(spark: SparkSession, docs: DataFrame,
      vocabSize: Int = VocabSize,
      vocab: Option[Seq[String]] = None): DataFrame = {
    val (_, _, countWord) = counters(spark, docs, vocabSize, vocab)
    val exploded = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .withColumn("tok", countWord(col("word")))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(W.unboundedPreceding, -1)
    exploded
      .withColumn("tokens_before",
        coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"tokens_before DIV $ChunkTokenBudget"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("tok")).as("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  // --- t14: distributed BPE-merge vocabulary training -----------------------

  /** Merge rounds the gate query trains. Small by design — the DuckDB
    * oracle UNROLLS one CTE block per round — while the spec runs the
    * trainer deeper against a driver-side reference implementation. */
  val BpeRounds = 8

  /** T14: DISTRIBUTED BPE-MERGE VOCABULARY TRAINING (VERDICT r13 #7)
    * — real tokenizer training is iterative pair-merging (Sennrich et
    * al. 2016, "Neural Machine Translation of Rare Words with Subword
    * Units"), not the frequency top-K t11's wordpiece vocab uses. Per
    * round: elect the most frequent adjacent symbol pair (weighted by
    * word frequency, ties broken lexicographically — determinism is
    * the gate's contract) and fuse it greedy-left-to-right in every
    * word containing it. The output is the MERGE TABLE (rank, lhs,
    * rhs, pair_count) — the artifact a BPE tokenizer ships.
    *
    * Scale shape (the classic BPE reduction, now with INCREMENTAL
    * pair counts — VERDICT r14 #3): training runs over the
    * DISTINCT-WORD frequency table, never the corpus, and the
    * pair-count table is MAINTAINED across rounds instead of
    * re-aggregated from the whole symbol stream. One word-count
    * aggregate and one pair-count aggregate up front; then every
    * round is (a) a 1-ROW driver collect electing the winner off the
    * maintained table (per-partition top-1 heaps, no shuffle), (b) a
    * MAP-ONLY fusion pass — each word's symbols live in one ARRAY
    * row, fused by a codegen'd `aggregate` higher-order expression
    * (greedy left-to-right, [[fuseCol]]) with the winner as literals,
    * no windows, no per-round stream shuffle — and (c) a SIGNED
    * pair-count delta: only words the fusion CHANGED contribute
    * (their old pairs at -freq, their new pairs at +freq), so the
    * per-round shuffle is proportional to AFFECTED words plus the
    * pair-table size, never to the stream (the MatView signed-
    * maintenance discipline applied to trainer state). Each round's
    * stream and pair table are checkpointed and the previous round's
    * blocks released eagerly ([[org.apache.spark.sql.graftstream
    * .StreamingBridge.unpersistCheckpoint]]).
    *
    * The oracle replays the identical rounds as UNROLLED DuckDB CTEs
    * (full per-round recount + the run-parity fusion rule — the
    * SPECIFICATION semantics this incremental trainer must and does
    * reproduce exactly; TokenVocabSpec pins equality against both the
    * full-recount implementation and a sequential driver-side
    * reference, deeper than the gate's rounds). */
  def t14BpeMerges(spark: SparkSession, dir: String): DataFrame =
    t14BpeMergesOn(spark, Tables.documents(spark, dir), BpeRounds)

  def t14BpeMergesOn(spark: SparkSession, docs: DataFrame,
      rounds: Int): DataFrame = {
    import spark.implicits._
    val (merges, _) = bpeTrainOn(spark, docs, rounds)
    merges.toDF("rank", "lhs", "rhs", "pair_count").orderBy(col("rank"))
  }

  /** Adjacent symbol pairs of an array-row word as
    * `array<struct<a,b>>` — `zip_with` of the array against itself
    * shifted by one (map-only; a 1-symbol word yields no pairs). */
  private[analytics] def pairsCol(syms: Column): Column =
    zip_with(slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (x, y) => struct(x.as("a"), y.as("b")))

  /** GREEDY LEFT-TO-RIGHT BPE FUSION of one merge `(l, r)` over an
    * array-row word, as a single codegen-friendly `aggregate`
    * higher-order expression — the sequential in-word recurrence
    * ("walk i; if syms(i)==l && syms(i+1)==r emit l+r and skip 2,
    * else emit and skip 1") carried by a (out, pend) fold state:
    * `pend` holds back an `l` awaiting its lookahead. Overlapping
    * self-pair runs resolve exactly like the reference ("aaaa" under
    * (a,a) → "aa","aa"; "aaa" → "aa","a"). Equal by construction to
    * the run-parity window rule the r14 trainer used and the oracle
    * CTEs still replay — TokenVocabSpec pins both. */
  private[analytics] def fuseCol(syms: Column, l: String,
      r: String): Column = {
    val zero = struct(
      typedLit(Seq.empty[String]).as("out"), lit(false).as("pend"))
    val step = (acc: Column, s: Column) => {
      val out = acc.getField("out")
      val pend = acc.getField("pend")
      val flushed = array_append(out, lit(l)) // the held-back l lands
      struct(
        when(pend && s === lit(r), array_append(out, lit(l + r)))
          .when(pend && s === lit(l), flushed) // s re-opens the window
          .when(pend, array_append(flushed, s))
          .when(s === lit(l), out) // hold s back
          .otherwise(array_append(out, s)).as("out"),
        when(pend && s === lit(r), lit(false))
          .when(pend, s === lit(l))
          .otherwise(s === lit(l)).as("pend"))
    }
    val fin = (acc: Column) =>
      when(acc.getField("pend"),
        array_append(acc.getField("out"), lit(l)))
        .otherwise(acc.getField("out"))
    aggregate(syms, zero, step, fin)
  }

  /** The trainer's loop (incremental pair counts), returning BOTH
    * artifacts: the merge table and the final symbol stream
    * `(w, freq, syms)` — one array row per distinct word, whose
    * `syms` IS the word tokenized under the trained merges, which is
    * what [[t14bBpeTokenize]] bills documents against. */
  /** Distinct-word bound for [[bpeTrainOn]]'s DRIVER fast path — the
    * [[ClusterOps.DriverCcMaxEdges]] / [[DeepTrainMaxWords]] discipline:
    * BPE trainer state is the distinct-word frequency table, and below
    * this bound the whole merge loop runs in memory via
    * [[bpeTrainDriverFull]] (spec-pinned ≡ the distributed rounds,
    * TokenVocabSpec) after ONE word-count aggregate — the distributed
    * loop costs ~5 scheduler jobs per round regardless of corpus size.
    * Smaller than [[DeepTrainMaxWords]] because the fast path also
    * mounts the final symbol stream as a local relation (the billing
    * join's build side); past the bound the exact distributed rounds
    * run unchanged (the 100 TB shape). */
  val BpeDriverTrainMaxWords = 1 << 18

  private[analytics] def bpeTrainOn(spark: SparkSession, docs: DataFrame,
      rounds: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    import org.apache.spark.sql.graftstream.StreamingBridge.{checkpointFresh, unpersistCheckpoint}
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    locally {
      val head = words.limit(BpeDriverTrainMaxWords + 1).collect()
      if (head.length <= BpeDriverTrainMaxWords) {
        val wf = head.map(r => (r.getString(0), r.getLong(1))).toSeq
        val (merges, streams) = bpeTrainDriverFull(wf, rounds)
        import spark.implicits._
        val streamDf = wf.zip(streams)
          .map { case ((w, f), s) => (w, f, s.toSeq) }.toSeq
          .toDF("w", "freq", "syms")
        return (merges, streamDf)
      }
    }
    var stream = checkpointFresh(words.select(col("w"), col("freq"),
      split(col("w"), "").as("syms")))
    // the ONE stream-sized pair aggregate — rounds only ever apply
    // signed deltas to it
    var pairs = checkpointFresh(stream
      .select(col("freq"), explode(pairsCol(col("syms"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("freq"))
      .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("cnt")))
    val merges =
      scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      // per-partition top-1 heaps + a 1-row driver merge — no shuffle
      val best = pairs.orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val l = best(0).getString(0)
        val rt = best(0).getString(1)
        merges += ((r.toLong, l, rt, best(0).getLong(2)))
        // map-only fusion, materialized ONCE per round: the fused frame
        // feeds both the signed delta and the next round's stream, and
        // DataFrame branches re-execute their subtree — before r15 the
        // fusion ran twice per round (once under the pairs checkpoint,
        // once under the stream checkpoint). Checkpointing (syms, syms2)
        // side by side runs it once; the next stream is then a pure
        // PROJECTION over the cached blocks (no third job).
        val fused = checkpointFresh(stream.select(col("w"), col("freq"),
          col("syms"), fuseCol(col("syms"), l, rt).as("syms2")))
        val changed = fused.filter(col("syms2") =!= col("syms"))
        // signed delta: ONLY changed words contribute — old pairs at
        // -freq, new pairs at +freq; the shuffle moves O(affected
        // words × word length) rows, never the stream
        val delta = changed
          .select(explode(pairsCol(col("syms"))).as("p"),
            (-col("freq")).as("d"))
          .unionByName(changed
            .select(explode(pairsCol(col("syms2"))).as("p"),
              col("freq").as("d")))
          .select(col("p.a").as("a"), col("p.b").as("b"), col("d"))
        val prevPairs = pairs
        pairs = checkpointFresh(prevPairs
          .unionByName(delta.withColumnRenamed("d", "cnt"))
          .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") > 0))
        val prev = stream
        stream = fused.select(col("w"), col("freq"),
          col("syms2").as("syms"))
        unpersistCheckpoint(prev) // round k-1's blocks die with round k
        unpersistCheckpoint(prevPairs)
        r += 1
      }
    }
    (merges.toList, stream)
  }

  /** The r14 FULL-RECOUNT trainer (per round: one pair-count
    * aggregate over the ENTIRE symbol stream + five window passes),
    * kept as the SPECIFICATION implementation the incremental trainer
    * is spec-pinned against (TokenVocabSpec) — it is the literal
    * Spark transcription of the oracle's unrolled CTE rounds. Returns
    * the merge table and the final positional stream
    * `(w, freq, pos, sym)`. */
  private[analytics] def bpeTrainFullRecount(spark: SparkSession,
      docs: DataFrame, rounds: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    import org.apache.spark.sql.graftstream.StreamingBridge.{checkpointFresh, unpersistCheckpoint}
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w")).orderBy(col("pos"))
    val run = W.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    var stream = checkpointFresh(words.select(col("w"), col("freq"),
      posexplode(split(col("w"), "")).as(Seq("pos", "sym"))))
    val merges =
      scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val withNext = stream.withColumn("nxt", lead(col("sym"), 1).over(W))
      val best = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym"), col("nxt"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val l = best(0).getString(0)
        val rt = best(0).getString(1)
        merges += ((r.toLong, l, rt, best(0).getLong(2)))
        // greedy left-to-right fusion: a match merges iff its offset
        // inside its run of CONSECUTIVE matches is even (runs longer
        // than 1 only occur when lhs == rhs — "aaaa" → "aa","aa")
        val marked = withNext
          .withColumn("m0", col("sym") === lit(l) && col("nxt") === lit(rt))
          .withColumn("newRun", !(col("m0") &&
            coalesce(lag(col("m0"), 1).over(W), lit(false))))
          .withColumn("runStart",
            max(when(col("newRun"), col("pos"))).over(run))
          .withColumn("mrg",
            col("m0") && (col("pos") - col("runStart")) % 2 === 0)
          .withColumn("consumed",
            coalesce(lag(col("mrg"), 1).over(W), lit(false)))
        val prev = stream
        stream = checkpointFresh(marked.filter(!col("consumed"))
          .select(col("w"), col("freq"),
            (row_number().over(W) - 1).as("pos"),
            when(col("mrg"), concat(col("sym"), col("nxt")))
              .otherwise(col("sym")).as("sym")))
        unpersistCheckpoint(prev) // round k-1's blocks die with round k
        r += 1
      }
    }
    (merges.toList, stream)
  }

  /** T14b: TOKENIZE UNDER THE TRAINED MERGES — the apply half of BPE
    * (t14 trains the merge table; this bills documents with it): the
    * trainer's final symbol stream IS the distinct-word vocabulary
    * tokenized under the merges, so per-word token counts are read
    * straight off its array lengths and each document joins its words
    * against that (distinct-word-sized, typically broadcast) table —
    * text is never re-tokenized per document. Output: per-doc
    * whitespace words vs BPE tokens (non-empty words only, both
    * sides).
    *
    * Gate-self-containment note (VERDICT r14 nit #2): this query
    * RE-TRAINS via [[bpeTrainOn]] by construction — each gate entry
    * must be a standalone `(spark, dir) => DataFrame`, and billing
    * the training corpus off the trainer's own final stream is also
    * what keeps train and apply proven against the SAME replayed
    * loop (the oracle reuses t14's unrolled CTE chain verbatim). The
    * production apply — tokenize NEW text under a FROZEN published
    * merge table, no training cost — is [[t14cBpeApply]].
    *
    * Coverage note: the inner join against the trainer's stream is
    * exact HERE because the billed corpus IS the training corpus
    * (every word is in the stream by construction); billing held-out
    * text goes through [[t14cBpeApply]], which tokenizes unseen
    * words under the frozen merges instead of dropping them. */
  def t14bBpeTokenize(spark: SparkSession, dir: String): DataFrame =
    t14bBpeTokenizeOn(spark, Tables.documents(spark, dir), BpeRounds)

  def t14bBpeTokenizeOn(spark: SparkSession, docs: DataFrame,
      rounds: Int): DataFrame = {
    val (_, stream) = bpeTrainOn(spark, docs, rounds)
    val perWord = stream.select(col("w"),
      size(col("syms")).cast("long").as("toks"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(perWord, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ws_tokens"),
        sum(col("toks")).as("bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Distinct-word cap of [[bpeTrainDeep]]'s driver truncate — like
    * the wordpiece vocab build, the collect is bounded by K (count
    * desc, word asc), never by corpus size. */
  val DeepTrainMaxWords = 1 << 20

  /** DEEP-VOCABULARY BPE TRAINING — the production 32k-merge tier.
    * The distributed trainer above is ROUND-bounded: each merge is a
    * Spark round (cheap since r15's incremental pair counts, but
    * still a scheduler round-trip), so 32,768 merges would mean
    * ~100k sequential driver-coordinated jobs — wrong shape however
    * cheap each round is. Production tokenizer training (Sennrich's
    * subword-nmt, HF tokenizers) runs the merge loop IN MEMORY over
    * the distinct-word frequency table, which is the ONLY state BPE
    * needs and is bounded (tokenizers are conventionally trained on
    * a bounded word table/sample, not the streaming corpus). So here
    * the DISTRIBUTED part is one word-count aggregate + a
    * deterministic bounded truncate (count desc, word asc — the
    * [[buildVocab]] discipline), and the merge loop is
    * [[bpeTrainDriver]]: an INDEXED incremental trainer (pair counts
    * + a pair→words inverted index + an ordered election set), each
    * round touching only AFFECTED words — the same
    * signed-maintenance discipline as the distributed rounds, at
    * in-memory cost. Inference over unbounded corpora then rides
    * [[t14cBpeApply]]'s distributed apply under the returned frozen
    * merge table. Election order and greedy fusion are IDENTICAL to
    * the distributed trainers (TokenVocabSpec pins equality on the
    * staged and sf corpora, and against the naive reference at 300
    * rounds over a 40k-word corpus where the index genuinely works).
    */
  def bpeTrainDeep(spark: SparkSession, docs: DataFrame, rounds: Int,
      maxWords: Int = DeepTrainMaxWords)
      : Seq[(Long, String, String, Long)] = {
    val wf = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    bpeTrainDriver(wf, rounds)
  }

  /** The in-memory indexed merge loop of [[bpeTrainDeep]]: pair
    * counts and a pair→words index maintained incrementally, winner
    * elected from an ordered set (count desc, lhs, rhs — the gate's
    * tie-break), each round rewriting ONLY the words containing the
    * winner. Total work ~O(Σ word length + merges × affected). */
  private[analytics] def bpeTrainDriver(
      wordFreq: Seq[(String, Long)], rounds: Int)
      : Seq[(Long, String, String, Long)] =
    bpeTrainDriverFull(wordFreq, rounds)._1

  /** [[bpeTrainDriver]] returning BOTH artifacts — the merge table and
    * each input word's FINAL symbol stream (the in-memory analog of
    * [[bpeTrainOn]]'s second return, maintained incrementally by the
    * same loop at zero extra cost). */
  private[analytics] def bpeTrainDriverFull(
      wordFreq: Seq[(String, Long)], rounds: Int)
      : (Seq[(Long, String, String, Long)], Array[IndexedSeq[String]]) = {
    import scala.collection.mutable
    val n = wordFreq.size
    val streams = new Array[IndexedSeq[String]](n)
    val freqs = new Array[Long](n)
    wordFreq.zipWithIndex.foreach { case ((w, f), i) =>
      streams(i) = w.split("").toIndexedSeq; freqs(i) = f
    }
    def pairBag(s: IndexedSeq[String]): mutable.HashMap[(String, String), Long] = {
      val bag = mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i + 1 < s.length) {
        val p = (s(i), s(i + 1))
        bag.update(p, bag.getOrElse(p, 0L) + 1L)
        i += 1
      }
      bag
    }
    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // ascending order = (count DESC, lhs ASC, rhs ASC): head is the
    // round's winner
    val electionOrd = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String),
          y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(y._1, x._1)
        if (c != 0) c
        else {
          val c2 = x._2.compareTo(y._2)
          if (c2 != 0) c2 else x._3.compareTo(y._3)
        }
      }
    }
    val heap = mutable.TreeSet.empty[(Long, String, String)](electionOrd)
    def bump(p: (String, String), d: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old > 0) heap.remove((old, p._1, p._2))
      val nv = old + d
      if (nv > 0) {
        counts.update(p, nv); heap.add((nv, p._1, p._2)); ()
      } else { counts.remove(p); () }
    }
    var i = 0
    while (i < n) {
      pairBag(streams(i)).foreach { case (p, m) =>
        bump(p, m * freqs(i))
        index.getOrElseUpdate(p, mutable.Set.empty) += i
      }
      i += 1
    }
    val merges =
      mutable.ListBuffer.empty[(Long, String, String, Long)]
    var r = 1
    while (r <= rounds && heap.nonEmpty) {
      val (cnt, a, b) = heap.head
      merges += ((r.toLong, a, b, cnt))
      val pair = (a, b)
      val affected = index.getOrElse(pair, mutable.Set.empty).toArray
      affected.foreach { wi =>
        val oldBag = pairBag(streams(wi))
        if (oldBag.contains(pair)) {
          val s2 = fuseSeq(streams(wi), a, b)
          val newBag = pairBag(s2)
          (oldBag.keySet ++ newBag.keySet).foreach { p =>
            val d = newBag.getOrElse(p, 0L) - oldBag.getOrElse(p, 0L)
            if (d != 0) bump(p, d * freqs(wi))
            if (newBag.contains(p) && !oldBag.contains(p))
              index.getOrElseUpdate(p, mutable.Set.empty) += wi
            else if (!newBag.contains(p) && oldBag.contains(p))
              index.get(p).foreach(_ -= wi)
          }
          streams(wi) = s2
        }
      }
      r += 1
    }
    (merges.toList, streams)
  }

  /** The held-out slice of [[t14cBpeApply]]: documents with
    * `doc_id % HoldoutMod == 0` are BILLED, the rest TRAIN. */
  val HoldoutMod = 3

  /** Greedy left-to-right fusion of ONE merge over a word's symbol
    * sequence — the scalar core of the frozen-merge apply (identical
    * semantics to [[fuseCol]]; TokenVocabSpec pins them equal). */
  private[analytics] def fuseSeq(syms: IndexedSeq[String], a: String,
      b: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Tokenize ONE word under a frozen merge table: merges apply in
    * RANK ORDER (the BPE inference contract — rank order, not
    * greedy-longest), each a left-to-right fusion pass. A word whose
    * pairs were never merged passes through at CHARACTER count —
    * unseen text always tokenizes, it never vanishes. */
  private[analytics] def applyMerges(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var s: IndexedSeq[String] = word.split("").toIndexedSeq
    val it = merges.iterator
    while (it.hasNext && s.length > 1) {
      val (a, b) = it.next()
      s = fuseSeq(s, a, b)
    }
    s
  }

  /** T14c: BPE APPLY FOR HELD-OUT TEXT (VERDICT r14 #1) — the
    * production tokenizer-inference face: bill documents that were
    * NOT in the training corpus under the FROZEN merge table. The
    * gate splits the corpus by `doc_id % HoldoutMod` (train on
    * two-thirds, bill the rest), trains via [[bpeTrainOn]] (whose
    * merge table is already a driver-side Seq — exactly the artifact
    * a production job reads from the store), BROADCASTS the merges,
    * and tokenizes the held-out batch's DISTINCT words in one
    * map-only pass (rank-order fusion per word — a per-word
    * sequential recurrence over an unbounded merge list, the same
    * justified-UDF family as the wordpiece walk: 32k merges cannot
    * unroll as expressions). Documents then bill against the
    * distinct-word-sized (typically broadcast) token-count table —
    * text is tokenized once per distinct word, never per occurrence.
    * Unlike t14b's training-corpus join, a word ABSENT from training
    * still tokenizes (worst case: its character count) — the
    * undercount hole the r14 verdict named is closed.
    *
    * 100 TB shape: training cost is paid once (here only for gate
    * self-containment); the day-two batch pays one distinct-word
    * aggregate + one bounded broadcast (~32k merge strings) + one
    * map pass + one distinct-word join. Zero stream-sized shuffles.
    *
    * The oracle replays training as t14's unrolled CTE chain over
    * the train slice, then applies each round's elected merge to the
    * held-out word stream with the same parity-rule CTEs (LEFT JOIN
    * against the 1-row winner, so an exhausted trainer passes words
    * through unchanged). */
  def t14cBpeApply(spark: SparkSession, dir: String): DataFrame =
    t14cBpeApplyOn(spark, Tables.documents(spark, dir), BpeRounds)

  def t14cBpeApplyOn(spark: SparkSession, docs: DataFrame,
      rounds: Int): DataFrame = {
    val train = docs.filter(col("doc_id") % HoldoutMod =!= 0)
    val holdout = docs.filter(col("doc_id") % HoldoutMod === 0)
    val (merges, trained) = bpeTrainOn(spark, train, rounds)
    org.apache.spark.sql.graftstream.StreamingBridge
      .unpersistCheckpoint(trained) // only the merge table is consumed
    val bc = spark.sparkContext.broadcast(
      merges.map(m => (m._2, m._3)))
    val tokUdf = udf((w: String) =>
      if (w == null) 0L else applyMerges(w, bc.value).length.toLong)
    val heldWords = holdout
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .withColumn("toks", tokUdf(col("w")))
    holdout.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(heldWords, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ws_tokens"),
        sum(col("toks")).as("bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** T15: CROSS-FAMILY TOKENIZER DIAGNOSTIC (VERDICT r14 #7) — BPE vs
    * wordpiece compression (tokens per whitespace word, integer basis
    * points) per LANGUAGE slice over the same corpus: the
    * vocab-quality regression signal the per-family oracles cannot
    * see (a language whose BPE compression degrades relative to
    * wordpiece flags a merge table trained on a skewed mixture).
    * Both tokenizations are distinct-word-bounded (wordpiece walks
    * the broadcast vocab per occurrence map-side; BPE counts come
    * off the trainer's final array stream), so the query adds one
    * distinct-word join and one #languages-row aggregate to what the
    * two families already pay. Oracle: the two existing CTE chains
    * (wordpiece recursive walk + unrolled BPE rounds) joined on the
    * word. */
  def t15TokenizerCompare(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (_, _, countWord) = counters(spark, docs, VocabSize,
      Some(vocabFor(spark, dir, "plain", VocabSize)(docs)))
    val (_, stream) = bpeTrainOn(spark, docs, BpeRounds)
    val bpw = stream.select(col("w"),
      size(col("syms")).cast("long").as("bpe"))
    docs.select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("wp", countWord(col("w")))
      .join(bpw, Seq("w"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("ws_tokens"),
        sum(col("wp")).as("wp_tokens"),
        sum(col("bpe")).as("bpe_tokens"))
      .withColumn("wp_bp", expr("wp_tokens * 10000 DIV ws_tokens"))
      .withColumn("bpe_bp", expr("bpe_tokens * 10000 DIV ws_tokens"))
      .orderBy(col("lang"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t11_wordpiece" -> (t11Wordpiece _),
    "t11b_wordpiece_wide" -> (t11bWordpieceWide _),
    "t12_token_chunks" -> (t12TokenChunks _),
    "t14_bpe_merges" -> (t14BpeMerges _),
    "t14b_bpe_tokenize" -> (t14bBpeTokenize _),
    "t14c_bpe_apply" -> (t14cBpeApply _),
    "t15_tokenizer_compare" -> (t15TokenizerCompare _),
    "sp3b_token_pack" -> (sp3bTokenPack _))

  /** The greedy longest-match recurrence IS SQL-expressible (VERDICT
    * r12 ask #2): DuckDB recursive CTEs walk it exactly. The key to a
    * tractable oracle is splitting the walk from the match: `adv`
    * precomputes, for EVERY (distinct word, position), how far greedy
    * longest-match advances — a flat hash-join of substring candidates
    * (one per distinct vocab LENGTH, so the join is equi, never theta)
    * against the vocabulary — and the recursive `walk` then just hops
    * `pos → pos + adv(word,pos)` counting pieces, one equi-join per
    * step, no aggregate in the recursive term (which DuckDB, like
    * PostgreSQL, refuses). In-vocab words fall out as 1 piece (the
    * whole word is its own longest matching prefix); positions no
    * entry matches advance 1 as an unknown token; `max(pieces)` after
    * the recursion reads off each word's terminal state. Vocabulary
    * selection (count desc, word asc, LIMIT K) is the same
    * deterministic aggregate [[buildVocab]] computes. */
  private def wpCtes(corpus: String, vocabSize: Int): String =
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM $corpus),
      |vocab AS (SELECT w FROM (
      |  SELECT w, count(*) AS n FROM toks WHERE len(w) > 0
      |  GROUP BY w ORDER BY n DESC, w LIMIT $vocabSize)),
      |vlens AS (SELECT DISTINCT len(w) AS l FROM vocab),
      |dwords AS (SELECT DISTINCT w AS word FROM toks),
      |posn AS (SELECT word, unnest(generate_series(0, len(word) - 1)) AS pos
      |  FROM dwords WHERE len(word) > 0),
      |adv AS (SELECT p.word, p.pos,
      |    coalesce(max(CASE WHEN v.w IS NOT NULL THEN vl.l END), 1) AS adv
      |  FROM posn p
      |  CROSS JOIN vlens vl
      |  LEFT JOIN vocab v
      |    ON v.w = substring(p.word, p.pos + 1, vl.l) AND len(v.w) = vl.l
      |  GROUP BY p.word, p.pos),
      |walk AS (
      |  SELECT word, 0 AS pos, 0 AS pieces FROM dwords
      |  UNION ALL
      |  SELECT wk.word, wk.pos + a.adv, wk.pieces + 1
      |  FROM walk wk JOIN adv a ON a.word = wk.word AND a.pos = wk.pos
      |  WHERE wk.pos < len(wk.word)),
      |wp AS (SELECT word, max(pieces)::BIGINT AS wp FROM walk
      |  GROUP BY word)""".stripMargin

  /** The t11 SELECT shape over a corpus CTE (shared by t11/t11b). */
  private def t11Select(corpus: String): String =
    s"""per AS (SELECT t.doc_id, sum(wp.wp)::BIGINT AS wp_tokens
      |  FROM toks t JOIN wp ON wp.word = t.w GROUP BY t.doc_id)
      |SELECT d.doc_id, len(string_split(d.text, ' '))::BIGINT AS ws_tokens,
      |  p.wp_tokens,
      |  (p.wp_tokens * 10000) // len(string_split(d.text, ' '))
      |    AS expansion_bp
      |FROM $corpus d JOIN per p USING (doc_id) ORDER BY doc_id""".stripMargin

  val t11WordpieceSql: String =
    s"""WITH RECURSIVE ${wpCtes("documents", VocabSize)},
      |${t11Select("documents")}""".stripMargin

  /** t11b regenerates [[wideCorpusOf]] in SQL (a pure function of
    * doc_id) then runs the same statistics at [[ProductionVocabSize]]. */
  val t11bWordpieceWideSql: String = {
    val heads = (0 until WideHeadWords).map(h => s"head$h").mkString(" ")
    s"""WITH RECURSIVE
      |tails AS (SELECT d.doc_id,
      |    string_agg('w' || (d.doc_id * $WideTailWords + k.i), ' '
      |      ORDER BY k.i) AS tail
      |  FROM documents d CROSS JOIN generate_series(0, ${WideTailWords - 1})
      |    AS k(i)
      |  GROUP BY d.doc_id),
      |wide AS (SELECT doc_id, '$heads' || ' ' || tail AS text FROM tails),
      |${wpCtes("wide", ProductionVocabSize)},
      |${t11Select("wide")}""".stripMargin
  }

  val t12TokenChunksSql: String =
    s"""WITH RECURSIVE ${wpCtes("documents", VocabSize)},
      |p AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
      |pw AS (SELECT doc_id, i - 1 AS pos, ws[i] AS word FROM p),
      |tk AS (SELECT doc_id, pos, wp.wp AS tok
      |  FROM pw JOIN wp ON wp.word = pw.word),
      |run AS (SELECT doc_id, pos, tok,
      |  coalesce(sum(tok) OVER (PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS tokens_before
      |  FROM tk)
      |SELECT doc_id, (tokens_before // $ChunkTokenBudget)::BIGINT AS chunk_id,
      |  count(*)::BIGINT AS n_words, sum(tok)::BIGINT AS n_tokens
      |FROM run GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id""".stripMargin

  val sp3bTokenPackSql: String =
    s"""WITH RECURSIVE ${wpCtes("documents", VocabSize)},
      |warr AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |c AS (SELECT doc_id,
      |    unnest(generate_series(0, len(ws) - 1, ${TextOps.ChunkStride}))
      |      AS start, ws
      |  FROM warr),
      |ch AS (SELECT doc_id, (start // ${TextOps.ChunkStride})::BIGINT
      |      AS chunk_id,
      |    ws[start + 1 : least(start + ${TextOps.ChunkWords}, len(ws))]
      |      AS chunk
      |  FROM c),
      |cw AS (SELECT doc_id, chunk_id, unnest(chunk) AS word FROM ch),
      |ct AS (SELECT c2.doc_id, c2.chunk_id, sum(wp.wp)::BIGINT AS n_tokens
      |  FROM cw c2 JOIN wp ON wp.word = c2.word
      |  GROUP BY c2.doc_id, c2.chunk_id),
      |sh AS (SELECT doc_id % ${TextOps.PackShards} AS shard, doc_id,
      |    chunk_id, n_tokens
      |  FROM ct),
      |cum AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY shard
      |    ORDER BY doc_id, chunk_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS tokens_before
      |  FROM sh)
      |SELECT shard, (tokens_before // $TokenPackBudget)::BIGINT AS pack_id,
      |  count(*)::BIGINT AS n_chunks, sum(n_tokens)::BIGINT AS n_tokens
      |FROM cum GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin

  /** The t14 trainer as UNROLLED DuckDB CTEs: one (pair-count → elect
    * → parity-fuse → renumber) block per round, machine-generated —
    * identical tie-breaks and the identical run-parity rule, so the
    * oracle recomputes the whole training loop from the pristine
    * corpus (the full-recount SPECIFICATION semantics the incremental
    * trainer reproduces). `s0` is the distinct-word symbol stream;
    * each `b<k>` is round k's elected merge, and the final UNION
    * reads the merge table off them. `corpus` parameterizes the
    * training slice (t14c trains on a doc_id split). */
  private def bpeCtes: String = bpeCtesOver("documents")

  private def bpeCtesOver(corpus: String): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH w0 AS (SELECT w, count(*)::BIGINT AS freq FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM $corpus)
        |  WHERE len(w) > 0 GROUP BY w),
        |s0 AS (SELECT w, freq, i - 1 AS pos, w[i] AS sym
        |  FROM w0, unnest(generate_series(1, len(w))) AS t(i))""".stripMargin)
    for (k <- 1 to BpeRounds) {
      val j = k - 1
      sb.append("\n").append(
        s""",a$k AS (SELECT w, freq, pos, sym,
          |    lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
          |  FROM s$j),
          |b$k AS (SELECT sym AS lhs, nxt AS rhs, sum(freq)::BIGINT AS cnt
          |  FROM a$k WHERE nxt IS NOT NULL GROUP BY sym, nxt
          |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
          |c$k AS (SELECT a.w, a.freq, a.pos, a.sym, a.nxt,
          |    coalesce(a.sym = b.lhs AND a.nxt = b.rhs, false) AS m0
          |  FROM a$k a CROSS JOIN b$k b),
          |d$k AS (SELECT *, NOT (m0 AND coalesce(lag(m0) OVER
          |    (PARTITION BY w ORDER BY pos), false)) AS new_run FROM c$k),
          |e$k AS (SELECT *, max(CASE WHEN new_run THEN pos END) OVER
          |    (PARTITION BY w ORDER BY pos
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |    AS run_start
          |  FROM d$k),
          |f$k AS (SELECT *, m0 AND (pos - run_start) % 2 = 0 AS mrg
          |  FROM e$k),
          |g$k AS (SELECT *, coalesce(lag(mrg) OVER
          |    (PARTITION BY w ORDER BY pos), false) AS consumed FROM f$k),
          |s$k AS (SELECT w, freq,
          |    row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
          |    CASE WHEN mrg THEN sym || nxt ELSE sym END AS sym
          |  FROM g$k WHERE NOT consumed)""".stripMargin)
    }
    sb.toString
  }

  val t14BpeMergesSql: String =
    bpeCtes + "\n" + (1 to BpeRounds).map(k =>
      s"SELECT CAST($k AS BIGINT) AS rank, lhs, rhs, " +
        s"cnt AS pair_count FROM b$k")
      .mkString("", "\nUNION ALL ", "\nORDER BY rank")

  /** t14b oracle: the SAME replayed training loop; the final `s<R>`
    * stream is the tokenized vocabulary, and documents bill against
    * its per-word symbol counts. */
  val t14bBpeTokenizeSql: String =
    bpeCtes +
      s""",
        |wcnt AS (SELECT w, count(*)::BIGINT AS toks
        |  FROM s$BpeRounds GROUP BY w),
        |dtoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents)
        |SELECT t.doc_id, count(*)::BIGINT AS ws_tokens,
        |  sum(wc.toks)::BIGINT AS bpe_tokens
        |FROM dtoks t JOIN wcnt wc ON wc.w = t.w
        |WHERE len(t.w) > 0
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin

  /** t14c oracle: training replayed as the unrolled CTE chain over
    * the TRAIN slice; then each round's elected merge `b<k>` is
    * applied to the HELD-OUT word stream with the same parity-rule
    * CTEs — a LEFT JOIN against the 1-row winner (never a CROSS
    * JOIN: an exhausted trainer must pass words through, not empty
    * the stream). The final `h<R>` stream is the held-out
    * tokenization; documents bill against its per-word counts. */
  val t14cBpeApplySql: String = {
    val sb = new StringBuilder
    sb.append(bpeCtesOver(
      s"(SELECT * FROM documents WHERE doc_id % $HoldoutMod <> 0)"))
    sb.append("\n").append(
      s""",hw AS (SELECT DISTINCT w FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w
        |     FROM documents WHERE doc_id % $HoldoutMod = 0)
        |  WHERE len(w) > 0),
        |h0 AS (SELECT w, i - 1 AS pos, w[i] AS sym
        |  FROM hw, unnest(generate_series(1, len(w))) AS t(i))""".stripMargin)
    for (k <- 1 to BpeRounds) {
      val j = k - 1
      sb.append("\n").append(
        s""",ha$k AS (SELECT w, pos, sym,
          |    lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
          |  FROM h$j),
          |hc$k AS (SELECT a.w, a.pos, a.sym, a.nxt,
          |    coalesce(a.sym = b.lhs AND a.nxt = b.rhs, false) AS m0
          |  FROM ha$k a LEFT JOIN b$k b ON true),
          |hd$k AS (SELECT *, NOT (m0 AND coalesce(lag(m0) OVER
          |    (PARTITION BY w ORDER BY pos), false)) AS new_run FROM hc$k),
          |he$k AS (SELECT *, max(CASE WHEN new_run THEN pos END) OVER
          |    (PARTITION BY w ORDER BY pos
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |    AS run_start
          |  FROM hd$k),
          |hf$k AS (SELECT *, m0 AND (pos - run_start) % 2 = 0 AS mrg
          |  FROM he$k),
          |hg$k AS (SELECT *, coalesce(lag(mrg) OVER
          |    (PARTITION BY w ORDER BY pos), false) AS consumed FROM hf$k),
          |h$k AS (SELECT w,
          |    row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
          |    CASE WHEN mrg THEN sym || nxt ELSE sym END AS sym
          |  FROM hg$k WHERE NOT consumed)""".stripMargin)
    }
    sb.append("\n").append(
      s""",hcnt AS (SELECT w, count(*)::BIGINT AS toks
        |  FROM h$BpeRounds GROUP BY w),
        |hdocs AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE doc_id % $HoldoutMod = 0)
        |SELECT t.doc_id, count(*)::BIGINT AS ws_tokens,
        |  sum(hc0.toks)::BIGINT AS bpe_tokens
        |FROM hdocs t JOIN hcnt hc0 ON hc0.w = t.w
        |WHERE len(t.w) > 0
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin)
    sb.toString
  }

  /** t15 oracle: the wordpiece recursive-CTE walk and the unrolled
    * BPE training rounds share one WITH clause (their CTE names are
    * disjoint) and join on the word. */
  val t15TokenizerCompareSql: String =
    s"""WITH RECURSIVE ${wpCtes("documents", VocabSize)},
      |${bpeCtes.replaceFirst("^WITH ", "")},
      |bpw AS (SELECT w, count(*)::BIGINT AS toks
      |  FROM s$BpeRounds GROUP BY w),
      |dl AS (SELECT lang, unnest(string_split(text, ' ')) AS w
      |  FROM documents)
      |SELECT dl.lang, count(*)::BIGINT AS ws_tokens,
      |  sum(wp.wp)::BIGINT AS wp_tokens,
      |  sum(bpw.toks)::BIGINT AS bpe_tokens,
      |  ((sum(wp.wp) * 10000) // count(*))::BIGINT AS wp_bp,
      |  ((sum(bpw.toks) * 10000) // count(*))::BIGINT AS bpe_bp
      |FROM dl JOIN wp ON wp.word = dl.w JOIN bpw ON bpw.w = dl.w
      |WHERE len(dl.w) > 0
      |GROUP BY dl.lang ORDER BY dl.lang""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "t11_wordpiece" -> t11WordpieceSql,
    "t11b_wordpiece_wide" -> t11bWordpieceWideSql,
    "t12_token_chunks" -> t12TokenChunksSql,
    "t14_bpe_merges" -> t14BpeMergesSql,
    "t14b_bpe_tokenize" -> t14bBpeTokenizeSql,
    "t14c_bpe_apply" -> t14cBpeApplySql,
    "t15_tokenizer_compare" -> t15TokenizerCompareSql,
    "sp3b_token_pack" -> sp3bTokenPackSql)
}
