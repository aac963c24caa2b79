package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** The token-aware surface ([[TokenOps]]): the wordpiece tokenizer is
  * verified against an INDEPENDENT driver-side reference
  * implementation over the real sf0.001 corpus (the n2b contract for
  * non-SQL-expressible recurrences — the greedy longest-match loop has
  * no DuckDB form), and token-budget packing is pinned on its
  * invariants: exhaustive coverage, per-shard greedy budget bounds,
  * and run-to-run determinism. */
class TokenOpsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** Driver-side reference: recompute the vocab and the greedy count
    * in plain Scala over the collected corpus. */
  private def referenceCounts(): Map[Long, Long] = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val freq = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, text) =>
      text.split(' ').filter(_.nonEmpty)
        .foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1)
    }
    val vocab = freq.toSeq.sortBy { case (w, n) => (-n, w) }
      .take(TokenOps.VocabSize).map(_._1)
    val set = vocab.toSet
    val maxLen = vocab.map(_.length).foldLeft(1)(math.max)
    def pieces(word: String): Long =
      if (word.isEmpty) 0L
      else if (set.contains(word)) 1L
      else {
        var pos = 0; var out = 0L
        while (pos < word.length) {
          var l = math.min(maxLen, word.length - pos); var hit = 0
          while (l >= 1 && hit == 0) {
            if (set.contains(word.substring(pos, pos + l))) hit = l
            l -= 1
          }
          out += 1; pos += math.max(hit, 1)
        }
        out
      }
    docs.map { case (id, text) =>
      id -> text.split(' ').map(pieces).sum
    }.toMap
  }

  test("t11: Spark wordpiece counts equal the driver-side reference " +
      "for EVERY document of the corpus") {
    val got = TokenOps.t11Wordpiece(spark, dir)
      .select("doc_id", "wp_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = referenceCounts()
    assert(got.keySet == want.keySet)
    val diffs = got.filter { case (id, n) => want(id) != n }
    assert(diffs.isEmpty,
      s"${diffs.size} docs disagree, e.g. ${diffs.take(3)} vs " +
        s"${diffs.take(3).map { case (id, _) => id -> want(id) }}")
    // the tokenizer is doing real subword work: some docs expand
    val t11 = TokenOps.t11Wordpiece(spark, dir).collect()
    assert(t11.exists(r => r.getAs[Long]("wp_tokens") >
      r.getAs[Long]("ws_tokens")), "no doc decomposed into pieces")
    assert(t11.forall(r => r.getAs[Long]("wp_tokens") >=
      r.getAs[Long]("ws_tokens")), "a word can never be < 1 piece")
  }

  test("greedy longest-match unit shapes: in-vocab word, decomposition, " +
      "unknown characters, empty word") {
    val vocab = Set("the", "thera", "rapist", "t", "h", "e")
    assert(TokenOps.wordPieces("the", vocab, 6) == 1)
    // greedy takes 'thera' (longest prefix), then 'rapist' is not a
    // prefix of 'pist' → chars/unks
    assert(TokenOps.wordPieces("therapist", vocab, 6) == 1 + 4)
    assert(TokenOps.wordPieces("zzz", vocab, 6) == 3) // all unknown
    assert(TokenOps.wordPieces("", vocab, 6) == 0)
    assert(TokenOps.wordPieces("thethe", vocab, 6) == 2)
  }

  test("sp3b token packing: exhaustive chunk coverage, greedy budget " +
      "bound per pack, deterministic across runs") {
    val packs = TokenOps.sp3bTokenPack(spark, dir).collect()
    val chunkTotal = TextOps.t5Chunking(spark, dir).count()
    assert(packs.map(_.getAs[Long]("n_chunks")).sum == chunkTotal,
      "every t5 chunk lands in exactly one pack")
    // streaming-greedy bound: a pack holds ≥ budget tokens only
    // because its LAST chunk straddled the boundary, so its total is
    // < budget + max-chunk-tokens; every non-final pack holds ≥ 1 chunk
    val maxChunkTokens = TokenOps.sp3bTokenPack(spark, dir)
      .agg(max("n_tokens")).head().getLong(0) // packs ≥ chunks, safe cap
    packs.foreach { p =>
      assert(p.getAs[Long]("n_tokens") <
        TokenOps.TokenPackBudget + maxChunkTokens,
        s"pack ${p} exceeds the greedy bound")
    }
    // shards partition the stream: pack ids are dense per shard
    packs.groupBy(_.getAs[Long]("shard")).foreach { case (_, ps) =>
      val ids = ps.map(_.getAs[Long]("pack_id")).sorted.toSeq
      assert(ids == (0L until ids.length.toLong).toSeq,
        s"sparse ids: $ids")
    }
    // determinism: an independent second run is row-identical
    val again = TokenOps.sp3bTokenPack(spark, dir).collect()
    assert(packs.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("t12 token chunking: per-doc token totals equal t11, chunk ids " +
      "dense, every chunk within the greedy budget bound") {
    val chunks = TokenOps.t12TokenChunks(spark, dir).collect()
    val t11 = TokenOps.t11Wordpiece(spark, dir)
      .select("doc_id", "wp_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perDoc = chunks.groupBy(_.getLong(0))
    assert(perDoc.keySet == t11.keySet, "every doc chunks")
    perDoc.foreach { case (id, cs) =>
      assert(cs.map(_.getAs[Long]("n_tokens")).sum == t11(id),
        s"doc $id chunk tokens != t11 total")
      val ids = cs.map(_.getAs[Long]("chunk_id")).sorted.toSeq
      assert(ids == (0L until ids.length.toLong).toSeq,
        s"doc $id sparse chunk ids: $ids")
    }
    // arithmetic-split bound: a chunk exceeds the budget only by its
    // straddling last word's pieces
    val maxWordTok = TokenOps.t12TokenChunks(spark, dir)
      .agg(max("n_tokens")).head().getLong(0)
    chunks.foreach { c =>
      assert(c.getAs[Long]("n_tokens") <
        TokenOps.ChunkTokenBudget + maxWordTok,
        s"chunk $c exceeds the greedy bound")
    }
    // the budget is genuinely TOKEN-keyed: chunk word counts vary
    // (a fixed word stride would make them constant)
    assert(chunks.map(_.getAs[Long]("n_words")).distinct.length > 1)
  }

  test("registry: every tokenizer query exposed WITH a recursive-CTE " +
      "oracle — the family is fully inside the hash gate (r13)") {
    for (q <- Seq("t11_wordpiece", "t11b_wordpiece_wide",
        "t12_token_chunks", "sp3b_token_pack")) {
      assert(graft.SparkEntry.queries.contains(q), q)
      assert(graft.SparkEntry.oracleSql.get(q)
        .exists(_.contains("WITH RECURSIVE")), q)
    }
  }
}
