package graft.functions

import org.apache.spark.sql.Column

/** Public face of the engine's native vector expressions (see
  * org.apache.spark.sql.graftvec for the Catalyst internals). */
object VectorFunctions {

  /** Codegen'd dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftvec.GraftVec.dotColumn(a, b)

  /** Codegen'd common-element count of two sorted-ascending,
    * duplicate-free array<long> columns (the dedup verification
    * kernel — see SortedIntersectCount for the caller contract). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graftvec.GraftVec.sortedIntersectCountColumn(a, b)

  /** Top-k IVF cell ids of a vector against a literal codebook, in rank
    * order (see IvfTopCells for the cosine/tie contract). */
  def ivfTopCells(v: Column, nrm: Column, cents: Seq[(Int, Seq[Double])],
      k: Int, tieLargestCell: Boolean): Column =
    org.apache.spark.sql.graftvec.GraftVec
      .ivfTopCellsColumn(v, nrm, cents, k, tieLargestCell)

  /** All `perms` MinHash values of a sorted duplicate-free array<long>
    * shingle-hash set in one map expression — bank(i) =
    * min(xxhash64(i, h)) over the set (see MinHashBank). */
  def minHashBank(v: Column, perms: Int): Column =
    org.apache.spark.sql.graftvec.GraftVec.minHashBankColumn(v, perms)

  /** All word-n-gram xxhash64 values of a split word array, in array
    * order — bit-identical to the window/lead + concat_ws formulation
    * it replaces, with zero shuffle (see NgramHashStream). */
  def ngramHashStream(words: Column, n: Int): Column =
    org.apache.spark.sql.graftvec.GraftVec.ngramHashStreamColumn(words, n)

  /** All adjacent-word (h1, h12) xxhash64 pairs of a split word array
    * (see BigramHashPairs — t8's bigram-LM stream kernel). */
  def bigramHashPairs(words: Column): Column =
    org.apache.spark.sql.graftvec.GraftVec.bigramHashPairsColumn(words)

  /** Occurrence counts of a fixed term list in a split word array —
    * one pass instead of one HOF filter per term (see TermCountBank). */
  def termCountBank(words: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.graftvec.GraftVec.termCountBankColumn(words, terms)

  /** First `hexChars` md5 hex digits of a string as an unsigned long —
    * the conv(substring(md5(…)))-chain idiom without the hex-string
    * round trip (see Md5Prefix64). */
  def md5Prefix64(s: Column, hexChars: Int): Column =
    org.apache.spark.sql.graftvec.GraftVec.md5Prefix64Column(s, hexChars)

  /** Rank-correlation hash bits over a fixed index-pair list — the mm5
    * perceptual-hash projection as one expression (see RankPairBits). */
  def rankPairBits(f: Column, pairs: Seq[(Int, Int)]): Column =
    org.apache.spark.sql.graftvec.GraftVec.rankPairBitsColumn(f, pairs)

  /** PPJoin candidate pairs of one sorted posting group, length and
    * position bounds applied inside the expansion loop (see
    * PpjoinCandidatePairs for the exact integer bounds). */
  def ppjoinCandidatePairs(ids: Column): Column =
    org.apache.spark.sql.graftvec.GraftVec.ppjoinCandidatePairsColumn(ids)

  /** Every ordered pair (da, db) of a sorted array<long> — the LSH
    * bucket expansion kernel. */
  def orderedPairs(ids: Column): Column =
    org.apache.spark.sql.graftvec.GraftVec.orderedPairsColumn(ids)

  /** ADC dot of a PQ-coded candidate against a fixed query set's
    * lookup table (see PqAdcDot). */
  def pqAdcDot(qid: Column, codes: Column,
      table: Map[Long, Array[Double]], m: Int): Column =
    org.apache.spark.sql.graftvec.GraftVec.pqAdcDotColumn(qid, codes, table, m)

  /** Make `vec_dot` callable from spark.sql in this session. For
    * cluster-wide registration use
    * `spark.sql.extensions=org.apache.spark.sql.graftvec.GraftSqlExtensions`. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftvec.GraftVec.registerSql(spark)
}
