package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** H-group text analysis + the tokenize/shingle machinery shared by
  * the dedup family (SURVEY §2 F/H). All higher-order-function based
  * (no UDFs) so the same transforms run unchanged in a streaming plan.
  */
object TextOps {

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  /** Sliding word n-gram shingles from a token-array column. Pass a
    * MATERIALIZED column (withColumn) — `ws` is referenced per slice,
    * so an inlined tokenize expression would re-run once per shingle
    * position. A doc with fewer than n words yields one shingle (its
    * whole token string) — mirrors list-slice clamping so oracle SQL
    * matches exactly.
    */
  def shinglesFromTokens(ws: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(ws) - n, lit(0))),
      i => concat_ws(" ", slice(ws, i + 1, lit(n))))

  /** Convenience (small inputs / specs): tokenize inline. Quadratic in
    * doc length — production paths use [[shinglesFromTokens]] over a
    * materialized token column.
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Distinct (id, shingle) pairs — the input to Jaccard and MinHash. */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), explode(shingles(col(textCol), n)).as("sh")).distinct()

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish token count: alpha runs, digit runs, single punctuation. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Collapse whitespace, lowercase — canonical form for fingerprints. */
  def normalizeWs(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Aggressive normalization: lowercase, strip non-alnum, collapse. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Content fingerprint (md5 of the whitespace-normalized text). */
  def fingerprint(text: Column): Column = md5(normalizeWs(text))

  /** 60-bit numeric fingerprint via the codegen'd Md5Prefix64 expr. */
  def fingerprint64(text: Column): Column =
    HashFunctions.md5prefix64(normalizeWs(text))

  /** Rolling k-gram hash array over an ALREADY-NORMALIZED text
    * column — step 1 of winnowing. `norm` MUST be a materialized
    * column reference (withColumn), not an inline expression: the
    * lambda evaluates `norm` once per character position, so an
    * inlined normalizeWs (two regex passes) would turn a length-n doc
    * into O(n²) regex work — measured as a 26 s → sub-second
    * difference on the sf0.1 corpus.
    */
  def gramHashesFromNorm(norm: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => HashFunctions.md5prefix64(norm.substr(i, lit(k))) % lit(graft.functions.HashUtil.P))

  /** Convenience (small inputs / specs): normalize inline. Quadratic —
    * production paths materialize normalizeWs first and use
    * [[gramHashesFromNorm]].
    */
  def gramHashes(text: Column, k: Int): Column =
    gramHashesFromNorm(normalizeWs(text), k)

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03) from a
    * materialized gram-hash column: minimum of each sliding window of
    * `w` hashes, distinct minima kept. Robust to local edits; the
    * standard document-fingerprinting scheme for near-dup detection.
    *
    * Backed by the native [[graft.functions.SlidingMinDistinct64]]
    * kernel (whole loop compiled, one pass, no per-window arrays);
    * [[winnowFromGramsComposed]] keeps the pure-HOF spelling, which
    * the spec asserts is equivalent. Shorter-than-w docs yield the
    * whole-array min — the same clamping the oracle mirrors.
    */
  def winnowFromGrams(grams: Column, w: Int): Column =
    graft.functions.HashFunctions.slidingMinDistinct64(grams, w)

  /** The composed HOF spelling of [[winnowFromGrams]]: elementwise
    * `least` over w shifted copies (out-of-range slices null-pad,
    * `least` skips nulls → clamped-window minima), then distinct.
    * Reference implementation for the equivalence spec.
    */
  def winnowFromGramsComposed(grams: Column, w: Int): Column = {
    val len = greatest(size(grams) - (w - 1), lit(1))
    array_distinct(
      (0 until w).map(i => slice(grams, lit(1 + i), len))
        .reduce((a, b) => zip_with(a, b, (x, y) => least(x, y))))
  }

  val StopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is")
  val StopwordsEs = Seq("el", "la", "de", "que", "los", "se")
  val StopwordsDe = Seq("der", "die", "und", "das", "ist")
  val StopwordsFr = Seq("le", "la", "et", "les", "des")

  def stopwordHits(ws: Column, stopwords: Seq[String]): Column =
    size(filter(ws, w => w.isin(stopwords: _*)))

  /** Language-ID heuristic: stopword hit counts per language, argmax
    * with a fixed preference order (en > es > de > fr) on ties.
    */
  def langScores(text: Column): Seq[(String, Column)] = {
    val ws = tokens(text)
    Seq("en" -> stopwordHits(ws, StopwordsEn),
      "es" -> stopwordHits(ws, StopwordsEs),
      "de" -> stopwordHits(ws, StopwordsDe),
      "fr" -> stopwordHits(ws, StopwordsFr))
  }

  def langPredict(en: Column, es: Column, de: Column, fr: Column): Column =
    when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
}
