package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The published composite quality-rule battery: Gopher's document
  * filters (Rae et al. 2021, "Scaling Language Models", Table A1)
  * plus C4's page rules (Raffel et al. 2020, §2.2) — the rule set a
  * curation team cites when they say "Gopher-filtered". Each rule is
  * a row-local predicate over integer signals; every ratio threshold
  * is spelled as an integer cross-multiplication (e.g. mean word
  * length in [3, 10] ⇔ 3·n_words ≤ Σ|w| ≤ 10·n_words), so verdicts
  * are bit-exact across engines — no float in any verdict path.
  *
  * Rules (first-fail report order):
  *  - gopher_word_count:    50 ≤ n_words ≤ 100 000
  *  - gopher_mean_word_len: mean word length in [3, 10] chars
  *  - gopher_symbol_ratio:  (#'#' + #'...') / n_words ≤ 0.1
  *  - gopher_bullet_lines:  < 90% of lines start with a bullet
  *  - gopher_ellipsis_lines:< 30% of lines end with an ellipsis
  *  - gopher_alpha_words:   ≥ 80% of words contain an alphabetic char
  *  - gopher_stopwords:     ≥ 2 of {the,be,to,of,and,that,have,with}
  *  - c4_brace:             no '{' on the page
  *  - c4_lorem:             no "lorem ipsum"
  *  - c4_min_sentences:     ≥ 3 terminal-punctuation sentences
  *
  * Scale shape: pure row-local HOF/regex work inside one scan stage —
  * no shuffle, no UDF, streaming-safe (the same columns drop into a
  * foreachBatch gate unchanged).
  */
object QualityRules {

  /** Gopher Table A1's required-stopword list. */
  val RequiredStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Rule names in first-fail order, paired with their verdict column. */
  val RuleOrder: Seq[(String, String)] = Seq(
    "r_word_count" -> "gopher_word_count",
    "r_mean_word_len" -> "gopher_mean_word_len",
    "r_symbol_ratio" -> "gopher_symbol_ratio",
    "r_bullet_lines" -> "gopher_bullet_lines",
    "r_ellipsis_lines" -> "gopher_ellipsis_lines",
    "r_alpha_words" -> "gopher_alpha_words",
    "r_stopwords" -> "gopher_stopwords",
    "r_no_brace" -> "c4_brace",
    "r_no_lorem" -> "c4_lorem",
    "r_min_sentences" -> "c4_min_sentences")

  val GopherRules: Seq[String] = RuleOrder.map(_._1).take(7)
  val C4Rules: Seq[String] = RuleOrder.map(_._1).drop(7)

  /** Adds the integer signal columns, the 10 per-rule booleans,
    * `gopher_pass` / `c4_pass` / `pass`, and `first_fail` (NULL when
    * the doc passes). Token and line arrays are materialized via
    * withColumn so each is computed once per row, then dropped.
    */
  def withRuleColumns(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val sig = df
      .withColumn("__ws", TextOps.tokens(t))
      .withColumn("__lines", split(t, "\n"))
      .withColumn("n_words", size(col("__ws")).cast("long"))
      .withColumn("sum_wchars",
        aggregate(col("__ws"), lit(0L), (a, w) => a + length(w)))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("n_bullet_lines",
        size(filter(col("__lines"), l => l.rlike("^\\s*[-*•]"))).cast("long"))
      .withColumn("n_ellipsis_lines",
        size(filter(col("__lines"), l => l.rlike("\\.\\.\\.\\s*$"))).cast("long"))
      .withColumn("n_hash_chars",
        (length(t) - length(replace(t, lit("#"), lit("")))).cast("long"))
      .withColumn("n_ellipsis",
        ((length(t) - length(replace(t, lit("..."), lit("")))) / lit(3)).cast("long"))
      .withColumn("n_alpha_words",
        size(filter(col("__ws"), w => w.rlike("[a-z]"))).cast("long"))
      .withColumn("n_req_stops",
        size(filter(lit(RequiredStops.toArray),
          s => array_contains(col("__ws"), s))).cast("long"))
      .withColumn("n_sentences", regexp_count(t, lit("[.!?]")).cast("long"))
      .withColumn("has_brace", t.contains("{"))
      .withColumn("has_lorem", lower(t).contains("lorem ipsum"))
      .drop("__ws", "__lines")
    val ruled = sig
      .withColumn("r_word_count", col("n_words").between(50L, 100000L))
      .withColumn("r_mean_word_len",
        lit(3L) * col("n_words") <= col("sum_wchars") &&
          col("sum_wchars") <= lit(10L) * col("n_words"))
      .withColumn("r_symbol_ratio",
        lit(10L) * (col("n_hash_chars") + col("n_ellipsis")) <= col("n_words"))
      .withColumn("r_bullet_lines",
        lit(10L) * col("n_bullet_lines") < lit(9L) * col("n_lines"))
      .withColumn("r_ellipsis_lines",
        lit(10L) * col("n_ellipsis_lines") < lit(3L) * col("n_lines"))
      .withColumn("r_alpha_words",
        lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words"))
      .withColumn("r_stopwords", col("n_req_stops") >= 2L)
      .withColumn("r_no_brace", !col("has_brace"))
      .withColumn("r_no_lorem", !col("has_lorem"))
      .withColumn("r_min_sentences", col("n_sentences") >= 3L)
    val firstFail = RuleOrder.foldRight(lit(null).cast("string"): Column) {
      case ((ruleCol, name), rest) => when(!col(ruleCol), name).otherwise(rest)
    }
    ruled
      .withColumn("gopher_pass", GopherRules.map(col).reduce(_ && _))
      .withColumn("c4_pass", C4Rules.map(col).reduce(_ && _))
      .withColumn("pass", col("gopher_pass") && col("c4_pass"))
      .withColumn("first_fail", firstFail)
      .drop("has_brace", "has_lorem")
  }

  // ---- the rule-exercise battery -----------------------------------
  // The synthetic corpus is punctuation-free word salad, so several
  // rules would be vacuous on it alone. These literal docs (ids ≥
  // 900000) are unioned in-query (the i4 re-ingest pattern): one
  // golden doc passing every rule, and one doc per rule engineered to
  // fail exactly that rule first. Both engines see the identical
  // literals — the oracle VALUES are generated from these constants.

  private val goldenSentence =
    "the data of systems and the value goes to a table that people have built with care."

  /** 68 words, 4 sentences — passes all 10 rules. */
  val GoldenDoc: String = Seq.fill(4)(goldenSentence).mkString(" ")

  /** (doc_id, text) literal battery: golden + one first-fail per rule. */
  val BatteryDocs: Seq[(Long, String)] = Seq(
    900000L -> GoldenDoc,
    // 4 words → gopher_word_count
    900001L -> "too short to pass.",
    // 60 words of length 21 → gopher_mean_word_len
    900002L -> Seq.fill(60)("incomprehensibilities").mkString(" "),
    // 8 '#' over 76 words (ratio > 0.1) → gopher_symbol_ratio
    900003L -> (GoldenDoc + " " + Seq.fill(8)("#").mkString(" ")),
    // 10/10 bullet lines → gopher_bullet_lines
    900004L -> Seq.fill(10)(
      "- the data of and that have with more words here.").mkString("\n"),
    // 10/10 ellipsis-terminated lines → gopher_ellipsis_lines
    900005L -> Seq.fill(10)(
      "the data of and that have with more words trailing off...").mkString("\n"),
    // 25 numeric words over 93 (alpha 73% < 80%) → gopher_alpha_words
    900006L -> (GoldenDoc + " " + Seq.fill(25)("12345").mkString(" ")),
    // 60 words, zero required stopwords → gopher_stopwords
    900007L -> Seq.fill(6)(
      "data systems value tables people built care quality signal corpus.").mkString(" "),
    900008L -> (GoldenDoc + " {"), // → c4_brace
    900009L -> (GoldenDoc + " lorem ipsum"), // → c4_lorem
    // periods stripped, 0 sentences → c4_min_sentences
    900010L -> GoldenDoc.replace(".", ""))

  /** The battery as SQL VALUES rows (newlines spliced as chr(10)) —
    * the oracle-side twin of [[BatteryDocs]].
    */
  def batterySqlValues: String =
    BatteryDocs.map { case (id, text) =>
      val lit = text.split("\n", -1)
        .map(p => "'" + p + "'").mkString(" || chr(10) || ")
      s"($id, $lit)"
    }.mkString(", ")
}
