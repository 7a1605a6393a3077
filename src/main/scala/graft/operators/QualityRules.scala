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

  // ---- Gopher Table A1 repetition rules (the battery's other half) --

  /** Repetition rule names in first-fail order (threshold as integer
    * percent): the published Gopher repetition filters.
    */
  val RepRuleOrder: Seq[(String, String, Int)] = Seq(
    ("rr_dup_line_frac", "rep_dup_line_frac", 30),
    ("rr_dup_para_frac", "rep_dup_para_frac", 30),
    ("rr_dup_line_char", "rep_dup_line_char_frac", 20),
    ("rr_dup_para_char", "rep_dup_para_char_frac", 20),
    ("rr_top_2gram", "rep_top_2gram_char_frac", 20),
    ("rr_top_3gram", "rep_top_3gram_char_frac", 18),
    ("rr_top_4gram", "rep_top_4gram_char_frac", 16),
    ("rr_dup_5gram", "rep_dup_5gram_char_frac", 15),
    ("rr_dup_6gram", "rep_dup_6gram_char_frac", 14),
    ("rr_dup_7gram", "rep_dup_7gram_char_frac", 13),
    ("rr_dup_8gram", "rep_dup_8gram_char_frac", 12),
    ("rr_dup_9gram", "rep_dup_9gram_char_frac", 11),
    ("rr_dup_10gram", "rep_dup_10gram_char_frac", 10))

  private def sumLen(arr: Column): Column =
    aggregate(arr, lit(0L), (a, x) => a + length(x))

  /** Adds Gopher's REPETITION filters (Rae et al. 2021 Table A1,
    * bottom half): duplicate line / paragraph fractions (count and
    * character mass), top-{2,3,4}-gram character fraction, duplicate
    * {5..10}-gram character fraction — 13 per-rule booleans,
    * `rep_pass`, and `rep_first_fail`. Definitions (documented, both
    * engines identical):
    *  - lines split on \n, paragraphs on \n\n, empties removed;
    *    "duplicate" = occurrences beyond the first of an identical
    *    string; char mass over the line/para characters.
    *  - word n-grams over the lowercased whitespace tokens; top-n =
    *    max over distinct grams of count·len(gram); dup-n = char mass
    *    of ALL occurrences of grams occurring ≥ 2 (overlaps counted —
    *    a documented deviation from position-marking
    *    implementations, chosen because it is exactly replayable).
    *  - every threshold is an integer cross-multiplication
    *    (100·mass ≤ pct·denominator) — no float in any verdict.
    *
    * Counting is O(words²) per doc via codegen'd HOFs (distinct ×
    * filter) — right for page-sized docs; a 100 TB corpus of long
    * docs would swap in a one-pass counting kernel (the K24 shape)
    * without changing any verdict.
    */
  def withRepetitionColumns(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    var sig = df
      .withColumn("__ws", TextOps.tokens(t))
      .withColumn("__lines", filter(split(t, "\n"), l => l =!= ""))
      .withColumn("__paras", filter(split(t, "\n\n"), p => p =!= ""))
      .withColumn("tchars", length(t).cast("long"))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("n_paras", size(col("__paras")).cast("long"))
      .withColumn("dup_lines",
        (size(col("__lines")) - size(array_distinct(col("__lines")))).cast("long"))
      .withColumn("dup_paras",
        (size(col("__paras")) - size(array_distinct(col("__paras")))).cast("long"))
      .withColumn("line_chars", sumLen(col("__lines")))
      .withColumn("para_chars", sumLen(col("__paras")))
      .withColumn("dup_line_chars",
        sumLen(col("__lines")) - sumLen(array_distinct(col("__lines"))))
      .withColumn("dup_para_chars",
        sumLen(col("__paras")) - sumLen(array_distinct(col("__paras"))))
    // all nine n-gram statistics come from ONE compiled pass over the
    // text (GramRepStats64, K26): tokenize/hash/measure each token
    // once, roll the F14 double Rabin–Karp window hash per n, count
    // in an open-addressing map. Gram identity is the ~60-bit window
    // hash (a collision would fail the string-counting oracle — the
    // F14 contract); the interpreted HOF spelling this replaces ran
    // 9 O(words²) string-comparison passes per row (35.7 s at sf0.1
    // vs sub-second for the kernel, identical counts).
    sig = sig.withColumn("__grs",
      graft.functions.HashFunctions.gramRepStats(t))
    for (n <- 2 to 4)
      sig = sig.withColumn(s"top${n}_chars", element_at(col("__grs"), n - 1))
    for (n <- 5 to 10)
      sig = sig.withColumn(s"dup${n}_chars", element_at(col("__grs"), n - 1))
    sig = sig.drop("__grs")
    val ruled = sig
      .withColumn("rr_dup_line_frac",
        lit(100L) * col("dup_lines") <= lit(30L) * col("n_lines"))
      .withColumn("rr_dup_para_frac",
        lit(100L) * col("dup_paras") <= lit(30L) * col("n_paras"))
      .withColumn("rr_dup_line_char",
        lit(100L) * col("dup_line_chars") <= lit(20L) * col("line_chars"))
      .withColumn("rr_dup_para_char",
        lit(100L) * col("dup_para_chars") <= lit(20L) * col("para_chars"))
      .withColumn("rr_top_2gram",
        lit(100L) * col("top2_chars") <= lit(20L) * col("tchars"))
      .withColumn("rr_top_3gram",
        lit(100L) * col("top3_chars") <= lit(18L) * col("tchars"))
      .withColumn("rr_top_4gram",
        lit(100L) * col("top4_chars") <= lit(16L) * col("tchars"))
      .withColumn("rr_dup_5gram",
        lit(100L) * col("dup5_chars") <= lit(15L) * col("tchars"))
      .withColumn("rr_dup_6gram",
        lit(100L) * col("dup6_chars") <= lit(14L) * col("tchars"))
      .withColumn("rr_dup_7gram",
        lit(100L) * col("dup7_chars") <= lit(13L) * col("tchars"))
      .withColumn("rr_dup_8gram",
        lit(100L) * col("dup8_chars") <= lit(12L) * col("tchars"))
      .withColumn("rr_dup_9gram",
        lit(100L) * col("dup9_chars") <= lit(11L) * col("tchars"))
      .withColumn("rr_dup_10gram",
        lit(100L) * col("dup10_chars") <= lit(10L) * col("tchars"))
    val firstFail = RepRuleOrder.foldRight(lit(null).cast("string"): Column) {
      case ((ruleCol, name, _), rest) => when(!col(ruleCol), name).otherwise(rest)
    }
    ruled
      .withColumn("rep_pass", RepRuleOrder.map(r => col(r._1)).reduce(_ && _))
      .withColumn("rep_first_fail", firstFail)
      .drop("__ws", "__lines", "__paras")
  }

  // ---- FineWeb/DCLM LINE-LEVEL battery (H21) ------------------------

  /** FineWeb/DCLM rule names in first-fail order: the 2024 published
    * siblings of the Gopher/C4 batteries — FineWeb's three custom
    * line-level filters (Penedo et al. 2024, "The FineWeb Datasets",
    * §3.6: terminal-punctuation line ratio ≤ 0.12 removed, fraction
    * of characters in duplicated lines ≥ 0.10 removed, fraction of
    * lines shorter than 30 chars ≥ 0.67 removed) plus the
    * RefinedWeb-lineage list-like-page heuristic DCLM reproduces
    * (Li et al. 2024; Penedo et al. 2023 §G: a page whose lines are
    * mostly bullets/enumerations is navigation, not prose — spelled
    * here as list-like lines ≥ 1/2 removed).
    */
  val FwRuleOrder: Seq[(String, String)] = Seq(
    "fw_term_punct" -> "fineweb_term_punct_lines",
    "fw_dup_line_chars" -> "fineweb_dup_line_chars",
    "fw_short_lines" -> "fineweb_short_lines",
    "fw_list_lines" -> "dclm_list_lines")

  /** Adds the H21 line-grain signal columns, the 4 per-rule booleans,
    * `fw_pass`, and `fw_first_fail` (NULL when the doc passes). Lines
    * are the NONEMPTY '\n'-split segments; every ratio threshold is
    * an integer cross-multiplication (H17's exact treatment — no
    * float in any verdict). A doc with zero nonempty lines fails
    * `fw_term_punct` (0 > 0 is false) — deterministic in both
    * engines. Row-local single-scan work, streaming-safe.
    */
  def withFineWebColumns(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val sig = df
      .withColumn("__lines", filter(split(t, "\n"), l => l =!= ""))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("n_term_lines",
        size(filter(col("__lines"), l => l.rlike("[.!?\"]$"))).cast("long"))
      .withColumn("line_chars", sumLen(col("__lines")))
      .withColumn("dup_line_chars",
        sumLen(col("__lines")) - sumLen(array_distinct(col("__lines"))))
      .withColumn("n_short_lines",
        size(filter(col("__lines"), l => length(l) < 30)).cast("long"))
      .withColumn("n_list_lines",
        size(filter(col("__lines"),
          l => l.rlike("^\\s*([-*•]|[0-9]+[.)])"))).cast("long"))
      .drop("__lines")
    val ruled = sig
      // keep iff terminal-punctuation lines > 12% of lines
      .withColumn("fw_term_punct",
        lit(100L) * col("n_term_lines") > lit(12L) * col("n_lines"))
      // keep iff duplicated-line char mass < 10% of line chars
      .withColumn("fw_dup_line_chars",
        lit(10L) * col("dup_line_chars") < col("line_chars"))
      // keep iff lines under 30 chars are < 67% of lines
      .withColumn("fw_short_lines",
        lit(100L) * col("n_short_lines") < lit(67L) * col("n_lines"))
      // keep iff list-like lines are < 1/2 of lines
      .withColumn("fw_list_lines",
        lit(2L) * col("n_list_lines") < col("n_lines"))
    val firstFail = FwRuleOrder.foldRight(lit(null).cast("string"): Column) {
      case ((ruleCol, name), rest) => when(!col(ruleCol), name).otherwise(rest)
    }
    ruled
      .withColumn("fw_pass", FwRuleOrder.map(r => col(r._1)).reduce(_ && _))
      .withColumn("fw_first_fail", firstFail)
  }

  /** H21 literals (ids ≥ 920000): a golden doc and one engineered
    * first-fail per rule — every rule provably fires at every SF
    * (the synthetic corpus is single-line word salad, which fails
    * fw_term_punct wholesale, so the battery is what exercises the
    * later rules).
    */
  val FwBatteryDocs: Seq[(Long, String)] = {
    val prose = (k: Int) =>
      s"the quick brown fox number $k jumps over the lazy dog tonight."
    Seq(
      // 5 long, distinct, punctuation-terminated prose lines: passes all 4
      920000L -> (0 until 5).map(prose).mkString("\n"),
      // same lines, periods stripped: term ratio 0 ≤ 12% → fw_term_punct
      920001L -> (0 until 5).map(prose(_).dropRight(1)).mkString("\n"),
      // one long line ×3 among 8 distinct: dup char mass 114/659 ≥ 10%
      // while term 11/11, short 0, list 0 → fw_dup_line_chars
      920002L -> ((0 until 8).map(prose) ++ Seq.fill(3)(
        "this exact sentence appears twice in the page body today."))
        .mkString("\n"),
      // 9 of 12 lines under 30 chars (75% ≥ 67%) but dup-free,
      // punctuation-terminated, non-list → fw_short_lines
      920003L -> ((0 until 9).map(k => s"tiny line number $k.") ++
        (0 until 3).map(prose)).mkString("\n"),
      // 6 of 10 lines bulleted (≥ 1/2) but long, distinct,
      // punctuation-terminated → dclm_list_lines
      920004L -> ((0 until 6).map(k =>
        s"- bullet item $k with plenty of words to cross thirty chars.") ++
        (0 until 4).map(prose)).mkString("\n"))
  }

  /** [[sqlValues]] over [[FwBatteryDocs]]. */
  def fwBatterySqlValues: String = sqlValues(FwBatteryDocs)

  private def wtok(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => f"$prefix$i%02d")

  /** Repetition-battery literals (ids ≥ 910000): a golden doc and one
    * engineered first-fail per REACHABLE rule. (dup-para-char and
    * dup-{6..10}-gram can never fire first: identical paragraphs
    * imply identical lines, and a duplicated n-gram implies ~3× the
    * 5-gram dup mass at a 1.5× looser threshold — the battery
    * documents this instead of pretending.)
    */
  val RepBatteryDocs: Seq[(Long, String)] = Seq(
    // 60 distinct words, one line: passes all 13
    910000L -> wtok("g", 60).mkString(" "),
    // 10 lines, 5 identical: dup_line_frac 4/10 > 0.30
    910001L -> (Seq.fill(5)("alpha beta gamma") ++
      wtok("u", 5).map(u => s"$u line unique $u")).mkString("\n"),
    // 11 paras: 5 identical 1-liners + 6 unique 6-line paras —
    // para frac 4/11 > 0.30 while line frac 4/41 passes
    910002L -> (Seq.fill(5)("repeated paragraph line") ++
      (0 until 6).map(k =>
        (0 until 6).map(j => s"para$k line$j word").mkString("\n")))
      .mkString("\n\n"),
    // 10 lines, one LONG line ×3: line frac 2/10 passes, dup line
    // char mass 2·239/780 > 0.20
    910003L -> (Seq.fill(3)(wtok("dup", 40).mkString(" ")) ++
      wtok("s", 7).map(s => s"$s short")).mkString("\n"),
    // one bigram repeated 30×: top-2-gram mass 240/269 > 0.20
    910004L -> Seq.fill(30)("spam ham").mkString(" "),
    // a 10-word phrase ×2 among 40 unique words: dup-5-gram mass
    // 228/239 > 0.15 while top-{2,3,4} pass (2·15 = 30 ≤ 0.16·239)
    910005L -> (wtok("p", 10) ++ wtok("u", 40) ++ wtok("p", 10)).mkString(" "),
    // a trigram ×5 spread among unique fillers: top-3 fails
    // (5·11 > 0.18·239), top-2 passes (5·7 ≤ 0.20·239)
    910006L -> (0 until 5).flatMap(k =>
      Seq("aa1", "bb2", "cc3") ++
        "abcdefghi".map(c => s"x$k$c")).mkString(" "),
    // a 4-gram ×3: top-4 fails (3·15 > 0.16·239), top-3 passes
    910007L -> (0 until 3).flatMap(k =>
      Seq("aa1", "bb2", "cc3", "dd4") ++
        "abcdefghijklmnop".map(c => s"x$k$c")).mkString(" "))

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

  /** Literal docs as SQL VALUES rows (newlines spliced as chr(10)) —
    * the oracle-side twin of a battery constant.
    */
  def sqlValues(docs: Seq[(Long, String)]): String =
    docs.map { case (id, text) =>
      val lit = text.split("\n", -1)
        .map(p => "'" + p + "'").mkString(" || chr(10) || ")
      s"($id, $lit)"
    }.mkString(", ")

  /** [[sqlValues]] over [[BatteryDocs]]. */
  def batterySqlValues: String = sqlValues(BatteryDocs)

  /** [[sqlValues]] over [[RepBatteryDocs]]. */
  def repBatterySqlValues: String = sqlValues(RepBatteryDocs)
}
