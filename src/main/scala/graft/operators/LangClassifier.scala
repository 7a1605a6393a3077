package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** H20 — TRAINED multilingual language identification, the
  * production-grade replacement for H3's stopword-hit heuristic.
  *
  * CCNet (Wenzek et al. 2020 §3.2), C4 and RefinedWeb all run language
  * ID as a trained fasttext-family classifier (Joulin et al. 2017)
  * over character n-gram features — not a stopword table. This is
  * that stage re-expressed with the repo's existing machinery: the
  * P20 Naive-Bayes training recipe generalized from 2 classes to L
  * languages, hashed char-TRIGRAM buckets as the feature space (the
  * hashing trick — vocabulary unbounded, model fixed-size), and
  * serving through a K24-style compiled kernel
  * ([[graft.functions.LangGramScores]]) that computes all L
  * per-language scores in one pass per document.
  *
  * Model: per language l and bucket b,
  *   w_l[b] = ln((c_l[b] + 1) / (T_l + k))      (add-1 smoothing)
  * quantized to integer MICROS (the DSIR/P20 treatment), so a doc's
  * per-language score Σ_grams w_l[bucket(gram)] is an exact BIGINT
  * dot product and the argmax is engine-portable despite the
  * transcendental ln. Equal class priors are assumed (every doc
  * contributes the same gram count to every class's score), so the
  * prior term cancels in the argmax.
  *
  * Scale shape: training = one corpus gram explode + ONE
  * map-side-combined (lang, bucket) aggregation (≤ L·k rows out —
  * 1280 here — at ANY corpus size) + one L-row totals broadcast; the
  * corpus never shuffles on anything wider than a bucket id. The
  * trained table is driver-collected by design (L·k longs — the
  * codebook-collect contract) and serving is a row-local compiled
  * kernel: a pure map stage, streaming-safe, zero joins.
  *
  * Training data: the driver's corpus carries language LABELS
  * (`documents.lang` — what p5/p11/p24 key on) but its synthetic text
  * is language-free word salad, so the multilingual text slice is
  * SYNTHESIZED deterministically per doc IN ITS LABELED LANGUAGE
  * (words selected from the per-language vocabularies below by md5
  * hashes of (doc_id, position)). Both engines rebuild the identical
  * slice from the ONE Scala vocabulary table, so the DuckDB oracle
  * replays train→apply end-to-end — and the spec can measure the
  * trained model against H3's heuristic on the same labeled slice.
  */
object LangClassifier {

  /** The corpus's label set, alphabetical — also the deterministic
    * argmax preference order.
    */
  val Langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** Per-language vocabularies (24 words each, lowercase ASCII — no
    * case/unicode normalization hazards between engines; zh as pinyin
    * romanization, which is how an ASCII-clean corpus would surface
    * it). Real high-frequency words so the char-trigram distributions
    * are genuinely language-shaped, including cross-language trigram
    * collisions ("und"/"and", es/fr latin roots) that a stopword-hit
    * table scores as ties.
    */
  val Vocabs: Map[String, Seq[String]] = Map(
    "de" -> Seq("und", "der", "die", "das", "nicht", "sich", "auch", "wenn",
      "aber", "nach", "durch", "zwischen", "wichtig", "immer", "schon",
      "jetzt", "jahren", "menschen", "sprache", "wasser", "bitte", "danke",
      "zeit", "welt"),
    "en" -> Seq("the", "and", "that", "have", "with", "this", "from", "they",
      "would", "there", "their", "about", "which", "people", "time", "years",
      "water", "language", "thank", "please", "world", "could", "should",
      "because"),
    "es" -> Seq("que", "los", "las", "por", "con", "para", "una", "este",
      "desde", "cuando", "entre", "siempre", "ahora", "tiempo", "agua",
      "gracias", "idioma", "mundo", "gente", "sobre", "pero", "nunca",
      "hasta", "donde"),
    "fr" -> Seq("les", "des", "une", "est", "pas", "pour", "dans", "avec",
      "sur", "mais", "quand", "toujours", "maintenant", "temps", "eau",
      "merci", "langue", "monde", "gens", "depuis", "cette", "jamais",
      "aussi", "encore"),
    "zh" -> Seq("zhongguo", "renmen", "shijian", "shui", "xiexie", "qing",
      "shijie", "yuyan", "xianzai", "yizhi", "yihou", "yinwei", "suoyi",
      "women", "nimen", "tamen", "shenme", "zhege", "keyi", "meiyou",
      "zhidao", "xihuan", "pengyou", "mingtian"))

  val WordsPerDoc = 12
  val VocabSize = 24
  val GramN = 3
  val Buckets = 256

  /** Shared LOANWORD vocabulary (24 words) — internationalisms that
    * appear verbatim in every language's text (hotel/taxi/radio...),
    * the realistic cross-lingual overlap a 24-word-per-language clean
    * slice lacks. In the confusable slice these words occur at a
    * controlled rate in EVERY language, so their trigram buckets
    * carry near-equal trained mass across classes: they dilute the
    * per-doc signal instead of separating it — exactly what makes
    * short mixed docs a real (sub-100%) operating point.
    */
  val LoanWords: Seq[String] = Seq("hotel", "taxi", "radio", "piano",
    "metro", "virus", "pizza", "bank", "film", "foto", "tunnel", "sport",
    "tiger", "zebra", "golf", "kiwi", "laser", "opera", "robot", "sofa",
    "tango", "villa", "yoga", "zoo")

  /** Words per SHORT-tier doc in the confusable slice (docs with
    * doc_id ≡ 0 mod 3): real lang-ID error concentrates in short
    * texts, where a handful of loan/borrowed words can outweigh the
    * native signal.
    */
  val ShortDocWords = 5

  /** 0-based index of the doc's labeled language in [[Langs]] — a
    * CASE chain (not array_position: return-type/null conventions
    * differ across engines). An out-of-set label falls back to 'en'
    * (index 1); both engines apply the same fallback, so oracles
    * stay bit-exact even if the label domain ever grows.
    */
  private def langIdx(lang: Column): Column =
    Langs.zipWithIndex.filter(_._1 != "en")
      .foldLeft(lit(1): Column) { case (acc, (l, i)) =>
        when(lang === l, i).otherwise(acc)
      } // 'en' is the ELSE arm; de/es/fr/zh matched explicitly

  /** The deterministic multilingual slice: one synthetic doc per
    * corpus doc, in its LABELED language — text = 12 vocabulary words
    * selected by md5prefix64(doc_id:pos) mod 24. Scales with SF (one
    * row per corpus doc) and replays exactly in SQL.
    */
  def synthDocs(docs: DataFrame): DataFrame = {
    val vocabLit = array(Langs.map(l => array(Vocabs(l).map(lit): _*)): _*)
    val li = langIdx(col("lang")).cast("int")
    val text = concat_ws(" ",
      transform(sequence(lit(0), lit(WordsPerDoc - 1)), p =>
        element_at(element_at(vocabLit, li + 1),
          (HashFunctions.md5prefix64(
            concat(col("doc_id").cast("string"), lit(":"), p.cast("string")))
            % VocabSize).cast("int") + 1)))
    docs.select(col("doc_id"), col("lang"), text.as("text"))
  }

  /** The synthetic slice with CODE-SWITCHING contamination in two
    * tiers — the harder population the confusion instrument (h20b)
    * measures: every 4th doc mixes in words from the NEXT language
    * in [[Langs]] order — LIGHT tier (doc_id ≡ 4 mod 8): 12 dominant
    * + 4 contaminant; HEAVY tier (doc_id ≡ 0 mod 8): 6 dominant + 10
    * contaminant. The true label stays the DOMINANT-tier language in
    * both cases — heavy docs are contaminant-majority, so a correct
    * char-ngram classifier SHOULD land them on the contaminant
    * language, and the off-diagonal mass the report shows there is
    * the honest picture of where code-switched text goes. Same
    * deterministic word selection, so both engines rebuild it
    * exactly.
    */
  def synthDocsMixed(docs: DataFrame): DataFrame = {
    val vocabLit = array(Langs.map(l => array(Vocabs(l).map(lit): _*)): _*)
    val li = langIdx(col("lang")).cast("int")
    val heavy = pmod(col("doc_id"), lit(8)) === 0
    val light = pmod(col("doc_id"), lit(4)) === 0 && !heavy
    val nWords = when(heavy || light, WordsPerDoc + 4).otherwise(WordsPerDoc)
    val switchAt = when(heavy, 6).when(light, WordsPerDoc).otherwise(999)
    val text = concat_ws(" ",
      transform(sequence(lit(0), nWords - 1), p => {
        val vi = when(p < switchAt, li)
          .otherwise(pmod(li + 1, lit(Langs.length))).cast("int")
        element_at(element_at(vocabLit, vi + 1),
          (HashFunctions.md5prefix64(
            concat(col("doc_id").cast("string"), lit(":"), p.cast("string")))
            % VocabSize).cast("int") + 1)
      }))
    docs.select(col("doc_id"), col("lang"), text.as("text"))
  }

  /** H20c — the CONFUSABLE evaluation slice (r11 verdict #1: the
    * clean slice is vocabulary-separable BY CONSTRUCTION, so h20's
    * 100% held-out accuracy proves the pipeline, not discrimination;
    * this slice is built so accuracy is a REAL operating number).
    * Three controlled confusion sources, all deterministic:
    *
    *  - SHARED LOANWORDS at `overlapPpm`: position p draws from
    *    [[LoanWords]] (common to all languages) when
    *    md5prefix64("ov:" doc:p) mod 1e6 < overlapPpm — these words
    *    train into EVERY class, so they dilute instead of separate
    *    (Wenzek et al. 2020 §3.2's hard case);
    *  - BORROWED FUNCTION WORDS at overlapPpm/2: the next band of the
    *    same hash draws from the NEXT language's vocabulary —
    *    genuinely adversarial cross-language mass;
    *  - a SHORT-DOC tier (doc_id ≡ 0 mod 3: [[ShortDocWords]] words
    *    instead of 12) — few grams, so a couple of non-native words
    *    can flip the argmax.
    *
    * The word-index selector is the clean slice's
    * (md5prefix64(doc:p) mod 24 — ONE spelling), and the whole
    * construction replays in SQL ([[sqlSynthConfCte]]), so
    * train→classify→report oracles stay bit-exact while the reported
    * accuracy is genuinely sub-100% and degrades with overlapPpm.
    */
  def synthDocsConfusable(docs: DataFrame, overlapPpm: Int): DataFrame = {
    val vocabLit = array(Langs.map(l => array(Vocabs(l).map(lit): _*)): _*)
    val loanLit = array(LoanWords.map(lit): _*)
    val borrowPpm = overlapPpm / 2
    val li = langIdx(col("lang")).cast("int")
    val nWords = when(pmod(col("doc_id"), lit(3)) === 0, ShortDocWords)
      .otherwise(WordsPerDoc)
    val text = concat_ws(" ",
      transform(sequence(lit(0), nWords - 1), p => {
        val r = HashFunctions.md5prefix64(
          concat(lit("ov:"), col("doc_id").cast("string"), lit(":"),
            p.cast("string"))) % 1000000L
        val wi = (HashFunctions.md5prefix64(
          concat(col("doc_id").cast("string"), lit(":"), p.cast("string")))
          % VocabSize).cast("int")
        when(r < overlapPpm, element_at(loanLit, wi + 1))
          .when(r < overlapPpm + borrowPpm,
            element_at(element_at(vocabLit,
              pmod(li + 1, lit(Langs.length)).cast("int") + 1), wi + 1))
          .otherwise(element_at(element_at(vocabLit, li + 1), wi + 1))
      }))
    docs.select(col("doc_id"), col("lang"), text.as("text"))
  }

  /** DuckDB literal for the loanword list. */
  def sqlLoanList: String =
    LoanWords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** DuckDB CTE for [[synthDocsConfusable]] at `overlapPpm`, named
    * `cte(doc_id, lang, text)` so two rates coexist in one query.
    */
  def sqlSynthConfCte(overlapPpm: Int, cte: String): String = {
    val borrowPpm = overlapPpm / 2
    val wi = s"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)), 1, 15))::BIGINT % $VocabSize AS INT)"
    val r = s"('0x' || substr(md5('ov:' || CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)), 1, 15))::BIGINT % 1000000"
    s"""$cte AS (
       |  SELECT doc_id, lang,
       |    array_to_string(list_transform(
       |      range(0, CASE WHEN doc_id % 3 = 0 THEN $ShortDocWords ELSE $WordsPerDoc END), p ->
       |      CASE
       |        WHEN $r < $overlapPpm THEN ($sqlLoanList)[$wi + 1]
       |        WHEN $r < ${overlapPpm + borrowPpm}
       |          THEN ($sqlVocabList)[(${sqlLangIdx("lang")} + 1) % ${Langs.length} + 1][$wi + 1]
       |        ELSE ($sqlVocabList)[${sqlLangIdx("lang")} + 1][$wi + 1]
       |      END),
       |      ' ') AS text
       |  FROM documents)""".stripMargin
  }

  /** SQL/Column spelling of the contamination tier label. */
  def tierCase(id: String): String =
    s"CASE WHEN $id % 8 = 0 THEN 'heavy' WHEN $id % 4 = 0 THEN 'light' ELSE 'clean' END"

  /** DuckDB CTE for [[synthDocsMixed]]: `mixed(doc_id, lang, text)`. */
  def sqlSynthMixedCte: String =
    s"""mixed AS (
       |  SELECT doc_id, lang,
       |    array_to_string(list_transform(
       |      range(0, CASE WHEN doc_id % 4 = 0 THEN ${WordsPerDoc + 4} ELSE $WordsPerDoc END), p ->
       |      ($sqlVocabList)[CASE WHEN p < (CASE WHEN doc_id % 8 = 0 THEN 6 WHEN doc_id % 4 = 0 THEN $WordsPerDoc ELSE 999 END)
       |                           THEN ${sqlLangIdx("lang")}
       |                           ELSE (${sqlLangIdx("lang")} + 1) % ${Langs.length} END + 1]
       |        [CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)), 1, 15))::BIGINT % $VocabSize AS INT) + 1]),
       |      ' ') AS text
       |  FROM documents)""".stripMargin

  /** Composed bucket-array spelling (the oracle's shape, and the
    * kernel-equivalence reference): char n-gram buckets of an ALREADY
    * LOWERCASED, MATERIALIZED text column (an inlined lower() would
    * re-evaluate per gram position — the documented O(n²) trap).
    */
  def charGramBuckets(lowered: Column, n: Int = GramN, k: Int = Buckets): Column =
    transform(
      sequence(lit(1), greatest(length(lowered) - (n - 1), lit(1))),
      i => HashFunctions.md5prefix64(lowered.substr(i, lit(n))) % k)

  /** Train the L·k weight table: (lang, b, c, weight_u), one row per
    * (language, bucket) — buckets unseen for a language still get
    * their smoothing-only weight.
    */
  def trainLangWeights(docs: DataFrame, textCol: String, langCol: String,
                       langs: Seq[String] = Langs, n: Int = GramN,
                       k: Int = Buckets): DataFrame = {
    val spark = docs.sparkSession
    val g = docs
      .withColumn("__lt", lower(col(textCol)))
      .select(col(langCol).as("lang"),
        explode(charGramBuckets(col("__lt"), n, k)).as("b"))
    val counts = g.groupBy("lang", "b").agg(count(lit(1)).as("c"))
    val langsDf = spark.createDataFrame(langs.map(l => Tuple1(l))).toDF("lang")
    val grid = langsDf.crossJoin(spark.range(k).select(col("id").as("b")))
    val totals = counts.groupBy("lang").agg(sum("c").as("t"))
    grid.join(counts, Seq("lang", "b"), "left").na.fill(0L, Seq("c"))
      .join(broadcast(totals), Seq("lang"), "left").na.fill(0L, Seq("t"))
      .withColumn("weight_u", floor(
        log((col("c") + 1).cast("double") / (col("t") + k).cast("double"))
          * lit(1e6) + lit(0.5)).cast("long"))
      .select("lang", "b", "c", "weight_u")
  }

  /** Driver-side L×k weight matrix in `langs` order (the
    * codebook-collect contract: L·k longs by construction).
    */
  def collectLangWeights(weights: DataFrame, langs: Seq[String] = Langs,
                         k: Int = Buckets): Seq[Seq[Long]] = {
    val m = weights.select("lang", "b", "weight_u").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    require(m.size == langs.length * k,
      s"expected ${langs.length * k} weights, got ${m.size}")
    langs.map(l => (0 until k).map(b => m((l, b.toLong))))
  }

  /** Deterministic argmax with `langs`-order preference on ties (the
    * h3 langPredict convention): branch i fires iff its score >= all
    * LATER scores — the winner is the earliest index attaining the
    * max, over exact BIGINT scores, so the CASE chain replays in SQL.
    */
  def predictLang(scores: Seq[Column], langs: Seq[String] = Langs): Column =
    langs.indices.init.foldRight(lit(langs.last): Column) { (i, rest) =>
      when(langs.indices.drop(i + 1)
        .map(j => scores(i) >= scores(j)).reduce(_ && _), langs(i))
        .otherwise(rest)
    }

  /** Score + classify every doc through the K29 compiled kernel —
    * one pass per doc, all L scores, zero joins (weights are inlined
    * literals; a model swap changes L·k literals, not the plan).
    * `carry` passes input columns through (e.g. the truth label) —
    * as a projection, NOT a re-attach join: at corpus scale a
    * classify-then-self-join on the id would shuffle the corpus
    * twice for what is row-local information.
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               weights: Seq[Seq[Long]], langs: Seq[String] = Langs,
               n: Int = GramN, carry: Seq[String] = Nil): DataFrame = {
    val scored = docs.withColumn("__ls",
      HashFunctions.langGramScores(col(textCol), weights, n))
    val scoreCols = langs.indices.map(i =>
      element_at(col("__ls.scores"), i + 1))
    scored.select(
      Seq(col(idCol)) ++ carry.map(col) ++
        Seq(col("__ls.n_grams").as("n_grams")) ++
        langs.indices.map(i => scoreCols(i).as(s"s_${langs(i)}")) :+
        predictLang(scoreCols, langs).as("pred_lang"): _*)
  }

  // ---- SQL rendering (the ONE-source contract: both engines build
  // the slice and the model from the Scala tables above) ----

  /** DuckDB literal for the language list. */
  def sqlLangList: String = Langs.map(l => s"'$l'").mkString("[", ", ", "]")

  /** DuckDB literal for the nested vocab list, Langs order. */
  def sqlVocabList: String =
    Langs.map(l => Vocabs(l).map(w => s"'$w'").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")

  /** DuckDB spelling of [[langIdx]] (0-based, 'en' fallback). */
  def sqlLangIdx(lang: String): String =
    "CASE " + Langs.zipWithIndex.filter(_._1 != "en")
      .map { case (l, i) => s"WHEN $lang = '$l' THEN $i" }
      .mkString(" ") + " ELSE 1 END"

  /** DuckDB CTE rebuilding the synthetic slice: `synth(doc_id, lang,
    * text)`. Kept as a fragment so both h20 oracles share it verbatim.
    */
  def sqlSynthCte: String =
    s"""synth AS (
       |  SELECT doc_id, lang,
       |    array_to_string(list_transform(range(0, $WordsPerDoc), p ->
       |      ($sqlVocabList)[${sqlLangIdx("lang")} + 1]
       |        [CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)), 1, 15))::BIGINT % $VocabSize AS INT) + 1]),
       |      ' ') AS text
       |  FROM documents)""".stripMargin

  /** DuckDB CTEs training the model from a `train(lang, text)` CTE in
    * scope: yields `lam(lang, b, c, weight_u)`.
    */
  def sqlTrainCtes: String = sqlTrainCtesNamed("", "train")

  /** [[sqlTrainCtes]] with every emitted CTE name prefixed and the
    * input CTE name free, so several independently-trained models
    * (h20c's per-overlap-rate models) coexist in ONE query: yields
    * `${prefix}lam(lang, b, c, weight_u)` from `$train(lang, text)`.
    */
  def sqlTrainCtesNamed(prefix: String, train: String): String =
    s"""${prefix}g0 AS (
       |  SELECT lang, unnest(list_transform(range(1, greatest(length(text) - ${GramN - 1}, 1) + 1),
       |    i -> substr(lower(text), CAST(i AS INT), $GramN))) AS gr
       |  FROM $train),
       |${prefix}g AS (SELECT lang, ('0x' || substr(md5(gr), 1, 15))::BIGINT % $Buckets AS b FROM ${prefix}g0),
       |${prefix}cnt AS (SELECT lang, b, CAST(COUNT(*) AS BIGINT) AS c FROM ${prefix}g GROUP BY lang, b),
       |${prefix}grid AS (
       |  SELECT l.lang, r.b FROM (SELECT unnest($sqlLangList) AS lang) l
       |  CROSS JOIN (SELECT unnest(range(0, $Buckets)) AS b) r),
       |${prefix}tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t FROM ${prefix}cnt GROUP BY lang),
       |${prefix}lam AS (
       |  SELECT ${prefix}grid.lang, ${prefix}grid.b, COALESCE(${prefix}cnt.c, 0) AS c,
       |    CAST(floor(ln(CAST(COALESCE(${prefix}cnt.c, 0) + 1 AS DOUBLE)
       |      / CAST(COALESCE(${prefix}tot.t, 0) + $Buckets AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS weight_u
       |  FROM ${prefix}grid LEFT JOIN ${prefix}cnt ON ${prefix}grid.lang = ${prefix}cnt.lang AND ${prefix}grid.b = ${prefix}cnt.b
       |  LEFT JOIN ${prefix}tot ON ${prefix}grid.lang = ${prefix}tot.lang)""".stripMargin

  /** DuckDB pivot column list: s_<lang> per language, exact BIGINTs. */
  def sqlPivs: String =
    Langs.map(l =>
      s"CAST(SUM(CASE WHEN ln = '$l' THEN s ELSE 0 END) AS BIGINT) AS s_$l")
      .mkString(",\n            ")

  /** DuckDB CTEs scoring an `<input>(doc_id, text)` CTE through the
    * trained `lam` model: yields `piv(doc_id, n_grams, s_<lang>…)`.
    * ONE spelling shared by every h20-family oracle (a hand-copied
    * gram clamp or bucket cast in one of them would silently diverge
    * from the kernel).
    */
  def sqlScoreCtes(input: String): String =
    sqlScoreCtesNamed(input, "lam", "piv")

  /** [[sqlScoreCtes]] with the model CTE and output CTE names free,
    * so several (input, model) scoring passes coexist in one query:
    * yields `$piv(doc_id, n_grams, s_<lang>…)` scoring `$input`
    * through `$lam`.
    */
  def sqlScoreCtesNamed(input: String, lam: String, piv: String): String =
    s"""${input}g0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(length(text) - ${GramN - 1}, 1) + 1),
       |    i -> substr(lower(text), CAST(i AS INT), $GramN))) AS gr
       |  FROM $input),
       |${input}g AS (SELECT doc_id, ('0x' || substr(md5(gr), 1, 15))::BIGINT % $Buckets AS b FROM ${input}g0),
       |${input}sc AS (
       |  SELECT doc_id, $lam.lang AS ln, CAST(COUNT(*) AS BIGINT) AS ng,
       |    CAST(SUM(weight_u) AS BIGINT) AS s
       |  FROM ${input}g JOIN $lam ON ${input}g.b = $lam.b GROUP BY doc_id, $lam.lang),
       |$piv AS (
       |  SELECT doc_id, CAST(MAX(ng) AS BIGINT) AS n_grams,
       |    $sqlPivs
       |  FROM ${input}sc GROUP BY doc_id)""".stripMargin

  /** DuckDB spelling of the argmax CASE chain over score columns
    * named s_<lang> in `langs` order.
    */
  def sqlPredict(langs: Seq[String] = Langs): String =
    "CASE " + langs.indices.init.map { i =>
      val conds = langs.indices.drop(i + 1)
        .map(j => s"s_${langs(i)} >= s_${langs(j)}").mkString(" AND ")
      s"WHEN $conds THEN '${langs(i)}'"
    }.mkString(" ") + s" ELSE '${langs.last}' END"
}
