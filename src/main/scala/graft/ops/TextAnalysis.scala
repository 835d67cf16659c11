package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-training-data pipelines: language
  * ID, quality scoring, token counting, document fingerprinting
  * (SURVEY §2 C8–C11).
  *
  * Every function is a pure `functions._` / higher-order-function
  * expression — codegen'd, no UDFs — and each has a byte-identical
  * DuckDB formulation so the oracle can hash-check outputs. Per-row
  * work only: these scale embarrassingly (no shuffle at all until a
  * caller aggregates).
  */
object TextAnalysis {

  /** Whitespace-collapsed, trimmed, lowercased canonical text. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  val stopwordsEn = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString("(", ",", ")")

  /** Count of tokens matching a stopword list (expression fragment
    * shared with the oracle SQL).
    */
  def stopwordCount(normCol: String, words: Seq[String]): Column =
    expr(s"size(filter(split($normCol, ' '), t -> t in ${inList(words)}))")

  /** Token counts: whitespace tokens + a BPE-ish segmentation (letter
    * runs / digit runs / single punctuation marks — the shape a byte
    * pair encoder's pre-tokenizer produces).
    */
  def tokenCounts(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), normalize(col(textCol)).as("norm"))
      .select(col(idCol),
        size(split(col("norm"), " ")).as("ws_tokens"),
        regexp_count(col("norm"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("bpe_tokens"))

  /** Quality signals: length, punctuation/digit/whitespace ratios,
    * stopword ratio, mean token length — the standard cheap filters a
    * corpus pipeline runs before expensive dedup.
    */
  def qualityScores(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol), t.as("text"), normalize(t).as("norm"))
      .select(col(idCol),
        length(col("text")).as("n_chars"),
        size(split(col("norm"), " ")).as("n_tokens"),
        (length(regexp_replace(col("text"), "[a-z0-9A-Z ]", "")).cast("double") /
          length(col("text"))).as("punct_ratio"),
        (length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
          length(col("text"))).as("digit_ratio"),
        (stopwordCount("norm", stopwordsEn).cast("double") /
          size(split(col("norm"), " "))).as("stopword_ratio"),
        (length(regexp_replace(col("norm"), " ", "")).cast("double") /
          size(split(col("norm"), " "))).as("mean_token_len"))
  }

  /** Integer readability proxies — the grade-level axis of quality
    * filtering that [[qualityScores]]' ratio features don't carry (a
    * doc can have perfect punctuation ratios and still be either
    * see-spot-run or impenetrable legalese; curriculum ordering and
    * audience-targeted corpus cuts both want the grade signal).
    *
    * Flesch–Kincaid grade and Flesch reading ease over PROXY counts,
    * all-integer: words = whitespace tokens, sentences = terminal-
    * punctuation runs `[.!?]+` (clamped ≥ 1 so headline-style docs
    * divide safely), syllables ≈ vowel GROUPS `[aeiouy]+` (the classic
    * cheap estimator: one vowel cluster per syllable nucleus —
    * English-calibrated like the formulas themselves, documented
    * proxy not phonology). Published coefficients scaled to
    * milli-units with every division a matched truncation
    * (`div` ≡ `//` toward zero):
    * `fk_milli = (390·w) div s + (11800·y) div w − 15590`,
    * `fre_milli = 206835 − (1015·w) div s − (84600·y) div w`.
    * Patterns are RE2-safe; the whole thing is per-row scan work with
    * zero shuffles — 100 TB cost is the read itself.
    */
  def readability(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), normalize(col(textCol)).as("norm"))
      .select(col(idCol),
        size(split(col("norm"), " ")).cast("long").as("n_words"),
        greatest(regexp_count(col("norm"), lit("[.!?]+")), lit(1))
          .cast("long").as("n_sentences"),
        regexp_count(col("norm"), lit("[aeiouy]+")).cast("long")
          .as("n_syllables"))
      .select(col(idCol), col("n_words"), col("n_sentences"), col("n_syllables"),
        expr("(390L * n_words) div n_sentences + (11800L * n_syllables) div n_words - 15590L")
          .as("fk_grade_milli"),
        expr("206835L - (1015L * n_words) div n_sentences - (84600L * n_syllables) div n_words")
          .as("fre_milli"))

  /** Stopword-profile language ID over a fixed 5-language family.
    * Deterministic argmax with a fixed priority order on ties (the
    * n-gram-profile classic, reduced to its portable core).
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est", "que"),
    "es" -> Seq("el", "los", "y", "las", "es", "un", "una", "por"),
    "zh" -> Seq("的", "是", "不", "我", "在", "了", "有", "这"))

  def langId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = df.select(col(idCol), normalize(col(textCol)).as("norm"))
    val scored = langStopwords.foldLeft(base) { case (acc, (lang, words)) =>
      acc.withColumn(s"s_$lang", stopwordCount("norm", words))
    }
    val langs = langStopwords.map(_._1)
    val best = langs.map(l => s"s_$l").mkString("greatest(", ",", ")")
    val pick = langs.foldRight(lit("und"): Column) { case (l, rest) =>
      when(col(s"s_$l") === expr(best), lit(l)).otherwise(rest)
    }
    scored.select(col(idCol) +: langs.map(l => col(s"s_$l")) :+ pick.as("lang_pred"): _*)
  }

  /** PII/noise scrubbing — the redaction pass a training corpus runs
    * before tokenization: emails → `<EMAIL>`, URLs → `<URL>`, long
    * digit runs → `<NUM>`, plus per-doc replacement counts. Patterns
    * are RE2-safe (no backrefs/lookaround) so Spark's Java regex and
    * the oracle engine's RE2 behave identically.
    */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val urlRe = "https?://[^ ]+"
  val numRe = "[0-9]{5,}"

  def scrub(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      regexp_replace(regexp_replace(regexp_replace(t,
        urlRe, "<URL>"), emailRe, "<EMAIL>"), numRe, "<NUM>").as("scrubbed"),
      regexp_count(t, lit(emailRe)).as("n_email"),
      regexp_count(t, lit(urlRe)).as("n_url"))
  }

  /** RE2-safe detectors for [[piiProfile]] — octet runs for IPv4
    * (word-bounded so a version string "1.2.3.4.5" still matches once,
    * deterministically, on both engines) and the NANP-ish dashed/
    * spaced phone shape. No backrefs/lookaround.
    */
  val ipRe = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val phoneRe = "\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"

  /** Corpus PII audit — the REPORT side of [[scrub]]: per-source
    * detection rates for emails, IPv4s, phone numbers and long id-like
    * digit runs, the numbers a privacy review reads before deciding
    * what the redaction pass must cover (scrub transforms text;
    * this measures exposure). Detector categories can overlap on
    * adversarial text (a long id inside an email local part counts in
    * both) — each column answers its own "how many would THIS detector
    * fire on" question, identically on both engines.
    *
    * Shape: four `regexp_count`s fused into the scan (per-row, no UDF,
    * no shuffle) and ONE partial-aggregatable groupBy to |sources|
    * rows. `hits_per_mchar` is integer micro-rate arithmetic
    * (hits·10⁶ div chars) — no cross-engine float division in the
    * contract.
    */
  def piiProfile(df: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val t = col(textCol)
    val perDoc = df.select(col(srcCol).as("source"),
      length(t).cast("long").as("n_chars"),
      regexp_count(t, lit(emailRe)).cast("long").as("e"),
      regexp_count(t, lit(ipRe)).cast("long").as("i"),
      regexp_count(t, lit(phoneRe)).cast("long").as("p"),
      regexp_count(t, lit(numRe)).cast("long").as("d"))
    perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("e") + col("i") + col("p") + col("d") > 0, 1L)
        .otherwise(0L)).as("n_docs_pii"),
      sum(col("e")).as("n_emails"),
      sum(col("i")).as("n_ips"),
      sum(col("p")).as("n_phones"),
      sum(col("d")).as("n_idnums"),
      sum(col("e") + col("i") + col("p") + col("d")).as("__hits"),
      sum(col("n_chars")).as("__chars"))
      // integer micro-rate: `div` truncates identically on both
      // engines (the q_robust_scale portability note) — never a
      // double division in a hashed contract
      .select(col("source"), col("n_docs"), col("n_docs_pii"),
        col("n_emails"), col("n_ips"), col("n_phones"), col("n_idnums"),
        expr("(__hits * 1000000L) div __chars").as("hits_per_mchar"))
  }

  /** Code-vs-prose detection — the routing axis quality filters don't
    * carry: code in a text corpus changes the right tokenizer, the
    * dedup granularity (line-level beats shingles on code) and the
    * mixture weights, so a pipeline wants the split BEFORE those
    * stages. Heuristic, integer-exact, per-row:
    *  - `n_syms`: structural punctuation runs `[{}();=<>\[\]]`
    *    (brace-language surface; RE2-safe),
    *  - `n_kw`: exact-token hits on a fixed cross-language keyword
    *    list (the stopwordCount machinery pointed at code),
    *  - `n_indent`: lines opening with 4+ spaces or a tab — the
    *    one signal that needs the RAW text (normalize() collapses it),
    *    via multiline `(?m)^(    |\t)`,
    *  - `sym_ppm` = n_syms·10⁶ div chars, `kw_ppm` = n_kw·10⁶ div
    *    words (matched truncation),
    *  - `is_code`: sym_ppm > 40 000 ∧ (n_kw ≥ 2 ∨ n_indent ≥ 2) —
    *    symbol density alone misfires on math/tables; requiring a
    *    corroborating signal is the C4-lineage conservative cut.
    * Zero shuffles; thresholds are the documented contract, tune per
    * corpus.
    */
  val codeKeywords = Seq("def", "return", "import", "var", "const",
    "function", "class", "void", "int", "if", "else", "for", "while")

  def codeDetect(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol), t.as("text"), normalize(t).as("norm"))
      .select(col(idCol),
        length(col("text")).cast("long").as("n_chars"),
        size(split(col("norm"), " ")).cast("long").as("n_words"),
        regexp_count(col("text"), lit("[{}();=<>\\[\\]]+")).cast("long")
          .as("n_syms"),
        stopwordCount("norm", codeKeywords).cast("long").as("n_kw"),
        regexp_count(col("text"), lit("(?m)^(    |\\t)")).cast("long")
          .as("n_indent"))
      .select(col(idCol), col("n_chars"), col("n_words"), col("n_syms"),
        col("n_kw"), col("n_indent"),
        expr("(n_syms * 1000000L) div greatest(n_chars, 1L)").as("sym_ppm"),
        expr("(n_kw * 1000000L) div greatest(n_words, 1L)").as("kw_ppm"))
      .withColumn("is_code",
        (col("sym_ppm") > 40000L &&
          (col("n_kw") >= 2L || col("n_indent") >= 2L)).cast("int"))
  }

  /** Regex-level HTML → text extraction — the step between
    * `Warc.responses` (raw HTTP bodies) and every text operator in
    * this file: strip script/style blocks and comments, drop the
    * remaining tags, decode the six entities that dominate real
    * markup, collapse whitespace; the `<title>` rides along as its
    * own column. This is the CURATION-grade extractor (CCNet/C4
    * lineage — regex strip, not a DOM): per-row, zero shuffles, runs
    * at scan speed, and every pattern is RE2-safe with explicit `g`
    * semantics on the oracle side, so extraction itself hash-gates
    * cross-engine. A browser-grade DOM walk (malformed-tag recovery,
    * CSS visibility) is a deliberate non-goal — at corpus scale the
    * regex pass is what the published pipelines run.
    */
  /** The extraction expression alone — [[htmlExtract]]'s text column
    * as a per-row Column, for callers that rewrite markup in place
    * (the Pipeline `html_extract` stage: metadata columns ride along,
    * zero exchanges added).
    */
  def htmlTextExpr(h: Column): Column = {
    // the whole <head> block leaves the text flow (title/meta/style
    // are chrome, not content — the title is extracted separately
    // from the RAW markup in htmlExtract); then script/style for
    // in-body blocks, comments, and finally every remaining tag
    val stripped = regexp_replace(regexp_replace(regexp_replace(regexp_replace(h,
      "(?is)<head(\\s[^>]*)?>.*?</head>", " "), // (\s…)? so <header> can't match
      "(?is)<(script|style)(\\s[^>]*)?>.*?</(script|style)>", " "),
      "(?s)<!--.*?-->", " "),
      "<[^>]+>", " ")
    // entity decode: specific entities first, the ampersand LAST so
    // double-escaped text (&amp;lt;) decodes one level per pass like
    // every published extractor. The entity strings carry no regex
    // metacharacters, so regexp_replace is a literal replace-all on
    // both engines (Spark replaces all by default, the oracle passes
    // 'g').
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(stripped) { case (c, (from, to)) => regexp_replace(c, from, to) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  def htmlExtract(df: DataFrame, htmlCol: String, idCol: String): DataFrame = {
    val txt = htmlTextExpr(col(htmlCol))
    df.select(col(idCol),
      regexp_extract(col(htmlCol), "(?is)<title[^>]*>(.*?)</title>", 1).as("title"),
      txt.as("text"),
      length(txt).cast("long").as("n_chars"))
  }

  /** Outlink/host extraction from raw HTML — the link-structure feed
    * [[htmlExtract]] throws away and the [[graft.ops.Graph]] family
    * consumes: every `<a ... href="...">` target, rolled up per HOST
    * (the crawl frontier's unit of politeness, blocklists and
    * PageRank nodes). Absolute http(s) hrefs key by their authority
    * component; anything else (relative paths, mailto:, fragments)
    * reports under the `(relative)` marker — visible, not vanished.
    *
    * RE2-safe patterns (the oracle engine has no lookarounds), double
    * quotes only (the dominant crawl form; single-quoted attrs are a
    * documented non-goal shared with the regex-level extractor
    * class). Scale shape: per-row regexp_extract_all + one explode
    * (zero shuffles), a (host, doc) partial-agg dedup, then the
    * |hosts|-row rollup carrying link and distinct-doc counts.
    */
  def outlinks(df: DataFrame, htmlCol: String, idCol: String): DataFrame = {
    val links = df.select(col(idCol).as("doc"),
      explode(expr(
        s"""regexp_extract_all(`$htmlCol`, '<a[^>]*href="([^"]*)"', 1)"""))
        .as("href"))
      .withColumn("host",
        when(col("href").rlike("^https?://"),
          regexp_extract(col("href"), "^https?://([^/?#]+)", 1))
          .otherwise(lit("(relative)")))
    links.groupBy(col("host"), col("doc"))
      .agg(count(lit(1)).as("l"))
      .groupBy("host")
      .agg(sum(col("l")).as("n_links"), count(lit(1)).as("n_docs"))
  }

  /** Markdown → plain text as a per-row Column — [[htmlTextExpr]]'s
    * sibling for the OTHER markup half of a crawl (READMEs, forum
    * posts, doc sites ship markdown; quality scoring over raw
    * markdown counts ``` and ### as words). Ordered rewrite chain,
    * all RE2-safe (no lookarounds/backrefs — the oracle engine doesn't
    * have them): fenced code blocks leave the prose flow entirely
    * (code is [[codeDetect]]'s axis, not prose mass), inline code
    * keeps its content, images collapse to alt text, links to anchor
    * text, then the line-anchored chrome (ATX headers, setext/hr
    * lines, blockquote markers, list bullets) and `**`/`__`/`~~`/`*`
    * emphasis markers strip. Single underscores stay — snake_case
    * identifiers outnumber `_emphasis_` in crawled corpora and RE2
    * offers no word-boundary lookaround to split the difference
    * (documented non-goal).
    */
  def markdownTextExpr(m: Column): Column = {
    val stripped = Seq(
      "(?s)```.*?```" -> " ",                       // fenced code
      "`([^`]*)`" -> "$1",                          // inline code
      "!\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1",        // images → alt
      "\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1",         // links → anchor
      "(?m)^#{1,6}[ \\t]*" -> "",                   // ATX headers
      "(?m)^(=+|-{2,}|\\*{3,})[ \\t]*$" -> " ",     // setext / hr
      "(?m)^[ \\t]*>[ \\t]?" -> "",                 // blockquote
      "(?m)^[ \\t]*[-*+][ \\t]+" -> "",             // bullets
      "(?m)^[ \\t]*[0-9]+\\.[ \\t]+" -> "",         // ordered lists
      "\\*\\*|__|~~|\\*" -> ""                      // emphasis marks
    ).foldLeft(m) { case (c, (re, to)) => regexp_replace(c, re, to) }
    trim(regexp_replace(stripped, "\\s+", " "))
  }

  /** Markdown extraction report: extracted prose, its length, and the
    * structural counts a routing stage reads (fence/link/image mass
    * distinguishes a README from prose that merely mentions code).
    * Counts are over the RAW markdown, before any stripping.
    */
  def markdownExtract(df: DataFrame, mdCol: String,
                      idCol: String): DataFrame = {
    val txt = markdownTextExpr(col(mdCol))
    df.select(col(idCol),
      txt.as("text"),
      length(txt).cast("long").as("n_chars"),
      regexp_count(col(mdCol), lit("(?s)```.*?```")).cast("long")
        .as("n_code_blocks"),
      regexp_count(col(mdCol), lit("\\]\\(")).cast("long")
        .as("n_links"),
      regexp_count(col(mdCol), lit("!\\[")).cast("long")
        .as("n_images"))
  }

  /** Per-group line-frequency boilerplate removal (CCNet/RefinedWeb
    * lineage) — the STRUCTURAL cleaning axis the dedup family doesn't
    * carry: [[graft.ops.Dedup.dedupLines]] strikes lines duplicated
    * more than a GLOBAL count, but boilerplate is a RATIO-per-origin
    * property — a nav line in 90% of one domain's pages is chrome
    * even if globally rare, while a famous quote in 100 documents of
    * a million-doc corpus is content. Lines (normalized, nonblank)
    * whose doc-frequency within their `groupCol` (domain/source)
    * reaches `ratioPpm` of that group's doc count AND ≥ `minDocs`
    * docs are struck from every doc of the group; surviving lines
    * reassemble in order. Every doc rows out (a doc that was ALL
    * boilerplate reports empty text with its drop count — the
    * visible-not-vanished rule).
    *
    * The threshold compare is exact integer cross-multiplication
    * (df·10⁶ ≥ ratioPpm·n_docs). Scale shape: one posexplode,
    * line-df by (group, line-hash) partial agg after a per-doc
    * distinct, group doc totals broadcast (|groups| rows), ONE
    * marking join on (group, hash), per-doc reassembly via the
    * dedupLines sort_array(collect_list) pattern — bounded by doc
    * size. The exploded lines persist so corpus text explodes once.
    */
  def boilerplate(df: DataFrame, textCol: String, idCol: String,
                  groupCol: String, ratioPpm: Long = 500000L,
                  minDocs: Long = 2L): DataFrame = {
    require(ratioPpm >= 1L && ratioPpm <= 1000000L && minDocs >= 1L,
      s"ratioPpm in [1,1e6], minDocs >= 1")
    val lines = df
      .select(col(idCol), col(groupCol).as("grp"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .filter(length(trim(col("line"))) > 0)
      .withColumn("lh", md5(normalize(col("line"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docCounts = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("nd"))
    val lineDf = lines.select(col("grp"), col("lh"), col(idCol)).distinct()
      .groupBy("grp", "lh").agg(count(lit(1)).as("df"))
    val flagged = lineDf.join(broadcast(docCounts), Seq("grp"))
      .filter(col("df") >= minDocs &&
        col("df") * 1000000L >= lit(ratioPpm) * col("nd"))
      .select(col("grp"), col("lh"), lit(1L).as("bp"))
    val marked = lines.join(flagged, Seq("grp", "lh"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            sort_array(collect_list(when(col("bp").isNull,
              struct(col("line_no"), col("line"))))),
            s => s.getField("line")),
          "\n").as("clean_text"),
        sum(when(col("bp").isNull, 1L).otherwise(0L)).as("n_lines_kept"),
        sum(coalesce(col("bp"), lit(0L))).as("n_lines_dropped"))
    df.select(col(idCol), col(groupCol))
      .join(marked, Seq(idCol), "left")
      .select(col(idCol), col(groupCol),
        coalesce(col("clean_text"), lit("")).as("text"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("n_lines_dropped"), lit(0L)).as("n_lines_dropped"))
  }

  /** Corpus vocabulary by document frequency: for each token, the
    * number of documents containing it, top-k by (df desc, token asc).
    * Per-doc `array_distinct` before explode (no shuffle for the
    * distinct), partial-aggregated counts, and a TakeOrdered top-k —
    * the corpus-level statistic feeding stopword lists and tokenizer
    * vocabularies.
    */
  def vocabulary(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    df.select(explode(array_distinct(split(normalize(col(textCol)), " "))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("token").asc)
      .limit(k)

  /** Zipf-slope corpus-health fit: OLS slope of log-frequency against
    * log-rank over the token frequency table — natural language sits
    * near −1 (Zipf's law); a corpus drifting toward 0 is template/
    * boilerplate-flooded (flat head), one plunging far below −1 lost
    * its tail (over-aggressive df-pruning, truncated vocab). One
    * scalar per corpus, cheap to track per crawl snapshot next to
    * [[tokenDrift]].
    *
    * Exactness AND scale: a token-level rank window would be a global
    * single-partition sort of the vocab — but same-frequency tokens
    * all share y = ln(freq), so the OLS moments only need the SUM of
    * x = round(ln rank·10⁶) over each frequency group's rank RANGE,
    * never which token holds which rank. Ranks therefore derive
    * without any token-level ordering: per-frequency group sizes (one
    * partial agg), rank offsets from the bucketed rank walk (the
    * profile_histogram_eq discipline — freq range-bucketed into
    * ≤4097 buckets, per-bucket totals, broadcast triangular-join
    * offsets, cumulative window PARTITIONED by bucket; the distinct-
    * frequency axis is bounded by √(2·total tokens) which is ~7M
    * single-task rows at 100 TB, so even this soft bound never rides
    * one partition), then a two-level chunked explode of
    * the rank ranges (inner arrays ≤ 64 Ki, so no group materializes
    * an unbounded sequence) feeding one exact-decimal moment
    * aggregate. ln quantizes once (the C11q ulp precedent); the slope
    * is one deterministic double division rounded to 6. Only tokens
    * with freq ≥ `minCount` enter (the fit is about the body, and the
    * floor bounds the exploded row count by the corpus token count).
    */
  def zipfSlope(df: DataFrame, textCol: String, minCount: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val CH = 65536L
    val counts = df
      .select(explode(split(normalize(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
    val groups = counts.groupBy("freq").agg(count(lit(1)).as("g"))
    val range = groups.agg(min(col("freq")).as("lo"), max(col("freq")).as("hi"))
    val bucketed = groups.crossJoin(broadcast(range))
      .withColumn("bkt", expr("(freq - lo) div ((hi - lo) div 4096 + 1)"))
    val bcnt = bucketed.groupBy("bkt").agg(sum(col("g")).as("bc"))
    val boff = bcnt.as("a")
      .join(broadcast(bcnt.as("b")), col("b.bkt") > col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.bc")), lit(0L)).as("boff"))
    val wOff = Window.partitionBy(col("bkt")).orderBy(col("freq").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = bucketed.join(broadcast(boff), Seq("bkt"))
      .withColumn("off",
        col("boff") + coalesce(sum(col("g")).over(wOff), lit(0L)))
      .withColumn("c", explode(expr(s"sequence(0L, (g - 1) div $CH)")))
      .select(col("freq"), explode(expr(
        s"sequence(off + c * $CH + 1, off + least((c + 1) * $CH, g))"))
        .as("rank"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val q = ranks.select(
      round(log(col("rank").cast("double")) * 1e6).cast("long").as("x"),
      round(log(col("freq").cast("double")) * 1e6).cast("long").as("y"))
    q.agg(count(lit(1)).as("n_tokens"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x") * col("x"))).as("sxx"),
        sum(dec(col("x") * col("y"))).as("sxy"))
      .select(col("n_tokens"),
        when(dec(col("n_tokens")) * col("sxx") - col("sx") * col("sx") > 0,
          round((dec(col("n_tokens")) * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (dec(col("n_tokens")) * col("sxx") - col("sx") * col("sx"))
            .cast("double"), 6)).as("zipf_slope"))
  }

  /** Quality-band filter: keep documents whose score sits inside the
    * [pLo, pHi] percentile band OF THEIR OWN STRATUM (language/source)
    * — the standard trim that drops outliers per stratum instead of
    * letting one language's distribution set a global cutoff.
    *
    * Integer-exact output contract (round 9): the score is mean token
    * length in MICRO units — (chars · 10⁶) div words, pure integer
    * division — and the band edges are the LOWER exact quantiles of
    * that long (the score at 0-based rank floor(p·(n−1)) of the
    * stratum's ascending order, an actual sampled value). The round-8
    * form (interpolated `percentile` doubles compared under
    * round(·, 6)) is the fragility class that hash-FAILED
    * profile_embeddings on the driver: cross-build ulp drift in the
    * interpolation. A sampled long compared with long `>=` cannot
    * drift. The only float op left is floor(p·(n−1)) — ONE IEEE
    * multiply, identical on both engines.
    *
    * Scale shape: band edges come from a per-(stratum, score) count
    * aggregate (partial, |strata|·|distinct scores| rows) plus one
    * per-stratum ordered cumulative pass over those counts — never a
    * full-group sort buffer — and the |strata|-row band table
    * broadcasts back onto the scan; the big side never shuffles.
    */
  def qualityBand(df: DataFrame, textCol: String, idCol: String,
                  stratumCol: String, pLo: Double = 0.1,
                  pHi: Double = 0.9): DataFrame = {
    val n = normalize(col(textCol))
    // id travels under a reserved alias and leaves under the CALLER'S
    // idCol name — a custom idCol must survive the round-trip (the
    // pipeline runner joins the output back on idCol)
    val scored = df.select(col(idCol).as("__qb_id"),
        col(stratumCol).as("stratum"),
        (length(regexp_replace(n, " ", "")).cast("long") * 1000000L)
          .as("__chars_m"),
        size(split(n, " ")).cast("long").as("__nw"))
      .select(col("__qb_id"), col("stratum"),
        expr("__chars_m div __nw").as("score_micro"))
    val counts = scored.groupBy("stratum", "score_micro")
      .agg(count(lit(1)).as("cnt"))
    val totals = scored.groupBy("stratum").agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("stratum").orderBy(col("score_micro"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bands = counts.join(totals, Seq("stratum"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .groupBy("stratum")
      .agg(
        min(when(col("cum") >= floor(lit(pLo) * (col("n") - 1)) + 1,
          col("score_micro"))).as("lo"),
        min(when(col("cum") >= floor(lit(pHi) * (col("n") - 1)) + 1,
          col("score_micro"))).as("hi"))
    scored.join(broadcast(bands), Seq("stratum"))
      .filter(col("score_micro") >= col("lo") && col("score_micro") <= col("hi"))
      .select(col("__qb_id").as(idCol), col("stratum"), col("score_micro"))
  }

  /** Bigram-LM quality score: mean ln P(wᵢ | wᵢ₋₁) over each doc's
    * word bigrams, with the LM estimated from the corpus itself
    * (P(w₂|w₁) = c(w₁w₂) / Σ_w c(w₁w)) — the step up from the unigram
    * typicality score: it penalizes improbable word ORDER, not just
    * rare words, so shuffled/garbled text scores low even when its
    * vocabulary is ordinary.
    *
    * Scale shape: one explode to bigram rows, one partial-aggregated
    * count, the prefix totals derived from the (already tiny)
    * aggregated bigram table — never a second corpus pass — and one
    * broadcast LM join back onto the bigram rows. The LM table is
    * O(distinct bigrams); for a web-scale vocabulary drop the
    * broadcast hint and the join shuffles on the bigram key instead,
    * same result. The probability is computed as ONE exact-int
    * division then ln, identical IEEE ops on both engines.
    */
  /** Size-conditional reuse cut of the exploded bigram table. The
    * bigram LM operators consume the exploded (doc_id, bigram) rows
    * TWICE — once to estimate the LM, once to score docs against it —
    * and without a cut the whole normalize → split → explode subtree
    * runs once per consumer (two full corpus passes). Below
    * `spark.graft.bigramCutMaxBytes` (default 8 GiB of ESTIMATED
    * input — plan statistics, i.e. file size for a scan) the exploded
    * frame is pinned with a lazy lineage cut: one corpus pass, the
    * second consumer reads the spill-backed cached blocks
    * (MEMORY_AND_DISK semantics — an oversized cache spills, it does
    * not OOM). Above the threshold the operator DEGRADES to the
    * two-pass shape: at 100 TB the exploded rows are a multiple of
    * the input (every token repeated into two bigrams), and writing
    * hundreds of TB through executor block managers costs more than
    * the second columnar scan it would save — re-reading parquet
    * twice is the cheaper plan, and the cut would also pin the
    * operator's peak storage footprint to the corpus size. Deployments
    * with block-manager budget to spare raise the conf; results are
    * identical either way (the cut only changes job shape).
    */
  private def maybeCutBigrams(input: DataFrame, bgs: DataFrame): DataFrame = {
    val maxBytes = input.sparkSession.conf
      .getOption("spark.graft.bigramCutMaxBytes")
      .flatMap(_.toLongOption).getOrElse(8L << 30)
    val est = input.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= maxBytes) graft.util.Lineage.truncateLazy(bgs) else bgs
  }

  def bigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val docs = df
      .select(col(idCol).as("doc_id"), split(normalize(col(textCol)), " ").as("arr"))
      .filter(size(col("arr")) >= 2) // sequence(2,1) would step BACKWARDS
      .repartition(p, col("doc_id")) // spread: one parquet split must not serialize the explode
    val bgs = maybeCutBigrams(df, docs.select(col("doc_id"), explode(expr(
      "transform(sequence(2, size(arr)), i -> concat(element_at(arr, i-1), ' ', element_at(arr, i)))")).as("bg")))
    val c2 = bgs.groupBy("bg").agg(count(lit(1)).as("c2"))
    val withW1 = c2.withColumn("w1", split(col("bg"), " ").getItem(0))
    val c1 = withW1.groupBy("w1").agg(sum("c2").as("c1"))
    val lm = withW1.join(c1, "w1")
      .select(col("bg"), (col("c2").cast("double") / col("c1")).as("p"))
    bgs.join(broadcast(lm), Seq("bg"))
      .groupBy("doc_id")
      .agg(round(avg(log(col("p"))), 4).as("mean_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Interpolated Kneser–Ney bigram logprob (Kneser & Ney, ICASSP'95;
    * the modified-KN family of Chen & Goodman 1999 with a single fixed
    * discount) — the properly SMOOTHED sibling of [[bigramLogProb]]:
    * raw MLE wildly overweights bigrams whose prefix is rare (c=1/c=1
    * scores p=1), while KN discounts every observed count by D and
    * redistributes the held-out mass through the CONTINUATION
    * probability — "how many distinct contexts does w₂ complete" —
    * the estimator that made n-gram LMs competitive and the standard
    * scorer behind perplexity-based corpus filtering:
    *   P(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁)
    *            + D·N₁₊(w₁·)/c(w₁) · N₁₊(·w₂)/N₁₊(··),  D = 0.75.
    *
    * Exactness: every term is a ratio of exact longs (D rides as
    * 75/100, so numerators stay integral); p is two IEEE divisions
    * and one add, identical expression both engines, then the
    * established one-ln-per-row + round(avg, 4) fold.
    *
    * Scale shape: [[bigramLogProb]]'s envelope plus two more
    * partial aggs on the ALREADY-AGGREGATED bigram table (prefix
    * fan-out N₁₊(w₁·) and continuation fan-in N₁₊(·w₂) are both
    * row counts over it) and a 1-row broadcast for N₁₊(··); the
    * corpus is still scanned once.
    */
  def knLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val docs = df
      .select(col(idCol).as("doc_id"), split(normalize(col(textCol)), " ").as("arr"))
      .filter(size(col("arr")) >= 2)
      .repartition(p, col("doc_id"))
    val bgs = maybeCutBigrams(df, docs.select(col("doc_id"), explode(expr(
      "transform(sequence(2, size(arr)), i -> concat(element_at(arr, i-1), ' ', element_at(arr, i)))")).as("bg")))
    val c2 = bgs.groupBy("bg").agg(count(lit(1)).as("c2"))
    val sp = c2
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
    val c1 = sp.groupBy("w1").agg(sum("c2").as("c1"), count(lit(1)).as("nf"))
    val nb = sp.groupBy("w2").agg(count(lit(1)).as("nb"))
    val nbg = c2.agg(count(lit(1)).as("nbg"))
    val lm = sp.join(c1, "w1").join(nb, "w2").crossJoin(broadcast(nbg))
      .select(col("bg"),
        (greatest(col("c2") * 100L - 75L, lit(0L)).cast("double")
            / (col("c1") * 100L).cast("double")
          + (lit(75L) * col("nf")).cast("double") * col("nb").cast("double")
            / ((col("c1") * 100L).cast("double") * col("nbg").cast("double")))
          .as("p"))
    bgs.join(broadcast(lm), Seq("bg"))
      .groupBy("doc_id")
      .agg(round(avg(log(col("p"))), 4).as("mean_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): each doc's
    * LM cost routes it into the head / middle / tail TERCILE of the
    * corpus — the published pre-training split where "head" feeds the
    * model, "middle" gets a second look and "tail" is dropped or
    * down-weighted. The LM here is the corpus-estimated bigram model
    * [[bigramLogProb]] scores with; the cost is integer end-to-end:
    * per-bigram round(−ln p ·10⁶) (nonnegative — p ≤ 1 — so integer
    * division truncates identically on both engines), per-doc mean by
    * exact div, tercile edges as exact LOWER quantiles (the value at
    * 0-based rank floor(p·(n−1)) — the quality_band convention).
    *
    * Scale shape: the bigram scoring is [[bigramLogProb]]'s (one
    * explode, partial-agg LM, broadcast join back); the tercile edges
    * come from the bucketed rank walk over DISTINCT cost values
    * (≤4097 range buckets, broadcast offsets, per-bucket cumulative
    * window — no partition-less window, the global sweep's contract);
    * the final label is one broadcast 1-row join onto the doc scores.
    * Docs with fewer than two words carry no bigram evidence and do
    * not appear (the bigramLogProb contract).
    */
  def pplBucket(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val docs = df
      .select(col(idCol).as("doc_id"), split(normalize(col(textCol)), " ").as("arr"))
      .filter(size(col("arr")) >= 2)
      .repartition(p, col("doc_id"))
    val bgs = maybeCutBigrams(df, docs.select(col("doc_id"), explode(expr(
      "transform(sequence(2, size(arr)), i -> concat(element_at(arr, i-1), ' ', element_at(arr, i)))")).as("bg")))
    val c2 = bgs.groupBy("bg").agg(count(lit(1)).as("c2"))
    val withW1 = c2.withColumn("w1", split(col("bg"), " ").getItem(0))
    val c1 = withW1.groupBy("w1").agg(sum("c2").as("c1"))
    val lm = withW1.join(c1, "w1")
      .select(col("bg"), (col("c2").cast("double") / col("c1")).as("p"))
    // cut at the DOC-grain cost table: `scored` feeds the tercile-edge
    // derivation AND the final labeling — without the cut the whole
    // corpus explode + LM build + scoring join runs TWICE (once per
    // consumer); the cut caches one tiny (doc_id, cost_micro) frame
    // inside the first downstream action (truncateLazy — no extra job)
    val scored = graft.util.Lineage.truncateLazy(
      bgs.join(broadcast(lm), Seq("bg"))
        .groupBy("doc_id")
        .agg(sum(round(-log(col("p")) * 1e6).cast("long")).as("s"),
          count(lit(1)).as("nb"))
        .select(col("doc_id"), expr("s div nb").as("cost_micro")))
    val counts = scored.groupBy("cost_micro").agg(count(lit(1)).as("cnt"))
    val range = counts.agg(min(col("cost_micro")).as("lo"),
      max(col("cost_micro")).as("hi"), sum(col("cnt")).as("n"))
    val bucketed = counts.crossJoin(broadcast(range))
      .withColumn("bkt", expr("(cost_micro - lo) div ((hi - lo) div 4096 + 1)"))
    val bcnt = bucketed.groupBy("bkt").agg(sum(col("cnt")).as("bc"))
    val boff = bcnt.as("a")
      .join(broadcast(bcnt.as("b")), col("b.bkt") < col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.bc")), lit(0L)).as("boff"))
    val wCum = Window.partitionBy(col("bkt")).orderBy(col("cost_micro"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val edges = bucketed.join(broadcast(boff), Seq("bkt"))
      .withColumn("cum", col("boff") + sum(col("cnt")).over(wCum))
      .agg(
        min(when(col("cum") >= expr("(n - 1) div 3 + 1"), col("cost_micro")))
          .as("q_lo"),
        min(when(col("cum") >= expr("((n - 1) * 2) div 3 + 1"), col("cost_micro")))
          .as("q_hi"))
    scored.crossJoin(broadcast(edges))
      .select(col("doc_id"), col("cost_micro"),
        when(col("cost_micro") <= col("q_lo"), "head")
          .when(col("cost_micro") <= col("q_hi"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Document fingerprints: exact content hash, order-independent
    * bag-of-tokens hash (catches token-shuffled copies), and a prefix
    * hash (cheap candidate key for prefix-duplicate scans).
    */
  /** Order-independent bag-of-tokens hash over a NORMALIZED text
    * column — the one definition shared by [[fingerprints]] and
    * `Dedup.keepBest`, so their groupings can never drift apart.
    */
  def bagHash(normCol: Column): Column =
    md5(array_join(array_sort(array_distinct(split(normCol, " "))), " "))

  /** Gopher-rule composite document filter (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", appendix A1.1) at the PUBLISHED
    * thresholds: 50 ≤ word count ≤ 100 000, mean word length in
    * [3, 10], symbol ratio ≤ 0.1, digit ratio ≤ 0.15, and ≥ 2 common
    * stopwords. Emits a per-rule BITMASK per doc (0 = keep) rather
    * than the kept subset, so the downstream report can see WHY a doc
    * failed and re-tune one rule without re-running the scan.
    *
    * Determinism: the counts are exact integers; the two ratio rules
    * compare 1e-6-rounded doubles (quality_band's engine-stability
    * convention). Pure per-row expressions — ZERO shuffles, runs at
    * scan speed, output partitioned like the input.
    */
  /** Per-document character-entropy quality signal — the
    * compression-ratio proxy of a curation pipeline: Shannon entropy
    * of the normalized character distribution, in integer micro-nats
    * so the score is an EXACT long (ent_micro = Σ_c cnt_c · q_c with
    * q_c = round(ln(n/cnt_c)·10⁶) — the DSIR/logprob quantization
    * convention; real nats ≈ ent_micro / (n·10⁶)). Low entropy flags
    * repeated boilerplate and padding (few characters dominate); the
    * ceiling ln(alphabet) catches key-mash/random-noise docs sitting
    * unusually close to it. Complements repetition (token-level) and
    * gopher (lexical rules) with a distribution-level signal.
    *
    * Pure per-row array arithmetic — ZERO shuffles, runs at scan
    * speed, output partitioned like the input (the repetition/gopher
    * shape). The per-row cost is O(alphabet · chars); normalize()
    * keeps the alphabet a few dozen symbols. Empty-string characters
    * are stripped first: Spark's split keeps a trailing "" where
    * DuckDB's does not, and a phantom character would shift every
    * count.
    */
  def entropy(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
        array_remove(split(normalize(col(textCol)), ""), "").as("cs"))
      .select(col(idCol), size(col("cs")).as("n_chars"), col("cs"))
      .withColumn("ent_micro", expr(
        """CASE WHEN n_chars = 0 THEN 0L ELSE
          |  aggregate(
          |    transform(array_distinct(cs), c -> size(filter(cs, x -> x = c))),
          |    0L,
          |    (acc, cnt) -> acc + cnt * cast(round(
          |      ln(n_chars / cast(cnt as double)) * 1000000) as bigint))
          |END""".stripMargin))
      .drop("cs")

  def gopherFilter(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol), t.as("text"), normalize(t).as("norm"))
      .select(col(idCol),
        size(split(col("norm"), " ")).as("n_tokens"),
        (length(regexp_replace(col("norm"), " ", "")).cast("double") /
          size(split(col("norm"), " "))).as("mtl"),
        round(length(regexp_replace(col("text"), "[a-z0-9A-Z ]", ""))
          .cast("double") / length(col("text")), 6).as("punct_r"),
        round(length(regexp_replace(col("text"), "[^0-9]", ""))
          .cast("double") / length(col("text")), 6).as("digit_r"),
        stopwordCount("norm", stopwordsEn).as("n_stop"))
      .select(col(idCol),
        (when(col("n_tokens") < 50 || col("n_tokens") > 100000, 1).otherwise(0)
          + when(round(col("mtl"), 6) < 3.0 || round(col("mtl"), 6) > 10.0, 2).otherwise(0)
          + when(col("punct_r") > 0.1, 4).otherwise(0)
          + when(col("digit_r") > 0.15, 8).otherwise(0)
          + when(col("n_stop") < 2, 16).otherwise(0)).cast("long")
          .as("gopher_mask"))
  }

  /** Canonical-URL dedup — the FIRST dedup stage of a crawl pipeline,
    * run before any content comparison: recrawls and link-decoration
    * variants of one page collapse by URL alone, which is free
    * compared to content hashing (no document bytes touched). The
    * canonical form lowercases the URL, strips the query string and
    * fragment (`[?#].*`), drops a `www.` host prefix, and trims
    * trailing slashes. (Lowercasing the whole URL — not just the host
    * — is a deliberate simplification; case-sensitive-path sites
    * trade a few false merges for engine-portable string ops. All
    * patterns are RE2-safe, same portability contract as [[scrub]].)
    *
    * Shape: per-row string expressions at scan speed, then ONE
    * hash-partitioned groupBy on the canonical key — struct-min
    * keeper selection, partial-aggregatable, no window sort (the
    * dedup_exact shape with the URL as the key).
    */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val canon =
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(col(urlCol)), "[?#].*$", ""),
          "://www\\.", "://"),
        "/+$", "")
    df.select(canon.as("canonical_url"), col(idCol).cast("long").as("__id"))
      .groupBy("canonical_url")
      .agg(min(col("__id")).as("keeper_id"), count(lit(1)).as("n_copies"))
  }

  def fingerprints(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), normalize(col(textCol)).as("norm"))
      .select(col(idCol),
        md5(col("norm")).as("content_hash"),
        bagHash(col("norm")).as("bag_hash"),
        md5(substring(col("norm"), 1, 64)).as("prefix_hash"))

  /** MOSS winnowing fingerprints (Schleimer et al. 2003) — the robust
    * fingerprint SELECTION rule under local edits: hash every char
    * `k`-gram of the normalized text, slide a `w`-hash window, keep
    * each window's minimum. The selected set carries the winnowing
    * guarantee: any substring SHARED between two documents of length
    * ≥ k + w − 1 contributes at least one shared fingerprint, while
    * only ~2/(w+1) of all gram hashes are kept — the sketch that
    * makes substring-level matching pairwise-joinable without
    * shipping every gram (text_fingerprint hashes the WHOLE doc;
    * this survives partial overlap).
    *
    * One row per (doc, distinct selected hash). Pure per-row array
    * arithmetic over the portable hash family — ZERO shuffles, runs
    * at scan speed, engine-replayable (hash-gated). Docs shorter than
    * k + w − 1 chars have no complete window and emit nothing.
    */
  def winnow(df: DataFrame, textCol: String, idCol: String,
             k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 2, s"gram size k must be >= 2, got $k")
    require(w >= 1, s"window w must be >= 1, got $w")
    // portableHash64 rendered inside a HOF lambda (Hashing's column
    // form can't reference the lambda variable); the native prefix
    // hash skips the per-position hex render + re-parse — at one hash
    // per input CHARACTER this chain is the whole profile
    val h =
      if (df.sparkSession.catalog.functionExists("graft_h64"))
        s"graft_h64(substr(nt, i + 1, $k))"
      else
        s"cast(conv(substr(md5(substr(nt, i + 1, $k)), 1, 15), 16, 10) as bigint)"
    // spread: the gram-hash transform costs one md5 PER CHARACTER, so
    // a single-split input serializes the whole corpus onto one core;
    // no-op once the scan has >= cores splits (guide §2.5 input skew)
    graft.util.Tables.spread(
        df.select(col(idCol), normalize(col(textCol)).as("nt")), col(idCol))
      .filter(length(col("nt")) >= k + w - 1)
      .withColumn("hs", expr(
        s"transform(sequence(0, length(nt) - $k), i -> $h)"))
      .withColumn("fp", explode(expr(
        s"array_distinct(transform(sequence(0, size(hs) - $w), " +
          s"j -> array_min(slice(hs, j + 1, $w))))")))
      .select(col(idCol), col("fp"))
  }

  /** Categorized wordlist scan (the C4 badwords / policy-term filter
    * lineage): per document, the token-hit count and ppm rate against
    * each configured category's term list, plus a per-category flag —
    * compared as the exact rational n_hits·10⁶ ≥ flagPpm·n_tokens
    * (never the floored ppm, which under-flags huge docs), with
    * flagPpm = 0 meaning C4's any-occurrence drop and fraction
    * thresholds the Gopher-style soft variant. Counts are occurrence
    * counts (multiplicity, not distinct), so a document repeating one
    * term 50 times reads as saturated, not as one hit.
    *
    * The lists ride the plan as literals (policy lists are small by
    * construction — broadcast-free), matching is a per-row
    * array-filter lambda, and the output is LONG format (one row per
    * doc × category) so adding a category never changes the schema.
    * Zero shuffles: scan speed, the gopher_filter class.
    */
  def wordlistScan(df: DataFrame, textCol: String, idCol: String,
                   lists: Map[String, Seq[String]],
                   flagPpm: Long = 0L): DataFrame = {
    require(lists.nonEmpty, "wordlistScan needs at least one category")
    val base = df.select(col(idCol),
        split(normalize(col(textCol)), " ").as("toks"))
      .withColumn("n_tokens",
        size(filter(col("toks"), t => length(t) > 0)).cast("long"))
    val cats = lists.toSeq.sortBy(_._1).map { case (cat, terms) =>
      val hits = size(filter(col("toks"),
        t => array_contains(typedlit(terms), t))).cast("long")
      struct(lit(cat).as("category"), hits.as("n_hits"))
    }
    base.select(col(idCol), col("n_tokens"),
        explode(array(cats: _*)).as("c"))
      .select(col(idCol), col("c.category").as("category"), col("n_tokens"),
        col("c.n_hits").as("n_hits"))
      .withColumn("hit_ppm",
        when(col("n_tokens") > 0, expr("n_hits * 1000000 DIV n_tokens"))
          .otherwise(lit(0L)))
      .withColumn("flagged",
        (col("n_hits") > 0 &&
          col("n_hits") * lit(1000000L) >= lit(flagPpm) * col("n_tokens"))
          .cast("int"))
  }

  /** Canary injection for memorization auditing (the secret-sharer
    * methodology, Carlini et al. USENIX Sec'19): deterministically
    * select `ratePpm` of documents by id hash and append a per-doc
    * canary token derived from the same hash. Because selection AND
    * token are pure functions of (salt, id), the audit can always
    * recompute exactly which documents carry which canary — no
    * side-channel list to store, replays inject identical bytes
    * (streaming-safe), and post-training extraction rates measure
    * memorization against recomputable ground truth. Non-selected
    * rows pass through byte-identical.
    *
    * Zero shuffles: one hash + one conditional concat per row.
    */
  def canary(df: DataFrame, textCol: String, idCol: String,
             ratePpm: Long = 10000L, salt: String = "graft"): DataFrame = {
    require(ratePpm >= 0 && ratePpm <= 1000000L,
      s"ratePpm must be in [0, 1000000], got $ratePpm")
    val key = concat(lit(s"$salt-canary:"), col(idCol).cast("string"))
    val sel = pmod(graft.util.Hashing.portableHash64(key),
      lit(1000000L)) < ratePpm
    val token = concat(lit("canary-"), substring(md5(key), 1, 12))
    df.withColumn("has_canary", sel.cast("int"))
      .withColumn(textCol,
        when(sel, concat(col(textCol), lit(" "), token))
          .otherwise(col(textCol)))
  }

  /** Content-defined chunking (the LBFS/rsync boundary rule, Muthitacharoen
    * et al. SOSP'01): split each document at positions where the
    * portable hash of the trailing `k`-char gram ≡ 0 (mod `modulus`) —
    * boundaries are a function of LOCAL content, so inserting or
    * deleting a passage shifts only the chunks it touches while every
    * other chunk (and its hash) survives byte-identical. That is the
    * property fixed-width chunking ([[chunk]]) lacks: one edit
    * re-frames every window after it; here chunk-level dedup stays
    * robust under edits — the rsync/backup-dedup trick applied to
    * corpus curation. Expected chunk length ≈ modulus + k chars.
    *
    * Emits (id, chunk_idx, start_pos, chunk_len, chunk_md5) rows; the
    * chunk hash chain reuses [[winnow]]'s gram-hash arithmetic, so the
    * selection itself hash-gates cross-engine. Documents shorter than
    * k chars form one chunk; empty documents emit none. No min/max
    * chunk clamps: a boundary-free doc is ONE chunk row (never an
    * executor hazard — the explode is per-doc bounded by doc length).
    *
    * Scale shape: pure per-row array arithmetic + one explode — ZERO
    * shuffles, scan speed, the text_winnow class.
    */
  def cdcChunk(df: DataFrame, textCol: String, idCol: String,
               k: Int = 8, modulus: Int = 16): DataFrame = {
    require(k >= 2, s"gram size k must be >= 2, got $k")
    require(modulus >= 2, s"modulus must be >= 2, got $modulus")
    // same native-vs-builtin gram hash as winnow (one hash per char)
    val h =
      if (df.sparkSession.catalog.functionExists("graft_h64"))
        s"graft_h64(substr(nt, i + 1, $k))"
      else
        s"cast(conv(substr(md5(substr(nt, i + 1, $k)), 1, 15), 16, 10) as bigint)"
    // spread: per-character md5 boundary scan — see winnow
    graft.util.Tables.spread(
        df.select(col(idCol), normalize(col(textCol)).as("nt")), col(idCol))
      .filter(length(col("nt")) > 0)
      // cut AFTER the last char of each boundary gram (0-based gram
      // start i → char index i + k); the length guard keeps
      // sequence() from descending on sub-k docs
      .withColumn("cuts", expr(
        s"""CASE WHEN length(nt) >= $k
           |  THEN transform(
           |    filter(sequence(0, length(nt) - $k), i -> $h % $modulus = 0),
           |    i -> i + $k)
           |  ELSE array()
           |END""".stripMargin))
      .withColumn("bounds", expr(
        "array_sort(array_distinct(concat(array(0), cuts, array(length(nt)))))"))
      .withColumn("ch", explode(expr(
        """CASE WHEN size(bounds) >= 2
          |  THEN transform(sequence(1, size(bounds) - 1),
          |         j -> struct(j AS idx, element_at(bounds, j) AS s,
          |                     element_at(bounds, j + 1) AS e))
          |  ELSE array()
          |END""".stripMargin)))
      .select(col(idCol),
        col("ch.idx").cast("long").as("chunk_idx"),
        col("ch.s").cast("long").as("start_pos"),
        (col("ch.e") - col("ch.s")).cast("long").as("chunk_len"),
        md5(expr("substr(nt, ch.s + 1, ch.e - ch.s)")).as("chunk_md5"))
  }

  /** Substring-level near-dup pairs from winnowed fingerprints: docs
    * sharing ≥ `minShared` selected hashes — the plagiarism-detector
    * shape (MOSS), catching documents that EMBED a common passage
    * the doc-level hashes (exact/bag/simhash) and even token-set
    * similarity miss when the surrounding text differs.
    *
    * Scale shape mirrors [[graft.ops.Dedup.ngramJaccard]]'s candidate
    * index, but over the winnowed ~2/(w+1) subsample instead of every
    * gram: df-capped fingerprints (a boilerplate hash shared by half
    * the corpus indexes nothing, same reasoning as the shingle cap),
    * the join salted 16 ways on the probe side so one hot fingerprint
    * cannot pin a partition, pair counts partial-aggregated. The
    * fingerprint set is materialized once and released (the
    * persist + Lineage.truncate hygiene of the other pair operators —
    * durable under the spark.graft.checkpointDir knob).
    */
  /** Shared-fingerprint pair counts over a winnowed (id, fp) set:
    * df-capped index, 16-way salted join, partial-aggregated counts
    * — the candidate machinery behind [[winnowPairs]] and
    * [[winnowContainment]]. Lazy; callers own persist/checkpoint.
    */
  private def sharedFpCounts(fps: DataFrame, rareFps: DataFrame,
                             idCol: String, minShared: Int): DataFrame = {
    val rare = fps.join(rareFps, Seq("fp"), "left_semi")
    val SALTS = 16
    val a = rare.select(col("fp"), col(idCol).as("id_a"))
      .withColumn("salt", pmod(
        graft.util.Hashing.portableHash64(col("id_a").cast("string")),
        lit(SALTS.toLong)))
    val b = rare.select(col("fp"), col(idCol).as("id_b"))
      .crossJoin(fps.sparkSession.range(SALTS).toDF("salt"))
    a.join(b, Seq("fp", "salt"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def winnowPairs(df: DataFrame, textCol: String, idCol: String,
                  k: Int = 8, w: Int = 4, minShared: Int = 2,
                  maxDf: Int = 1000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fps = winnow(df, textCol, idCol, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fps.count()
    val rareFps = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fp")
    val result = graft.util.Lineage.truncate(
      sharedFpCounts(fps, rareFps, idCol, minShared))
    fps.unpersist()
    result
  }

  /** Asymmetric containment scores over winnowed fingerprints — the
    * quotation detector: cont_a_ppm = |FP_A ∩ FP_B| · 10⁶ / |FP_A|
    * tells how much of A's fingerprint set lives inside B (and vice
    * versa). A document EMBEDDED whole in another scores exactly 10⁶
    * on its side WHILE its fingerprints stay under the df cap —
    * every window of the contained doc is a window of the container,
    * so FP_A ⊆ FP_B by construction — while mutual near-dups score
    * high symmetrically; `dedup_winnow`'s n_shared alone can't tell
    * the two apart.
    *
    * The df cap cuts both ways for containment: a passage quoted by
    * MORE than maxDf documents indexes nothing, so the most-quoted
    * passages would silently score low — exactly the wrong failure
    * for a quotation detector. The n_capped_a/n_capped_b columns
    * make that saturation VISIBLE (how many of each doc's
    * fingerprints the cap excluded): a doc whose n_capped approaches
    * n_fp is a heavily-boilerplate/heavily-quoted doc whose score is
    * a floor, not an estimate, and the consumer can rerun with a
    * higher cap for those. Denominators count ALL fingerprints; the
    * numerator uses the capped index, so scores only understate.
    */
  def winnowContainment(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 8, w: Int = 4, minShared: Int = 2,
                        maxDf: Int = 1000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fps = winnow(df, textCol, idCol, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fps.count()
    // the df aggregate feeds rare AND capped sides; both are
    // post-shuffle aggregates, so exchange reuse dedups the scan
    // (the tokenDrift lesson — no persist needed)
    val dfAgg = fps.groupBy("fp").agg(count(lit(1)).as("df"))
    val counts = fps.groupBy(col(idCol)).agg(count(lit(1)).as("n_fp"))
    val capped = fps
      .join(dfAgg.filter(col("df") > maxDf).select("fp"), Seq("fp"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_capped"))
    val result = graft.util.Lineage.truncate(sharedFpCounts(fps,
        dfAgg.filter(col("df") <= maxDf).select("fp"), idCol, minShared)
      .join(counts.select(col(idCol).as("id_a"), col("n_fp").as("n_fp_a")),
        Seq("id_a"))
      .join(counts.select(col(idCol).as("id_b"), col("n_fp").as("n_fp_b")),
        Seq("id_b"))
      .join(capped.select(col(idCol).as("id_a"), col("n_capped").as("n_capped_a")),
        Seq("id_a"), "left")
      .join(capped.select(col(idCol).as("id_b"), col("n_capped").as("n_capped_b")),
        Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("n_fp_a"), col("n_fp_b"),
        coalesce(col("n_capped_a"), lit(0L)).as("n_capped_a"),
        coalesce(col("n_capped_b"), lit(0L)).as("n_capped_b"),
        expr("n_shared * 1000000 div n_fp_a").as("cont_a_ppm"),
        expr("n_shared * 1000000 div n_fp_b").as("cont_b_ppm")))
    fps.unpersist()
    result
  }

  /** Per-stratum corpus statistics — the reporting pass a data-mixing
    * pipeline runs first: document counts, token totals/means, char
    * totals per (e.g.) language × source. One partial-aggregatable
    * groupBy over per-row expressions; at 100 TB this is a single
    * map-side-combined shuffle of |strata| rows per partition. The
    * token totals feed [[graft.ops.Sampling.tokenBudget]] directly.
    */
  def corpusStats(df: DataFrame, textCol: String, strata: Seq[String]): DataFrame = {
    val t = col(textCol)
    df.select(strata.map(col) ++ Seq(
        size(split(normalize(t), " ")).as("nt"),
        length(t).as("nc")): _*)
      .groupBy(strata.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        round(avg(col("nt")), 4).as("mean_tokens"),
        sum(col("nc")).as("total_chars"),
        max(col("nc")).as("max_chars"))
  }

  /** Within-document repetition signals (the Gopher-rule family of
    * quality filters): fraction of duplicated tokens and of duplicated
    * bigrams. Pure per-row array expressions — map-only, no shuffle,
    * codegen'd: at 100 TB this runs at scan speed.
    */
  def repetition(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), split(normalize(col(textCol)), " ").as("toks"))
      .withColumn("bigrams", expr(
        // guard: sequence(0, -1) would DESCEND, not be empty
        """CASE WHEN size(toks) > 1
          |  THEN transform(sequence(0, size(toks) - 2),
          |         i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2)))
          |  ELSE array()
          |END""".stripMargin))
      .select(col(idCol),
        size(col("toks")).as("n_tokens"),
        round(lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")), 6).as("dup_token_frac"),
        when(size(col("bigrams")) > 0,
          round(lit(1.0) - size(array_distinct(col("bigrams"))).cast("double") /
            size(col("bigrams")), 6))
          .otherwise(lit(0.0)).as("dup_bigram_frac"))

  /** Fuzzy decontamination by n-gram COVERAGE ratio — the deployed
    * variant of [[contamination]] (the PaLM/GPT-4 eval-decontamination
    * rule flags a document when ≥ ~70% of its n-grams appear in a
    * benchmark set; an absolute shared count can't express that for
    * variable-length docs). For every non-probe document: its distinct
    * n-gram count, how many of those appear anywhere in the probe set,
    * and the coverage in ppm — the integer quotient
    * n_matched·10⁶ div n_grams, exact on any engine — with a flag at
    * `flagPpm`. Documents shorter than n tokens surface with
    * n_grams = 0, cov_ppm = 0 (a filter decision needs every doc, so
    * no inner-join disappearance here).
    *
    * Scale shape: identical to [[contamination]] — per-doc
    * array_distinct before the explode, DISTINCT'd probe gram set
    * broadcast (benchmarks are tiny next to a training corpus), one
    * partial-aggregated count — plus one id-keyed left join back to
    * the doc list so empty docs survive. No corpus self-join, no
    * corpus-wide distinct.
    */
  def ngramCoverage(df: DataFrame, textCol: String, idCol: String,
                    probe: Column, n: Int = 8,
                    flagPpm: Long = 700000L): DataFrame = {
    val grams = df
      .select(col(idCol), probe.as("__probe"),
        split(normalize(col(textCol)), " ").as("toks"))
      .withColumn("gram", explode(expr(
        s"""array_distinct(CASE WHEN size(toks) >= $n
           |  THEN transform(sequence(0, size(toks) - $n),
           |         i -> array_join(slice(toks, i + 1, $n), ' '))
           |  ELSE array()
           |END)""".stripMargin)))
      .select(col(idCol), col("__probe"), col("gram"))
    val probeGrams = grams.filter(col("__probe")).select("gram").distinct()
    val counts = grams.filter(!col("__probe"))
      .join(broadcast(probeGrams.withColumn("__hit", lit(1L))),
        Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum("__hit"), lit(0L)).as("n_matched"))
    df.filter(!probe).select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
      .withColumn("cov_ppm",
        when(col("n_grams") > 0, expr("n_matched * 1000000 DIV n_grams"))
          .otherwise(lit(0L)))
      .withColumn("flagged", (col("cov_ppm") >= flagPpm).cast("int"))
  }

  /** Benchmark-contamination check: for each corpus document, the
    * number of distinct word `n`-grams it shares with ANY document of
    * the probe (benchmark) set, and a flag at `minShared`. The probe
    * n-gram set is DISTINCT'd and broadcast — benchmark suites are
    * tiny next to a training corpus — so the corpus side is a map-side
    * semi-join over the scan followed by a partial-aggregated count:
    * no corpus shuffle, no pairwise join. Documents sharing nothing
    * are absent from the output (inner probe join).
    */
  def contamination(df: DataFrame, textCol: String, idCol: String,
                    probe: Column, n: Int = 3, minShared: Int = 5): DataFrame = {
    // per-doc array_distinct BEFORE the explode: (id, gram) rows come
    // out unique without a corpus-wide distinct shuffle
    val grams = df
      .select(col(idCol), probe.as("__probe"),
        split(normalize(col(textCol)), " ").as("toks"))
      .withColumn("gram", explode(expr(
        s"""array_distinct(CASE WHEN size(toks) >= $n
           |  THEN transform(sequence(0, size(toks) - $n),
           |         i -> array_join(slice(toks, i + 1, $n), ' '))
           |  ELSE array()
           |END)""".stripMargin)))
      .select(col(idCol), col("__probe"), col("gram"))
    val probeGrams = grams.filter(col("__probe")).select("gram").distinct()
    grams.filter(!col("__probe"))
      .join(broadcast(probeGrams), Seq("gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared_ngrams"))
      .withColumn("contaminated",
        (col("n_shared_ngrams") >= minShared).cast("int"))
  }

  /** Document-frequency boilerplate pruning (the CCNet-style strip of
    * tokens so common they carry no signal — navigation chrome,
    * templated headers — before fingerprinting/minhashing): drop from
    * every doc the tokens appearing in more than `maxDfShare` of all
    * docs, preserving order and multiplicity of what remains.
    *
    * Scale shape: the ONLY shuffle is the df count (per-doc
    * array_distinct before the explode — no corpus-wide distinct),
    * the high-df set is a one-row broadcast (vocab above 75% df is
    * tiny by Zipf), and the prune itself is a per-row lambda over the
    * token array — scan speed, no second corpus pass.
    */
  def dfPrune(df: DataFrame, textCol: String, idCol: String,
              maxDfShare: Double = 0.75): DataFrame = {
    val d = df.select(col(idCol),
      split(normalize(col(textCol)), " ").as("toks"))
    val counts = d
      .select(col(idCol), explode(array_distinct(col("toks"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val hd = counts
      .crossJoin(broadcast(df.agg(count(lit(1)).as("nd"))))
      .filter(col("df") > col("nd") * maxDfShare)
      // sort for a deterministic plan literal; membership-only use
      .agg(array_sort(collect_list("tok")).as("hs"))
    d.crossJoin(broadcast(hd))
      .withColumn("kept", expr("filter(toks, t -> NOT array_contains(hs, t))"))
      .select(col(idCol),
        (org.apache.spark.sql.functions.size(col("toks")) -
          org.apache.spark.sql.functions.size(col("kept"))).as("n_removed"),
        array_join(col("kept"), " ").as("pruned"))
  }

  /** Token-window document chunking: split each doc into fixed-size
    * overlapping windows of whitespace tokens — the context-window
    * assembly step before embedding or training (each chunk becomes
    * one model input; `overlap` preserves cross-boundary context).
    *
    * Chunk i covers tokens [i·step, i·step + size) with
    * step = size − overlap; the last chunk is allowed to be short
    * (every token appears in ≥ 1 chunk, docs shorter than `size`
    * yield exactly one). Deterministic chunk ids, pure per-row array
    * arithmetic: ZERO shuffles, runs at scan speed, and the output
    * is partitioned exactly like the input (doc-contiguous), so a
    * downstream embed/write sees no exchange either.
    */
  def chunk(df: DataFrame, textCol: String, idCol: String,
            size: Int, overlap: Int, carry: Seq[String] = Nil): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need size > overlap >= 0, got size=$size overlap=$overlap")
    val step = size - overlap
    // `carry` columns ride along unchanged (doc metadata onto each
    // chunk row) — selected through the per-row explode, so the
    // zero-shuffle shape survives instead of a corpus-sized metadata
    // rejoin downstream
    df.select(col(idCol) +: split(normalize(col(textCol)), " ").as("toks")
        +: carry.map(col): _*)
      .withColumn("n", org.apache.spark.sql.functions.size(col("toks")))
      // integer ceil on positives: 1 + (n - size + step - 1) div step
      .withColumn("nch", when(col("n") <= size, lit(1L)).otherwise(
        lit(1L) + call_function("div", col("n") - size + (step - 1), lit(step.toLong))))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("nch") - 1)))
      // Slice wants int offsets; chunk counts are far below 2^31
      .withColumn("start", (col("chunk_id") * step + 1).cast("int"))
      .select(col(idCol) +: col("chunk_id")
        +: org.apache.spark.sql.functions.size(
          slice(col("toks"), col("start"), lit(size))).as("n_tokens")
        +: array_join(
          slice(col("toks"), col("start"), lit(size)), " ").as("chunk")
        +: carry.map(col): _*)
  }

  /** Symmetric-window token co-occurrence counts — the corpus
    * statistic embedding training starts from (GloVe's X_ij matrix;
    * word2vec's skip-gram pair stream): every ordered (center,
    * context) pair with the context inside ±window positions, counted
    * corpus-wide, thresholded at `minCount` (GloVe drops the huge
    * low-count tail too — and it keeps the gated output deterministic
    * in size).
    *
    * Scale shape: each doc builds its pair list in ONE per-row
    * expression and explodes small (center, context) structs — the
    * token array is never replicated per pair; the count is one
    * partial-aggregatable groupBy (hot word-pairs are Zipf-skewed but
    * pre-aggregated map-side, so reducers see at most |vocab-pair|
    * rows). Output bounded by the pair vocabulary, not the corpus.
    */
  def cooccurrence(df: DataFrame, textCol: String,
                   window: Int, minCount: Long): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val ws = split(normalize(col(textCol)), " ")
    val n = org.apache.spark.sql.functions.size(ws)
    // Per-row pair construction unrolled over the (literal, small)
    // distance d: tokens at distance exactly d pair as
    // zip(ws[0..n-d), ws[d..n)), emitted in both directions. slice +
    // arrays_zip are plain expressions with native element loops — no
    // per-element lambda dispatch, which is what made the nested
    // transform/filter formulation of this ~40× slower (HOF lambdas
    // evaluate interpreted; same lesson as Similarity.project's
    // unrolling, PERF.md).
    val pairs = concat((1 to window).flatMap { d =>
      val len = greatest(lit(0), n - d)
      val a = slice(ws, lit(1), len)
      val b = slice(ws, lit(d + 1), len)
      Seq(arrays_zip(a.as("center"), b.as("context")),
        arrays_zip(b.as("center"), a.as("context")))
    }: _*)
    df.select(explode(pairs).as("p"))
      .select(col("p.center").as("center"), col("p.context").as("context"))
      .groupBy("center", "context").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Pointwise mutual information over the co-occurrence matrix:
    * pmi(a, b) = ln( cnt(a,b)·T / (m(a)·m(b)) ) with T the total pair
    * mass and m(·) the marginals — the association score word-vector
    * pipelines factorize (PPMI-SVD lineage) and collocation mining
    * thresholds on. Quantized to integer micro-nats so output is
    * engine-exact.
    *
    * Scale shape: marginals and the total DERIVE from the (already
    * thresholded) co-occurrence aggregate — one more partial agg each,
    * never a corpus re-scan; the marginal join keys are single tokens
    * (at most |vocab| rows each side after aggregation).
    *
    * The aggregate feeds FOUR consumers (the matrix itself, both
    * marginals, the total), and exchange reuse does NOT dedup the
    * subtree across them (plan-verified: four full scan+explode+agg
    * branches, no ReusedExchange — the same failure Sketch.overlap
    * hit, PERF.md round 7). Without truncation the corpus explode ran
    * 4× and the query swung 5-23 s at sf0.1; with it, one pass. The
    * materialized frame is bounded by the THRESHOLDED pair vocabulary
    * — the operator's own output order — and truncation is durable
    * under the `spark.graft.checkpointDir` knob.
    */
  def pmi(coocRaw: DataFrame): DataFrame = {
    val cooc = graft.util.Lineage.truncate(coocRaw)
    val ma = cooc.groupBy(col("center").as("a")).agg(sum("cnt").as("m_a"))
    val mb = cooc.groupBy(col("context").as("b")).agg(sum("cnt").as("m_b"))
    val tot = cooc.agg(sum("cnt").as("t"))
    cooc.select(col("center").as("a"), col("context").as("b"), col("cnt"))
      .join(ma, Seq("a")).join(mb, Seq("b"))
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("cnt"),
        round(log(col("cnt").cast("double") * col("t").cast("double")
          / (col("m_a").cast("double") * col("m_b").cast("double"))) * 1e6)
          .cast("long").as("pmi_micro"))
  }

  /** Top-k tf·idf terms per document — the classic keyword/topic
    * signal (salient-term extraction, near-dup explanation, index
    * routing). Integer-exact: idf = round(ln(N/df)·10⁶) quantized to a
    * long, score = tf · idf_q — no float summation anywhere, so
    * output is engine- and partition-independent. Terms appearing in
    * EVERY doc get idf 0 and rank last (never negative — tf·idf's
    * standard smoothing-free form).
    *
    * Scale shape: one (doc, term) partial-agg count; document
    * frequency DERIVES from it (one more partial agg, never a second
    * corpus pass); doc count folds in as a broadcast single row; the
    * per-doc top-k is a window over the doc partitioning the tf
    * aggregate already has. Ties broken by term for total order.
    */
  def tfidf(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col(idCol), explode(split(normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N = total input docs (standard tf·idf): a partial-agg count of
    // the input, cheaper than a distinct over the tf table
    val nDocs = df.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    tf.join(dft, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * round(log(col("n").cast("double") / col("df").cast("double")) * 1e6)
          .cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
  }

  /** OCR-artifact scoring — the scan-corpus quality axis: digitized
    * text degrades in characteristic ways (character confusions like
    * o→0/e→3 yielding mixed alpha-digit tokens, shattered single-char
    * tokens, hyphenated linebreak residue "xx- yy"). Per doc, ppm
    * rates of each artifact class over the token count, and a flag at
    * `flagPpm` on the confusion rate. Map-only (one projection, no
    * shuffle); every rate is integer floor-ppm.
    */
  private val ocrMixedPpm =
    """size(filter(__toks, x -> x rlike '[0-9]' AND x rlike '[a-z]'))
      | * 1000000L DIV size(__toks)""".stripMargin

  def ocrArtifacts(df: DataFrame, textCol: String, idCol: String,
                   flagPpm: Long): DataFrame =
    df.select(col(idCol), normalize(col(textCol)).as("__nt"))
      .withColumn("__toks", split(col("__nt"), " "))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("mixed_ppm", expr(ocrMixedPpm))
      .withColumn("singleton_ppm", expr(
        "size(filter(__toks, x -> length(x) = 1)) * 1000000L DIV n_tokens"))
      .withColumn("hyphen_breaks",
        (size(split(col("__nt"), "- ", -1)) - 1L).cast("long"))
      .select(col(idCol), col("n_tokens"), col("mixed_ppm"),
        col("singleton_ppm"), col("hyphen_breaks"),
        (col("mixed_ppm") >= flagPpm).as("flagged"))

  /** The FILTER arm of [[ocrArtifacts]] (the pipeline stage): rows
    * whose confusion rate stays under `flagPpm`, all columns
    * preserved — pure per-row, so it streams.
    */
  def ocrFilter(df: DataFrame, textCol: String, flagPpm: Long): DataFrame =
    df.withColumn("__toks", split(normalize(col(textCol)), " "))
      .filter(expr(ocrMixedPpm) < flagPpm)
      .drop("__toks")

  /** C4-style page cleaning (the published Raffel et al. 2020
    * heuristics, re-expressed as one projection): LINE rules — keep
    * only lines that end in terminal punctuation, carry at least
    * `minWordsPerLine` words, and don't contain "javascript";
    * PAGE rules — a page survives only with ≥ `minLines` kept lines
    * and no "lorem ipsum" / "{" anywhere. Emits the audit row per
    * page (line counts in/kept, kept-text char count, survival flag)
    * — map-only, no shuffle; the corpus-rewrite variant is
    * `array_join` of the same kept-lines expression.
    */
  private def c4KeptLines(minWordsPerLine: Int) = expr(
    s"""filter(__lines, l -> l rlike '[.!?"]$$'
       |  AND size(split(l, ' ')) >= $minWordsPerLine
       |  AND NOT l rlike 'javascript')""".stripMargin)

  private def c4PageKept(textCol: Column, minLines: Int): Column =
    size(col("__kept")) >= minLines &&
      !lower(textCol).contains("lorem ipsum") &&
      !textCol.contains("{")

  def c4Filter(df: DataFrame, textCol: String, idCol: String,
               minWordsPerLine: Int, minLines: Int): DataFrame =
    df.select(col(idCol), col(textCol).as("__t"))
      .withColumn("__lines", split(col("__t"), "\n", -1))
      .withColumn("__kept", c4KeptLines(minWordsPerLine))
      .select(col(idCol),
        size(col("__lines")).cast("long").as("n_lines_in"),
        size(col("__kept")).cast("long").as("n_lines_kept"),
        length(array_join(col("__kept"), "\n")).cast("long")
          .as("clean_chars"),
        c4PageKept(col("__t"), minLines).as("kept"))

  /** The corpus-REWRITE arm of [[c4Filter]] (the pipeline stage):
    * surviving pages only, with text replaced by the kept lines —
    * same line/page rules, same single-projection shape.
    */
  def c4Clean(df: DataFrame, textCol: String, idCol: String,
              minWordsPerLine: Int, minLines: Int): DataFrame = {
    val others = df.columns.filterNot(_ == textCol).toSeq
    df.withColumn("__lines", split(col(textCol), "\n", -1))
      .withColumn("__kept", c4KeptLines(minWordsPerLine))
      .filter(c4PageKept(col(textCol), minLines))
      .select(others.map(col) :+
        array_join(col("__kept"), "\n").as(textCol): _*)
  }

  /** Chat-template rendering — the conversation→training-text step of
    * an SFT data pipeline: per conversation, turns sort by `ordCol`
    * and render alternately as user/assistant blocks
    * (`<tag>\ntext\n<endTag>\n`), fingerprinted with md5 so ANY
    * template drift (tag bytes, separator, turn order, role parity)
    * splits the hash. One groupBy on the conversation key;
    * sort_array puts the fold order under the plan's control (no
    * collect_list order dependence).
    */
  private def chatTurns(df: DataFrame, convCol: String, ordCol: String,
                        textCol: String): DataFrame =
    df.groupBy(col(convCol).as("conv_id"))
      .agg(sort_array(collect_list(struct(col(ordCol).as("o"),
        col(textCol).as("t")))).as("__turns"))

  private def chatRendered(userTag: String, assistantTag: String,
                           endTag: String) = expr(
    s"""array_join(transform(__turns, (x, i) ->
       |  concat(CASE WHEN i % 2 = 0 THEN '$userTag'
       |              ELSE '$assistantTag' END,
       |    chr(10), x.t, chr(10), '$endTag', chr(10))), '')""".stripMargin)

  def chatRender(df: DataFrame, convCol: String, ordCol: String,
                 textCol: String, userTag: String, assistantTag: String,
                 endTag: String): DataFrame =
    chatTurns(df, convCol, ordCol, textCol)
      .withColumn("__rendered",
        chatRendered(userTag, assistantTag, endTag))
      .select(col("conv_id"),
        size(col("__turns")).cast("long").as("n_turns"),
        length(col("__rendered")).cast("long").as("n_chars"),
        md5(col("__rendered")).as("fp"))

  /** The TEXT-emitting arm of [[chatRender]] — the SFT pipeline's
    * rendered training documents (conv_id, n_turns, text), same
    * template expression byte-for-byte.
    */
  def chatRenderText(df: DataFrame, convCol: String, ordCol: String,
                     textCol: String, userTag: String,
                     assistantTag: String, endTag: String): DataFrame =
    chatTurns(df, convCol, ordCol, textCol)
      .withColumn("text", chatRendered(userTag, assistantTag, endTag))
      .select(col("conv_id"),
        size(col("__turns")).cast("long").as("n_turns"), col("text"))
}
