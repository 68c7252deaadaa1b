package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale document pipelines: tokenization
  * stats, quality scoring, language identification, fingerprinting.
  *
  * Everything is built from codegen'd Catalyst expressions (split /
  * array collection expressions / regexp / one custom expression for the
  * rolling hash) — no Scala UDFs and no lambda higher-order functions
  * (`filter`/`aggregate` evaluate their lambdas interpreted per element)
  * — so the whole document scan stays inside WholeStageCodegen and
  * distributes trivially: each function is a per-row projection, no
  * shuffle.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** Count of tokens equal to one of `words`, as a codegen'd regexp count
    * over the raw text: a token is a maximal non-whitespace run, so
    * "preceded by start/whitespace and followed by whitespace/end" is
    * exactly token equality — same result as filtering the split array,
    * without the interpreted `filter` lambda or the array materialization. */
  private def tokenInSetCount(text: Column, words: Seq[String]): Column =
    if (words.isEmpty) lit(0)
    else {
      val alts = words.map(java.util.regex.Pattern.quote).mkString("|")
      regexp_count(text, lit(s"(?:^|(?<=\\s))(?:$alts)(?=\\s|$$)"))
    }

  /** Ratio of tokens appearing in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    tokenInSetCount(text, stopwords).cast("double") / tokenCount(text)

  /** Ratio of ASCII punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", "")))
      .cast("double") / length(text)

  /** Mean token length (chars), assuming single-space separation overhead. */
  def avgTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - lit(1))).cast("double") /
      tokenCount(text)

  /** Single-pass token statistics: struct(n_tokens, n_uniq, n_stop) —
    * the one-walk custom expression behind [[qualityScore]] and the q20/q21
    * query entries (field semantics exactly `split(text, "\\s+")`;
    * TextFunctionsSpec cross-checks against the composed forms). */
  def tokenStats(text: Column, stopwords: Seq[String] = Nil): Column =
    graft.expressions.GraftFunctions.tokenStats(text, stopwords)

  /** Composite quality score in [0,1]: rewards lexical diversity, penalizes
    * stopword stuffing, saturates length at `fullLengthTokens` tokens.
    * Deterministic double arithmetic (fixed evaluation order, same int
    * inputs as the composed formulation → bit-identical scores). */
  def qualityScore(text: Column, stopwords: Seq[String],
      fullLengthTokens: Int = 100): Column =
    qualityScoreFromStats(tokenStats(text, stopwords), fullLengthTokens)

  /** [[qualityScore]] over an already-computed [[tokenStats]] struct —
    * lets a query materialize the stats once and derive several measures. */
  def qualityScoreFromStats(stats: Column, fullLengthTokens: Int = 100): Column = {
    val n = stats.getField("n_tokens").cast("double")
    val uniq = stats.getField("n_uniq").cast("double") / n
    val stop = stats.getField("n_stop").cast("double") / n
    val lenNorm = least(lit(1.0), n / lit(fullLengthTokens.toDouble))
    (uniq + (lit(1.0) - stop) + lenNorm) / lit(3.0)
  }

  /** Composed built-in formulation of [[qualityScore]] — the executable
    * specification the single-pass form is cross-checked against. */
  def qualityScoreComposed(text: Column, stopwords: Seq[String],
      fullLengthTokens: Int = 100): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val uniq = size(array_distinct(toks)).cast("double") / n
    val stop = tokenInSetCount(text, stopwords).cast("double") / n
    val lenNorm = least(lit(1.0), n / lit(fullLengthTokens.toDouble))
    (uniq + (lit(1.0) - stop) + lenNorm) / lit(3.0)
  }

  /** Per-language marker-word profiles for the n-gram/function-word
    * language-ID heuristic. Public function words only. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "nicht"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  /** Language ID: score = number of distinct profile words present; argmax
    * with a fixed alphabetical tie-break so results are deterministic.
    * One single-pass custom expression (word→(lang,bit) lookup + popcount)
    * — the composed `array_intersect`-per-language form computes the same
    * result but materializes token arrays and scans them five times
    * (~10× slower on the corpus scan; ReferenceSpec cross-checks the two
    * formulations stay identical). */
  def languageId(text: Column): Column =
    graft.expressions.GraftFunctions.languageId(text, langProfiles.sortBy(_._1))

  /** The composed built-in formulation of [[languageId]] — kept as the
    * executable specification the custom expression is cross-checked
    * against. */
  def languageIdComposed(text: Column): Column = {
    val uniqToks = array_distinct(tokens(text))
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(uniqToks, array(words.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.sortBy(_._1).foldRight(lit("und"): Column) {
      case ((lang, score), elseExpr) =>
        when(score === best && score > 0, lang).otherwise(elseExpr)
    }
  }

  /** Content fingerprint: stable 128-bit digest of the normalized token
    * stream (whitespace-insensitive exact fingerprint). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Rolling hash over the token stream (chained xxhash64: each step hashes
    * the running state with the next token) — an order-sensitive fingerprint
    * cheap enough for 100 TB scans, and overflow-free under ANSI mode.
    * A custom codegen'd expression (bit-identical to the `aggregate` HOF
    * fold, minus the interpreted per-element lambda). */
  def rollingHash(text: Column): Column =
    graft.expressions.GraftFunctions.rollingXxHash64(tokens(text))

  /** PII / boilerplate scrub patterns — deliberately written in the
    * Java∩RE2 common dialect (explicit character classes, no lookaround)
    * so the same pattern text runs identically on Spark and on RE2-based
    * engines like the DuckDB oracle. `\s` itself is NOT in that common
    * dialect (Java's matches U+000B, RE2's does not), so whitespace is
    * spelled as the explicit class both engines read identically. */
  private val ws = "\\t\\n\\x0B\\f\\r "
  val urlPattern = s"https?://[^$ws]+"
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Redact URLs and emails with typed placeholder tokens (URLs first:
    * an email-shaped substring inside a URL belongs to the URL). A pure
    * scan-side projection — the codegen'd regexp_replace — so scrubbing
    * composes with pushdown and costs one pass. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, urlPattern, "<URL>"),
      emailPattern, "<EMAIL>")

  /** How many spans [[redact]] would replace. */
  def redactionCount(text: Column): Column =
    regexp_count(text, lit(urlPattern)) +
      regexp_count(regexp_replace(text, urlPattern, "<URL>"),
        lit(emailPattern))

  /** BPE-style pre-tokenizer segment pattern — the GPT-2 pretokenizer
    * shape (contractions | space-prefixed letter runs | digit runs |
    * punctuation runs | whitespace) minus its trailing-space lookahead:
    * RE2 has no lookahead, and the whole point is that the SAME pattern
    * text runs on Spark (Java regex) and the oracle engine. Alternation
    * is leftmost-first in both. */
  val bpeSegmentPattern: String =
    s"'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^$ws\\p{L}\\p{N}]+|[$ws]+"

  /** Pre-tokenizer segment count — the cheap, deterministic proxy for
    * "how many BPE tokens is this document" that corpus budgeting uses
    * (true BPE merges only split segments further, so this lower-bounds
    * and tracks the real count). One codegen'd regex scan per row. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeSegmentPattern))

  /** Raw-DEFLATE compressed length of the UTF-8 text — one codegen'd
    * expression ([[org.apache.spark.sql.graft.DeflateLength]]). */
  def deflateLength(text: Column): Column =
    graft.expressions.GraftFunctions.deflateLength(text)

  /** Compression ratio in ppm: `deflate_len · 10^6 div utf8_len` — the
    * Gopher-family quality signal (near-0 = degenerate repetition,
    * near-10^6 = high-entropy noise; natural text sits between). Pure
    * integer arithmetic over the per-JVM-deterministic deflate length;
    * see [[graft.util.Deflate]] for why this signal is spec-gated
    * rather than DuckDB-oracled. Empty text yields NULL (0/0). */
  def compressionRatio(text: Column): Column =
    graft.expressions.GraftFunctions.compressionRatioPpm(text)

  /** Gopher repetition signals (Rae et al. 2021 §A1.1), ppm-integer
    * exports — see [[org.apache.spark.sql.graft.RepetitionOps]] for
    * the exact tokenization/segmentation contract. */
  def dupSegmentStats(text: Column, sep: String): Column =
    graft.expressions.GraftFunctions.dupSegmentStatsPpm(text, sep)

  def topNgramCharPpm(text: Column, n: Int): Column =
    graft.expressions.GraftFunctions.topNgramCharPpm(text, n)

  def dupNgramCharPpm(text: Column, n: Int): Column =
    graft.expressions.GraftFunctions.dupNgramCharPpm(text, n)

  /** All thirteen Gopher repetition signals as one single-pass struct
    * — one tokenization per row instead of thirteen. */
  def gopherRepetitionStats(text: Column): Column =
    graft.expressions.GraftFunctions.gopherRepetitionStats(text)

  /** The seven non-repetition Gopher quality signals as one
    * single-pass struct — see
    * [[org.apache.spark.sql.graft.GopherQualityStats]] for the exact
    * field contract. */
  def gopherQualityStats(text: Column): Column =
    graft.expressions.GraftFunctions.gopherQualityStats(text)

  /** Gopher's quality gate (Rae et al. 2021 appendix A1.1): TRUE for
    * documents inside every published bound — 50 ≤ words ≤ 100,000,
    * mean word length in [3, 10], symbol-to-word ratio ≤ 0.1, ≤ 90%
    * bullet lines, ≤ 30% ellipsis lines, ≥ 80% words with an
    * alphabetic character, and ≥ 2 of the required English words.
    * NULL line fractions pass (a one-line doc with no `\n` still has
    * one line; NULL means NO lines, i.e. nothing to gate on); the
    * word-derived signals are NULL only when `n_words = 0`, which the
    * word-count bound already fails. One fused scan-side expression —
    * map-only, nothing shuffles. */
  def gopherQualityOk(text: Column,
      minWords: Long = 50L, maxWords: Long = 100000L): Column = {
    val q = gopherQualityStats(text)
    val checks: Seq[Column] = Seq(
      q.getField("n_words") >= minWords,
      q.getField("n_words") <= maxWords,
      q.getField("word_len_ppm") >= 3000000L,
      q.getField("word_len_ppm") <= 10000000L,
      q.getField("symbol_ppm") <= 100000L,
      coalesce(q.getField("bullet_line_ppm") <= 900000L, lit(true)),
      coalesce(q.getField("ellipsis_line_ppm") <= 300000L, lit(true)),
      q.getField("alpha_word_ppm") >= 800000L,
      q.getField("required_hits") >= 2L)
    checks.reduce(_ && _)
  }

  /** Gopher's full repetition gate (Rae et al. 2021, Table A1): TRUE
    * for documents under every published threshold — duplicate
    * line/paragraph fraction ≤ 0.30, duplicate line/paragraph CHAR
    * fraction ≤ 0.20, top-{2,3,4}-gram char share ≤ {0.20, 0.18,
    * 0.16}, duplicated-{5..10}-gram char coverage ≤ {0.15 down to
    * 0.10}. Signals that are NULL (no segments / no tokens) pass —
    * an empty doc has nothing repetitious; the length/quality gates
    * own that case. One fused single-pass expression over the text —
    * a scan-side map-only projection, nothing shuffles, the string
    * tokenized once per row. */
  def gopherRepetitionOk(text: Column): Column = {
    val r = gopherRepetitionStats(text)
    val checks: Seq[Column] = Seq(
      r.getField("dup_line_ppm") <= 300000L,
      r.getField("dup_line_char_ppm") <= 200000L,
      r.getField("dup_para_ppm") <= 300000L,
      r.getField("dup_para_char_ppm") <= 200000L,
      r.getField("top2_ppm") <= 200000L,
      r.getField("top3_ppm") <= 180000L,
      r.getField("top4_ppm") <= 160000L) ++
      Seq(5 -> 150000L, 6 -> 140000L, 7 -> 130000L, 8 -> 120000L,
        9 -> 110000L, 10 -> 100000L).map { case (n, t) =>
        r.getField(s"dup${n}_ppm") <= t
      }
    checks.map(c => coalesce(c, lit(true))).reduce(_ && _)
  }
}
