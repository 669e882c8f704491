package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * Everything here is pure `Column` composition over Spark built-ins — no
  * UDFs — so the whole surface stays inside whole-stage codegen and runs
  * per-partition with zero driver involvement at any scale.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles; empty array when the doc has < n
    * tokens. Backed by the codegen [[graft.plans.TextExpressions.Shingles]]
    * expression — the equivalent `transform`/`slice`/`concat_ws`
    * higher-order composition ([[shinglesComposed]], kept as the spec
    * reference) evaluates interpreted and measured ~1.9 s just to shingle
    * the sf0.1 documents table. */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.plans.Shingles(expression(text), n))

  /** The pre-codegen composition — spec reference for [[shingles]] parity
    * (guard needed: `sequence` would otherwise count downward). */
  private[graft] def shinglesComposed(text: Column, n: Int): Column = {
    val ts = tokens(text)
    when(size(ts) >= n,
      array_distinct(
        transform(sequence(lit(0), size(ts) - n),
          i => concat_ws(" ", slice(ts, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Canonical pre-dedup normalization: lowercase, non-alphanumerics to
    * spaces, whitespace collapse, trim — as ONE codegen'd byte scan
    * ([[graft.plans.NormalizeAscii]]) instead of four chained string
    * rewrites (two of them regex). Parity with [[normalizeComposed]]
    * including the Unicode lower-into-ASCII edge cases is spec-pinned. */
  def normalizeAscii(text: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.plans.NormalizeAscii(expression(text)))

  /** The pre-kernel composition — spec reference for [[normalizeAscii]]
    * parity and the exact semantics the DuckDB oracle replays. */
  private[graft] def normalizeComposed(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text),
      "[^a-z0-9 ]", " "), " +", " "))

  private def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.ColumnShim.expression(c)

  /** Count of occurrences of exactly-matching token `w`. Codegen
    * [[graft.plans.TextExpressions.TokenOccurrences]] — langId composes six
    * of these per row and the `filter` HOF evaluates interpreted. */
  def tokenOccurrences(text: Column, w: String): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.plans.TokenOccurrences(
        org.apache.spark.sql.graft.ColumnShim.expression(text), w))

  /** The pre-codegen composition — spec reference for [[tokenOccurrences]]
    * parity. */
  private[graft] def tokenOccurrencesComposed(text: Column, w: String): Column =
    size(filter(tokens(text), t => t === w))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Per-row term frequencies: token array → array<struct<term, tf>>.
    * Codegen [[graft.plans.TermCounts]] — replaces the
    * `explode → groupBy(id, term)` corpus exchange in tf-idf/BM25-style
    * scorers with a zero-shuffle scalar projection (see the expression's
    * scaladoc for the q81 plan it fixed). */
  def termCounts(tokensArr: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.plans.TermCounts(expression(tokensArr)))

  /** BPE-ish subword-run count: alphabetic runs, digit runs, and stray
    * non-space symbols each count as one token. */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  /** PII patterns, Java∩RE2 dialect (no backreferences, no lookaround —
    * q60's portability convention, so the DuckDB oracle runs them
    * verbatim). */
  val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val ipv4Re = """([0-9]{1,3}\.){3}[0-9]{1,3}"""
  val phoneRe = """555-[0-9]{4}"""

  /** PII scrub: emails → [EMAIL], then IPv4 → [IP], then phone runs →
    * [PHONE]. Email first — its domain part may contain dots that the
    * narrower patterns must never see half-redacted. Pure regexp_replace
    * chain, fully codegen'd, zero shuffles. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(emailRe), lit("[EMAIL]")),
        lit(ipv4Re), lit("[IP]")),
      lit(phoneRe), lit("[PHONE]"))

  /** URL canonicalization (the crawl-side dedup key): strip scheme and
    * `www.`, drop tracking query params (`utm_*`, `ref`), tidy dangling
    * `?`/`&`, and strip the trailing slash — in that order, so a
    * slash-before-query folds the same way as a bare trailing slash.
    * Java∩RE2 dialect, no backreferences (the `/?` → `?` fold is a
    * literal `replace`) — the DuckDB oracle runs the identical chain.
    * Pure codegen'd expression chain, zero shuffles. */
  def canonicalizeUrl(url: Column): Column = {
    val noScheme = regexp_replace(url, lit("^https?://"), lit(""))
    val noWww = regexp_replace(noScheme, lit("^www\\."), lit(""))
    val noTrack =
      regexp_replace(noWww, lit("(utm_[a-z]+|ref)=[^&]*&?"), lit(""))
    val noDangle = regexp_replace(noTrack, lit("[?&]+$"), lit(""))
    val foldSlash =
      org.apache.spark.sql.functions.replace(noDangle, lit("/?"), lit("?"))
    regexp_replace(foldSlash, lit("/$"), lit(""))
  }

  /** Marker-token language-ID heuristic (deterministic, SQL-expressible).
    * Scores a few marker words per language and takes a fixed-priority
    * argmax; `und` when nothing matches. All six marker counts come from
    * ONE [[graft.plans.TokenCounts]] subtree — the references are equal
    * deterministic expressions, so whole-stage codegen's subexpression
    * elimination tokenizes once per row instead of six times. */
  def langId(text: Column): Column = {
    val counts = org.apache.spark.sql.graft.ColumnShim.column(
      graft.plans.TokenCounts(
        org.apache.spark.sql.graft.ColumnShim.expression(text),
        Seq("the", "a", "data", "table", "group", "fast")))
    val en = element_at(counts, 1) + element_at(counts, 2)
    val es = element_at(counts, 3) + element_at(counts, 4)
    val de = element_at(counts, 5) + element_at(counts, 6)
    when(en === 0 && es === 0 && de === 0, lit("und"))
      .when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Average token length (separator-corrected) in basis points (×10⁴),
    * truncated. Rationals truncated from identical IEEE doubles are
    * bit-stable across engines — decimal *rounding* of rationals is not
    * (half-boundary cases like 15/32 flip between rounding algorithms). */
  def avgTokenLengthBp(text: Column): Column = {
    val n = tokenCount(text)
    ((length(text) - (n - 1)) * lit(10000.0) / n).cast("int")
  }

  /** Both stopword-marker counts from ONE [[graft.plans.TokenCounts]]
    * subtree, the same single-tokenization trick langId uses — per-word
    * `tokenOccurrences` calls each re-split the full text, and q27
    * evaluates stopwordRatioBp + qualityScoreBp in one projection, where
    * the shared deterministic subtree is eliminated to one pass. */
  private def stopCounts(text: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.plans.TokenCounts(
        org.apache.spark.sql.graft.ColumnShim.expression(text),
        Seq("the", "a")))

  /** Share of stopword tokens in basis points, truncated. */
  def stopwordRatioBp(text: Column): Column = {
    val c = stopCounts(text)
    val stop = element_at(c, 1) + element_at(c, 2)
    (stop * lit(10000.0) / tokenCount(text)).cast("int")
  }

  /** Count of characters outside [a-z0-9 ]. */
  def symbolCount(text: Column): Column =
    length(regexp_replace(text, "[a-z0-9 ]", ""))

  /** Toy quality score in basis points: length-window gate (×2 to stay
    * integral) × share of non-stopword tokens. */
  def qualityScoreBp(text: Column): Column = {
    val n = tokenCount(text)
    val c = stopCounts(text)
    val stop = element_at(c, 1) + element_at(c, 2)
    val gateX2 = when(n.between(20, 80), lit(2)).otherwise(lit(1))
    (gateX2 * (n - stop) * lit(10000.0) / (n * 2)).cast("int")
  }

  /** Stable whole-document fingerprint (cross-engine reproducible). */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** Polynomial rolling hash over tokens, reduced mod 1e9+7 at every step so
    * ANSI-mode long arithmetic can't overflow (Spark-side fingerprint;
    * xxhash64-seeded so not expressible in other engines — covered by
    * ScalaTest instead of an oracle). */
  def rollingHash(text: Column): Column = {
    val m = lit(1000000007L)
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * 31 + pmod(xxhash64(t), m), m))
  }

  /** MinHash signature: `numPerms` permutations approximated by re-hashing a
    * per-shingle base hash with the permutation index.
    *
    * Structured so each shingle STRING is hashed exactly once: the base-hash
    * array is the `aggregate` input collection (evaluated once — an
    * expression referenced inside a lambda body would be re-evaluated per
    * outer element, there is no let-binding in Catalyst), and the fold takes
    * element-wise minima over each shingle's permutation array. For a
    * non-empty shingle array the signature is null-free. */
  def minhashSignature(shingleArr: Column, numPerms: Int): Column =
    aggregate(
      transform(shingleArr, s => xxhash64(s)),
      array_repeat(lit(Long.MaxValue), numPerms),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(numPerms - 1)), p => xxhash64(h, p)),
        (a, b) => least(a, b)))
}
