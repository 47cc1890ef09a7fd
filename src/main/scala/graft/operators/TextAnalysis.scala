package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting (whitespace + regex "BPE-ish"),
  * quality scoring, heuristic language ID, and rolling-hash document
  * fingerprints. All pure Catalyst expressions (split / regexp /
  * higher-order functions) — map-only stages, no shuffle except the
  * final orderBy; linear scaling to 100 TB.
  *
  * Determinism: ratios are small-int divisions (deterministic IEEE);
  * the fingerprint uses md5-derived token ints folded left-to-right
  * with modular arithmetic — bit-identical in the DuckDB oracle.
  */
object TextAnalysis {

  /** THE tokenizer of record — shared with Pipeline/Sampling so the
    * rule can never drift between token counts and text operators.
    */
  private[operators] def toks: Column = split(col("text"), " ")

  /** English-ish stopwords present in the corpus vocabulary. */
  private val StopWords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Token counting: whitespace tokens vs regex tokens (a BPE-ish
    * word/digit/punct split) plus a char-count sanity column.
    */
  def tokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(toks).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).as("n_re_tokens"),
        length(col("text")).as("n_chars"))
      .orderBy("doc_id")

  /** Quality scoring: distinct-token ratio, stopword ratio, mean token
    * length; score = 0.5·distinct_ratio + 0.3·(1−stopword_ratio)
    * + 0.2·min(avg_len/8, 1). The exact formula is this engine's
    * definition (the reference has no text ops); the oracle recomputes it.
    */
  def qualityScore(s: SparkSession, d: String): DataFrame = {
    val n = size(toks).cast("double")
    val stopArr = array(StopWords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast("double")
    val nDistinct = size(array_distinct(toks)).cast("double")
    // sum of token lengths = chars - separators
    val sumLen = (length(col("text")) - (size(toks) - lit(1))).cast("double")
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        (nDistinct / n).as("distinct_ratio"),
        (nStop / n).as("stopword_ratio"),
        (sumLen / n).as("avg_token_len"),
        (lit(0.5) * (nDistinct / n) + lit(0.3) * (lit(1.0) - nStop / n) +
          lit(0.2) * least(sumLen / n / lit(8.0), lit(1.0))).as("quality"))
      .orderBy("doc_id")
  }

  /** Model-based quality filtering — the fasttext-style linear
    * classifier gate a large training-data pipeline runs after the
    * heuristic filters (t2/t11): margin = w·x + b over engineered
    * features, keep = margin ≥ 0. The "trained" weights are fixed
    * literals riding the codegen'd projection (a real deployment
    * broadcasts them identically — weights are KBs, corpora are TBs),
    * so inference is map-only: the corpus never shuffles, linear at
    * 100 TB. Determinism end to end: each ratio feature is quantized
    * to integer micro-units with ONE IEEE division + round (the
    * labelCentroids trick), the margin is exact BIGINT arithmetic
    * (the keep decision can never flip across engines — even an
    * exactly-zero margin is exact), and the reported score squashes
    * the margin through the rational m/(1e6+|m|) — one more division,
    * no transcendental sigmoid (whose libm rounding differs between
    * engines).
    */
  def qualityModel(s: SparkSession, d: String): DataFrame = {
    val n = size(toks).cast("long")
    val stopArr = array(StopWords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast("long")
    val nDist = size(array_distinct(toks)).cast("long")
    val sumLen = (length(col("text")) - (size(toks) - lit(1))).cast("long")
    val x1 = round(lit(1000000.0) * nDist / n).cast("long")  // distinct ratio
    val x2 = round(lit(1000000.0) * nStop / n).cast("long")  // stopword ratio
    val x3 = round(lit(1000000.0) * sumLen / n / lit(8.0)).cast("long") // len/8
    // w = (+3, −2, +1) on the micro features, +800 per token,
    // bias −1.9e6 — centered near the corpus median so the gate is a
    // real split (~47% keep), not a rubber stamp
    val margin = lit(3L) * x1 - lit(2L) * x2 + x3 + lit(800L) * n -
      lit(1900000L)
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        x1.as("x_distinct"), x2.as("x_stopword"), x3.as("x_len"),
        n.as("n_tokens"),
        margin.as("margin_micro"),
        round(margin.cast("double") /
          (lit(1000000.0) + abs(margin).cast("double")), 6).as("score6"),
        (margin >= 0L).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** Heuristic language ID: score = marker-token hits per language,
    * argmax with a fixed priority tie-break (en > de > es > fr > zh,
    * 'und' when nothing matches). N-gram/stopword LangID is standard for
    * pipeline pre-filtering; markers here match the synthetic corpus
    * vocabulary so the operator exercises real code paths.
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "and", "of"),
      "de" -> Seq("der", "die", "und", "das"),
      "es" -> Seq("el", "la", "los", "que"),
      "fr" -> Seq("le", "les", "des", "une"),
      "zh" -> Seq("de5", "shi4", "le5", "zai4"))
    def score(ws: Seq[String]): Column =
      size(filter(toks, t => array_contains(array(ws.map(lit): _*), t)))
    val scored = Tables.documents(s, d)
      .select(col("doc_id") +: markers.map { case (l, ws) => score(ws).as(s"s_$l") }: _*)
    // argmax with priority tie-break: first lang (in declared order) whose
    // score equals the row max and is > 0
    val maxScore = greatest(markers.map { case (l, _) => col(s"s_$l") }: _*)
    val pick = markers.reverse.foldLeft(lit("und")) { case (acc, (l, _)) =>
      when(col(s"s_$l") === maxScore && maxScore > 0, lit(l)).otherwise(acc)
    }
    scored
      .withColumn("lang_pred", pick)
      .select("doc_id", "s_en", "s_de", "s_es", "s_fr", "s_zh", "lang_pred")
      .orderBy("doc_id")
  }

  /** Sliding-window chunking: split each document's token stream into
    * fixed-size overlapping chunks — the sequence-prep step before
    * training/embedding (context windows with overlap so no boundary
    * information is lost). Pure per-row generator (explode over chunk
    * starts + array slice): map-only, no shuffle except the
    * presentation sort; chunk boundaries depend only on the row, so
    * the operator is embarrassingly parallel at any corpus size.
    */
  def chunk(s: SparkSession, d: String, chunkSize: Int = 64,
            overlap: Int = 16): DataFrame = {
    require(overlap < chunkSize, "overlap must be smaller than the chunk")
    val stride = chunkSize - overlap
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")), lit(stride))).as("start"))
      // a trailing start within `overlap` of the end yields a chunk the
      // previous chunk already covers ENTIRELY (prev start + chunkSize
      // − 1 ≥ n ⟺ start > n − overlap) — emitting it would hand a
      // training pipeline duplicated samples for ~overlap/stride of
      // documents; the first chunk always survives
      .filter(col("start") === 1 ||
        col("start") <= size(col("w")) - overlap)
      .select(col("doc_id"),
        // starts are 1, 1+stride, 2·stride+1, …: (start-1)/stride is an
        // exact integral double, so the int cast is rounding-mode-proof
        ((col("start") - 1) / stride).cast("int").as("chunk_idx"),
        slice(col("w"), col("start"), lit(chunkSize)).as("chunk"))
      .select(
        col("doc_id"), col("chunk_idx"),
        size(col("chunk")).as("n_tokens"),
        element_at(col("chunk"), 1).as("first_token"),
        element_at(col("chunk"), -1).as("last_token"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Vocabulary build: top-K tokens by document frequency (df = docs
    * containing the token; cf = total occurrences). The tokenizer-prep
    * step of a text pipeline. Two partial-aggregated shuffles of
    * (token) keys — never a collect; top-K via TakeOrderedAndProject.
    * Deterministic: ties break on the token string.
    */
  def vocab(s: SparkSession, d: String, k: Int = 50): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("tok")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("cf"))
      .orderBy(desc("df"), desc("cf"), asc("tok"))
      .limit(k)

  /** Repetition profile (Gopher-style quality signal): each document's
    * most frequent token and the fraction of the document it occupies.
    * High top_ratio flags degenerate/boilerplate text for pipeline
    * filtering. Shape: explode → (doc, token) count → per-doc argmax
    * via row_number (tie-break: lexicographically smallest token).
    * The window partitions by doc_id — groups are document-sized, so
    * no skew at any corpus scale.
    */
  def repetition(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("cnt"))
    val perDoc = Window.partitionBy("doc_id")
    val argmax = perDoc.orderBy(desc("cnt"), asc("tok"))
    cnt
      .withColumn("n_tokens", sum("cnt").over(perDoc))
      .withColumn("rn", row_number().over(argmax))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"),
        col("tok").as("top_token"),
        col("cnt").as("top_count"),
        col("n_tokens"),
        (col("cnt") / col("n_tokens").cast("double")).as("top_ratio"))
      .orderBy("doc_id")
  }

  /** Per-source length-distribution profile: doc counts and exact
    * interpolated length percentiles (p50/p95) — the corpus-curation
    * report that decides per-source length filters. Exact `percentile`
    * (same interpolation as DuckDB's percentile_cont, like the log
    * fact's p95): the per-group buffer is bounded by the docs of one
    * source. At larger cardinality switch to percentile_approx —
    * mergeable constant-size sketch state (see StreamingHourly for the
    * same trade).
    */
  def lengthStats(s: SparkSession, d: String): DataFrame = {
    val n = size(toks)
    Tables.documents(s, d)
      .select(col("source"), col("n_chars"), n.as("n_tokens"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        min("n_tokens").as("min_tokens"),
        expr("percentile(n_tokens, 0.5)").as("p50_tokens"),
        expr("percentile(n_tokens, 0.95)").as("p95_tokens"),
        max("n_tokens").as("max_tokens"),
        sum("n_chars").as("total_chars"))
      .orderBy("source")
  }

  /** Rolling-hash document fingerprint: token → 48-bit md5 prefix int,
    * folded left-to-right as h = (h·131 + tok) mod 1e9+7. Order-sensitive
    * (unlike a bag-of-words hash) — a token swap changes the fingerprint.
    */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        aggregate(
          transform(toks,
            t => conv(substring(md5(t), 1, 12), 16, 10).cast("long")),
          lit(0L),
          (acc, x) => (acc * 131L + x) % 1000000007L).as("fingerprint"))
      .orderBy("doc_id")

  /** TF-IDF term weighting: each document's top-K terms by tf·idf.
    * idf here is the LINEAR inverse document frequency N/df (not
    * log(N/df)): the score tf·N/df is then one exact integer product
    * followed by one correctly-rounded IEEE division — bit-identical in
    * any engine — where a log-based idf would hang the oracle compare
    * on libm-vs-JVM last-ulp drift. Ranking quality is unaffected (the
    * map x→log x is monotone, so per-document order differs only where
    * log-ties would, and the tok tie-break pins those).
    *
    * Shape at scale: explode → (doc,tok) partial-agg count (tf) →
    * token-keyed df agg joined back on tok (token vocabulary ≪ corpus,
    * so the df side is broadcast-able) → per-doc window top-K. No
    * collect, no cartesian; the window partitions by doc_id — groups
    * are document-sized, so no skew.
    */
  def tfidf(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    // corpus size as a 1-row broadcast frame — no driver-side action
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        (col("tf") * col("n_docs")).cast("double") / col("df"))
    val rank = Window.partitionBy("doc_id")
      .orderBy(desc("tfidf"), asc("tok"))
    scored
      .withColumn("rank", row_number().over(rank).cast("int"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "tok", "tf", "df", "tfidf")
      .orderBy("doc_id", "rank")
  }

  /** BM25 retrieval ranking over a fixed query-term set — the search
    * serving twin of [[tfidf]]'s per-doc keywords: every document is
    * scored against the query and the global top-k returned. Same
    * oracle-determinism discipline as t9: the idf term is the LINEAR
    * N/df (a log idf is non-correctly-rounded and engine-divergent —
    * the one transcendental this engine keeps out of every hash-
    * compared value), and the saturation term keeps k1/b as exact
    * decimal literals with dl/avgdl expanded to the rational
    * dl·N/total_tokens — one double division per factor, same
    * evaluation order both engines, bit-identical results. Scale
    * shape: tf rows for the query terms only (a semi-join on a
    * 3-term broadcast), score is map-side arithmetic, and the top-k
    * is a TakeOrdered — no global sort.
    */
  def t15Bm25(s: SparkSession, d: String,
              terms: Seq[String] = Seq("query", "window", "merge"),
              k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val totals = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks)).as("total_tokens"))
    val dl = docs.select(col("doc_id"), size(toks).cast("long").as("dl"))
    val tf = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      // BM25 with linear idf: (N/df) * tf*(k1+1) / (tf + k1*(1-b + b*dl*N/total))
      .withColumn("term_score",
        (col("n_docs").cast("double") / col("df")) *
          (col("tf") * lit(2.2)).cast("double") /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) *
              (col("dl") * col("n_docs")).cast("double") / col("total_tokens"))))
    // per-doc total in FIXED term order: a plain sum(double) adds in
    // partition-arrival order (non-deterministic across engines); one
    // exact single-row value per term (max of the unique (doc,term)
    // score) added left-to-right is bit-identical everywhere
    val perTerm = terms.distinct.map(t =>
      coalesce(max(when(col("tok") === t, col("term_score"))), lit(0.0)))
    val w = Window.orderBy(desc("score"), asc("doc_id"))
    scored
      .groupBy("doc_id")
      .agg(perTerm.reduce(_ + _).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k) // TakeOrdered — no global sort, no single-partition window
      .withColumn("rank", row_number().over(w).cast("int"))
      .select("rank", "doc_id", "n_terms_hit", "score")
      .orderBy("rank")
  }

  /** Composite quality filter (C4/Gopher-style): five independent
    * per-document rules — token-count bounds, mean-word-length bounds,
    * stopword presence, distinct-token ratio, digit-character ratio —
    * each reported as its own flag so curation can audit WHY a document
    * was dropped, plus the combined keep decision. All rules are pure
    * row-local expressions: the filter is map-only and embarrassingly
    * parallel at any corpus size (this is the shape of the C4 cleanup
    * and the Gopher quality rules — cheap rule cascades run before any
    * expensive dedup/model scoring).
    */
  /** The five quality rules as named Columns over a `text` column —
    * exposed so composers ([[graft.operators.Pipeline]]) can evaluate
    * the cascade MAP-SIDE on their own scan instead of joining this
    * operator's output back to the corpus (one scan, zero shuffle, at
    * any scale). The same expressions back [[qualityFilter]], so the
    * rule set cannot diverge between the audit view and the pipeline.
    */
  private[operators] object QualityRules {
    private val n = size(toks)
    private val nD = n.cast("double")
    private val stopArr = array(StopWords.map(lit): _*)
    private val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    private val nDistinct = size(array_distinct(toks))
    private val sumLen = (length(col("text")) - (n - lit(1))).cast("double")
    private val nDigits = length(regexp_replace(col("text"), "[^0-9]", ""))
    val nTokens: Column = n
    val okLen: Column = n.between(15, 90)
    val okWordLen: Column = (sumLen / nD).between(3.0, 9.0)
    val okStop: Column = nStop > 0
    val okDistinct: Column = nDistinct.cast("double") / nD >= 0.3
    val okDigit: Column = nDigits.cast("double") / length(col("text")) <= 0.2
    val keep: Column = okLen && okWordLen && okStop && okDistinct && okDigit
  }

  def qualityFilter(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        QualityRules.nTokens.as("n_tokens"),
        QualityRules.okLen.as("ok_len"),
        QualityRules.okWordLen.as("ok_word_len"),
        QualityRules.okStop.as("ok_stop"),
        QualityRules.okDistinct.as("ok_distinct"),
        QualityRules.okDigit.as("ok_digit"),
        QualityRules.keep.as("keep"))
      .orderBy("doc_id")

  /** Corpus bigram statistics: top-K adjacent token pairs by total
    * count (with document frequency) — the n-gram LM / phrase-mining
    * counting step. Pairs come from posexplode + lead() over the
    * per-document token position (the same codegen'd shape as
    * Dedup.hashedShingles — no higher-order lambda re-scanning the
    * array per element), then ONE partial-aggregated shuffle of
    * (bigram) keys and a TakeOrderedAndProject top-K. The per-doc
    * window partitions by doc_id — groups are document-sized, no skew;
    * the bigram agg carries bounded partials, never the pair stream.
    */
  /** The (doc_id, bigram) occurrence stream — the corpus-wide explode
    * + per-doc lead window that is the dominant cost of every bigram
    * operator; built ONCE and shared (see [[bigramHitRate]]).
    */
  private def bigramStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
      .withColumn("nxt", lead("tok", 1).over(byPos))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat(col("tok"), lit(" "), col("nxt")).as("bigram"))
  }

  private def topBigrams(stream: DataFrame, k: Int): DataFrame =
    stream
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"), countDistinct("doc_id").as("df"))
      .orderBy(desc("cnt"), desc("df"), asc("bigram"))
      .limit(k)

  def bigrams(s: SparkSession, d: String, k: Int = 40): DataFrame =
    topBigrams(bigramStream(s, d), k)

  /** Corpus-LM document scoring: the fraction of each document's
    * bigram occurrences found in the corpus top-K bigram list — the
    * cheap statistical stand-in for model-based perplexity filtering
    * (a document whose word pairs never match the corpus's dominant
    * phrases is noise, boilerplate, or another language). The top-K
    * list is BOUNDED (k rows) and broadcast, so scoring is one
    * map-side probe + a per-document partial aggregation; the window
    * and the groupBy share the doc_id partitioning. Tie-break on the
    * top-K boundary is (cnt, df, bigram) — deterministic both engines.
    */
  def bigramHitRate(s: SparkSession, d: String, k: Int = 40): DataFrame = {
    // the explode+window stream feeds BOTH the top-K build and the
    // probe side — materialized once instead of paying the corpus-wide
    // shuffle twice (Catalyst does not reuse it across the two scans)
    val stream = Checkpoints.persistFrame(bigramStream(s, d))
    val top = broadcast(topBigrams(stream, k)
      .select(col("bigram"), lit(1).as("in_top")))
    stream
      .join(top, Seq("bigram"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("in_top"), lit(0))).as("n_hits"))
      .select(col("doc_id"), col("n_bigrams"), col("n_hits"),
        (col("n_hits") / col("n_bigrams")).as("hit_rate"))
      .orderBy("doc_id")
  }

  /** PII redaction: scrub email addresses and phone numbers from text,
    * reporting per-document match counts and an md5 of the redacted
    * body (narrow hash instead of re-shuffling whole documents for the
    * compare). The corpus is synthetic and PII-free by construction, so
    * the operator is exercised against text with PII appended
    * deterministically from the row (doc_id-derived address + number) —
    * the redactor sees real positives AND the original body as a
    * false-positive control; the oracle recomputes the identical
    * injection. Map-only at any scale.
    */
  def piiRedact(s: SparkSession, d: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val withPii = concat(
      col("text"), lit(" reach user"), col("doc_id"),
      lit("@example.com or +1-555-"), lpad(col("doc_id").cast("string"), 4, "0"))
    val redacted = regexp_replace(
      regexp_replace(withPii, emailRe, "[EMAIL]"), phoneRe, "[PHONE]")
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(regexp_extract_all(withPii, lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(withPii, lit(phoneRe), lit(0))).as("n_phones"),
        md5(redacted).as("redacted_md5"))
      .orderBy("doc_id")
  }

  /** Corpus-frequency profile per document — the language-model-free
    * perplexity proxy: documents whose tokens are corpus-rare score as
    * unusual (specialist or garbage), all-common documents as
    * boilerplate. Per doc over its DISTINCT tokens: mean document
    * frequency, rare-token ratio (df ≤ rareDf) and hapax ratio
    * (df = 1). All-integer aggregation (mean = one exact-int division
    * at the end) — no transcendental log whose last ulp could differ
    * between engines, which is why this proxy is hash-checkable and a
    * log-prob one is not.
    *
    * Shape: distinct (doc, token) → token-keyed join against the df
    * table built from the same frame → per-doc partial aggregation.
    * The df table is token-keyed (never collected/broadcast: at corpus
    * scale the vocabulary is large, the JOIN key is the token hash) and
    * the per-doc groups are document-sized — both shuffles bounded,
    * linear at 100 TB.
    */
  def tokenFreqScore(s: SparkSession, d: String, rareDf: Int = 2): DataFrame = {
    val docTok = Tables.documents(s, d)
      .select(col("doc_id"), explode(array_distinct(toks)).as("tok"))
    val df = docTok.groupBy("tok").agg(count(lit(1)).as("df"))
    docTok.join(df, "tok")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_distinct"),
        sum("df").as("df_sum"),
        sum(when(col("df") <= rareDf, 1L).otherwise(0L)).as("n_rare"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(
        col("doc_id"), col("n_distinct"),
        (col("df_sum").cast("double") / col("n_distinct")).as("mean_df"),
        (col("n_rare").cast("double") / col("n_distinct")).as("rare_ratio"),
        (col("n_hapax").cast("double") / col("n_distinct")).as("hapax_ratio"))
      .orderBy("doc_id")
  }
}
