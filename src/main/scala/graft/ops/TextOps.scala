package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All are
  * pure codegen'd column expressions — no UDFs, no shuffles; they run
  * embarrassingly parallel over however many partitions the scan
  * produced, which is exactly what you want at 100 TB.
  */
object TextOps {

  /** Whitespace tokenization (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of non-overlapping regex hits (codegen'd; used for
    * stopword / punctuation counting). */
  def patternHits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** BPE-style pre-tokenizer shape (GPT-2-ish): letter runs, single
    * digits, individual punctuation marks. Same regex dialect in Java
    * and RE2, so the DuckDB oracle reproduces it verbatim.
    */
  val bpePattern: String = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  def bpeTokenCount(text: Column): Column = patternHits(text, bpePattern)

  /** Language-ID heuristic: count language-marker stopwords, pick the
    * arg-max with a fixed priority order (en > es > de > fr) and
    * `unknown` when nothing matches. Deterministic and cheap — the
    * classic n-gram/stopword trick, good enough for corpus routing.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and)\\b",
    "es" -> "\\b(el|la|de|los)\\b",
    "de" -> "\\b(der|die|das|und)\\b",
    "fr" -> "\\b(le|la|et|les)\\b")

  def langPredict(text: Column): Column = {
    val scores = langMarkers.map { case (l, p) => l -> patternHits(text, p) }
    val Seq(en, es, de, fr) = scores.map(_._2)
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("unknown")
  }

  /** Quality score in [0,1]: length saturation × (1 − stopword ratio),
    * the shape of the usual heuristic pre-filters for LLM corpora.
    * Clamped at 0: regex stopword hits can exceed the whitespace token
    * count (e.g. "state-of-the-art" is 1 token but 2 hits).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val stop = patternHits(text, "\\b(the|a|of|and)\\b").cast("double")
    round(greatest(lit(0.0),
      least(toks / 100.0, lit(1.0)) * (lit(1.0) - stop / toks)), 4)
  }

  /** Document fingerprint: md5 of the whitespace-normalized lowercase
    * text — exact-dup detection key that survives cosmetic whitespace
    * and case drift.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** PII redaction patterns (ordered): email then phone. RE2-safe
    * constructs only, so the DuckDB oracle (RE2) and Spark (java.util
    * .regex) agree; replace-ALL on both sides (DuckDB needs the 'g'
    * flag).
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?[0-9][0-9-]{6,}[0-9]" -> "<PHONE>")

  /** Redact PII in order — the corpus-scrubbing pass every published
    * training pipeline runs before anything else.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }

  /** Hash a token into [0, buckets) by its first 32 md5 bits —
    * hashed features (the "hashing trick"): the model stays a
    * FIXED-SIZE weight vector no matter how large the live
    * vocabulary grows, which is what makes linear quality models
    * shippable against a 100 TB corpus.
    */
  def tokenBucket(t: Column, buckets: Int): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long") % buckets

  /** Deterministic INTEGER weight table for a hashed linear model:
    * w(b) = first-32-md5-bits("w,b") mod 2001 − 1000 ∈ [−1000, 1000].
    * The md5 derivation stands in for trained parameters (this
    * container ships no trainer) so the full scoring path — hashing,
    * lookup, accumulation, link function, decision — is exactly
    * reproducible by the DuckDB oracle; swapping in real fasttext
    * weights changes only this frame. Integer weights keep the
    * accumulation EXACT (no float-sum order sensitivity).
    */
  def hashedModel(spark: org.apache.spark.sql.SparkSession,
      buckets: Int): org.apache.spark.sql.DataFrame =
    spark.range(buckets).toDF("b").select(col("b"),
      (conv(substring(md5(concat(lit("w,"), col("b").cast("string"))),
        1, 8), 16, 10).cast("long") % 2001 - 1000).as("wv"))

  /** Fasttext-shaped document quality classifier over hashed token
    * features: tokens bucket MAP-SIDE, the buckets-row weight vector
    * broadcasts (a real model is a few MB — always broadcastable),
    * and each doc reduces to ONE exact integer sum through the
    * single (doc-keyed, map-side-combined) shuffle. The 6-decimal
    * score is computed ENTIRELY in integer micro-units —
    * half-away-from-zero of the exact rational sw·1000/n via integer
    * div — then divided by the exact constant 1e6, because
    * `round(double, 6)` straddling an exact .5 boundary (e.g.
    * sw=24042, n=96 → 0.2504375) is where Spark's BigDecimal HALF_UP
    * and DuckDB's double rounding disagree. prob = sigmoid of that
    * identical double, rounded to 6 (the one libm call); keep
    * decided on the EXACT integer sum, never on a float boundary.
    * Emits (id, n_tokens, score, prob, keep).
    */
  def qualityClassify(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      buckets: Int): org.apache.spark.sql.DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val model = hashedModel(docs.sparkSession, buckets)
    docs.select(col(idCol), explode(tokens(col(textCol))).as("_t"))
      .select(col(idCol), tokenBucket(col("_t"), buckets).as("b"))
      .join(broadcast(model), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("wv").as("_sw"))
      .withColumn("_micro", when(col("_sw") >= 0,
          expr("(_sw * 2000 + n_tokens) div (2 * n_tokens)"))
        .otherwise(-expr("((-_sw) * 2000 + n_tokens) div (2 * n_tokens)")))
      .withColumn("score", col("_micro") / 1000000.0)
      .select(col(idCol), col("n_tokens"), col("score"),
        round(lit(1.0) / (lit(1.0) + exp(-col("score"))), 6).as("prob"),
        (col("_sw") >= 0).as("keep"))
  }

  /** Winnowing fingerprints (the MOSS selection scheme): hash every
    * k-char-gram, slide a window of w hashes, keep each window's
    * minimum — any shared substring of length ≥ w+k−1 between two docs
    * is guaranteed to share a fingerprint. Emits one (id, fp) row per
    * DISTINCT selected fingerprint.
    *
    * Hashes are md5-hex so the DuckDB oracle reproduces the selection
    * verbatim (a rolling polynomial hash is the O(n) optimization of
    * the same selection — semantics identical). Typed mapPartitions
    * per the hot-path rule (see Dedup.shingleRows); char-indexed, so
    * supplementary-plane text would diverge from DuckDB's
    * codepoint-indexed substr — fine for this corpus, documented.
    */
  def winnowRows(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 8, w: Int = 4): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val par = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .repartition(par) // single-split sources → parallel gram hashing
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexFmt = java.util.HexFormat.of()
        def hex(b: Array[Byte]): String = hexFmt.formatHex(b)
        rows.flatMap { case (id, text) =>
          if (text == null || text.length < k) Iterator.empty
          else {
            val hs = (0 to text.length - k).map { i =>
              md.reset()
              hex(md.digest(text.substring(i, i + k)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            }
            if (hs.length < w) Iterator.empty
            else (0 to hs.length - w).iterator
              .map(j => hs.slice(j, j + w).min)
              .toSet.iterator.map((fp: String) => (id, fp))
          }
        }
      }.toDF(idCol, "fp")
  }

  /** Gopher-style n-gram repetition stats, one row per doc:
    * (id, group, n_chars, top2_chars, dup3_chars) where
    * `top2_chars` = count·len of the MOST FREQUENT word-2-gram (the
    * "characters in the most frequent n-gram" signal; ties on count
    * resolve to the longest tied gram, so the value is
    * max(count)·max(len among top-count grams) — deterministic in
    * both engines) and
    * `dup3_chars` = Σ over word-3-grams with count>1 of
    * count·len(gram) (the "characters in duplicated n-grams"
    * signal). Both numerators are EXACT integers — downstream flags
    * compare `k·numerator > n_chars` so no float boundary ever
    * decides a flag. Counting each doc's gram multiset is
    * partition-local (the doc is the unit) and runs as the
    * codegen'd [[graft.functions.RepetitionStats]] expression — one
    * static call per row INSIDE whole-stage codegen, no Dataset
    * encoder ser/de, no DeserializeToObject stage break (this was
    * the batch tier's last typed-lambda kernel). Lengths count CODE
    * POINTS, agreeing with the DuckDB oracle's `length()` on
    * supplementary-plane text where the old kernel's UTF-16 count
    * diverged. Zero shuffles here; the caller's per-group rollup is
    * the only exchange. Null text coalesces to "" (same zero row
    * the typed kernel emitted).
    */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      groupCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).cast("long").as(idCol), col(groupCol),
        graft.functions.RepetitionStats(
          coalesce(col(textCol), lit(""))).as("_rs"))
      .select(col(idCol), col(groupCol),
        col("_rs.n_chars").as("n_chars"),
        col("_rs.top2_chars").as("top2_chars"),
        col("_rs.dup3_chars").as("dup3_chars"))

  /** Non-overlapping `w`-word chunks with their 0-based index — the
    * unit of chunk-level (paragraph-style) dedup: (id, idx, md5(chunk
    * text)). The trailing partial chunk is kept. Typed mapPartitions
    * per the hot-path rule (Dedup.shingleRows); md5-hex so the DuckDB
    * oracle reproduces every fingerprint.
    */
  def chunkRows(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, w: Int = 8): org.apache.spark.sql.DataFrame = {
    require(w >= 1, "chunk width must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val par = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .repartition(par)
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexFmt = java.util.HexFormat.of()
        rows.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val t = text.split(' ')
            (0 until (t.length + w - 1) / w).iterator.map { i =>
              val chunk = t.slice(i * w, (i + 1) * w).mkString(" ")
              md.reset()
              (id, i, hexFmt.formatHex(md.digest(
                chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
            }
          }
        }
      }.toDF(idCol, "idx", "fp")
  }

  /** Content-defined chunking (Rabin/FastCDC family): a chunk
    * boundary falls AFTER character position i whenever the
    * polynomial hash of the trailing `window` characters —
    * S(i) = Σⱼ 31^j·c(i−j), j = 0..window−1, kept EXACT in a long
    * for ANY UTF-16 code unit (c ≤ 0xFFFF: max S = 0xFFFF·(31^w−1)/30
    * < 2^63 for w ≤ 10, no modulus) — satisfies S(i) % divisor = 0.
    * Content decides the cuts, so an insertion re-syncs within one
    * window and every following chunk still dedups, where fixed-size
    * chunking (chunkRows) shifts every later boundary. Output one row
    * per chunk: (id, idx, start, length, fp = md5 of the chunk text).
    *
    * The hash is recomputable STATELESSLY per position (exact sum, no
    * rolling state), which is what lets the q115 oracle re-derive
    * every boundary in SQL. The kernel itself rolls in O(n). A
    * production variant adds min/max chunk-size guards (stateful,
    * same partition-local kernel — guards left out here to keep cut
    * positions a pure function of content).
    *
    * Unicode contract: the kernel rolls over UTF-16 CODE UNITS
    * (`charAt`), so cut positions agree with a codepoint-based oracle
    * (DuckDB `ord`/`substr`, q115) for text in the Basic Multilingual
    * Plane; supplementary-plane characters hash as two surrogate
    * units and would shift boundaries relative to a codepoint walk.
    */
  def cdcChunkRows(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, window: Int = 8,
      divisor: Int = 64): org.apache.spark.sql.DataFrame = {
    // 0xFFFF·(31^10−1)/30 ≈ 1.8e18 < 2^63 — exact for all code units
    require(window >= 2 && window <= 10, "window in [2,10] keeps S exact")
    require(divisor >= 2, "divisor >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val par = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val topCoef = (0 until window - 1).foldLeft(1L)((a, _) => a * 31L)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .repartition(par)
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexFmt = java.util.HexFormat.of()
        rows.flatMap { case (id, text) =>
          if (text == null || text.isEmpty) Iterator.empty
          else {
            val n = text.length
            val ends = Seq.newBuilder[Int]
            var s = 0L
            var p = 0
            while (p < n) {
              s = if (p < window) s * 31L + text.charAt(p).toLong
                  else (s - topCoef * text.charAt(p - window).toLong) *
                    31L + text.charAt(p).toLong
              if (p >= window - 1 && s % divisor == 0) ends += (p + 1)
              p += 1
            }
            val e0 = ends.result()
            val e = if (e0.nonEmpty && e0.last == n) e0 else e0 :+ n
            val starts = 0 +: e.init
            starts.zip(e).zipWithIndex.iterator.map {
              case ((a, b), i) =>
                md.reset()
                (id, i, a, b - a, hexFmt.formatHex(md.digest(
                  text.substring(a, b).getBytes(
                    java.nio.charset.StandardCharsets.UTF_8))))
            }
          }
        }
      }.toDF(idCol, "idx", "start", "length", "fp")
  }

  /** The BM25 scoring kernel over PRE-DERIVED frames — ONE
    * definition shared by the from-corpus path (q75's
    * `bm25Scores`) and the stored-index path
    * ([[TextIndexStore.bm25]]), so the two can never drift: `tf` is
    * (idCol, token, tf) restricted to the query terms, `dl` is
    * (idCol, dl), `stats` is the one-row (_n, _avgdl). Robertson idf
    * with the +1 floor computed from tf's per-term doc counts;
    * per-term contributions pivot into COLUMNS and sum in a fixed
    * order (a row-wise SUM's addition order is engine-scheduled);
    * contributions round to 6, the score to 4 — the q75 oracle
    * discipline. Emits (idCol, score).
    */
  def bm25ScoreFrames(tf: org.apache.spark.sql.DataFrame,
      dl: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame,
      idCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame =
    bm25ScoreWithIdf(tf, dl, stats, bm25Idf(tf, stats), idCol, terms,
      k1, b)

  /** Robertson idf (+1 floor) per token from `tf`'s per-term doc
    * counts — (token, idf). Split out of [[bm25ScoreFrames]] so a
    * FILTERED serve ([[TextIndexStore.bm25Filtered]]) can compute
    * idf over the CORPUS-WIDE term probe and score only the allowed
    * docs' rows: df is a collection statistic, and the frozen-models
    * contract (q166's) says a mask restricts the candidate set, not
    * the model.
    */
  def bm25Idf(tf: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    bm25IdfOfDf(tf.groupBy("token").agg(count(lit(1)).as("df")), stats)

  /** The idf arithmetic alone, from a pre-computed (token, df) frame
    * — split from [[bm25Idf]] so [[TextIndexStore.bm25TopK]] can
    * feed df from the stored per-file postings metadata (no probe
    * scan) while keeping the EXACT Spark expression and rounding the
    * scoring kernel uses (a driver-side reimplementation would risk
    * a last-ulp divergence from `round(log(...), 6)`).
    */
  def bm25IdfOfDf(df: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.crossJoin(broadcast(stats))
      .select(col("token"),
        round(log((col("_n") - col("df") + 0.5) / (col("df") + 0.5) + 1), 6)
          .as("idf"))

  /** [[bm25ScoreFrames]]' scoring half with the idf frame supplied
    * by the caller — the kernel still lives ONCE; the split only
    * decides which tf population the statistic is computed from.
    */
  def bm25ScoreWithIdf(tf: org.apache.spark.sql.DataFrame,
      dl: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame,
      idf: org.apache.spark.sql.DataFrame,
      idCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    val contrib = tf.join(broadcast(idf), "token")
      .join(dl, idCol).crossJoin(broadcast(stats))
      .select(col(idCol), col("token"),
        round(col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("dl") / col("_avgdl"))), 6)
          .as("c"))
    // pivot columns are named POSITIONALLY (c_0..c_n) — embedding
    // the raw token in the name would break col() resolution for
    // terms containing '.', '`' etc., reachable through the public
    // TextIndexStore.bm25(terms) surface
    val termCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("token") === t, col("c"))), lit(0d))
        .as(s"c_$i")
    }
    contrib.groupBy(idCol)
      .agg(termCols.head, termCols.tail: _*)
      .select(col(idCol),
        round(terms.indices.map(i => col(s"c_$i")).reduce(_ + _), 4)
          .as("score"))
  }
}
