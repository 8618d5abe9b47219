package graft.operators

import graft.sources.Checkpoints.BarrierOps
import graft.{QueryDef, Tables}
import graft.functions.HashFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (extension suite):
  * language ID, quality scoring, token counting, document fingerprinting.
  * All are per-row maps over the scan (no shuffle) except the explicit
  * token-histogram aggregation — exactly what a 100 TB text pipeline wants.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** Stopword profiles for the n-gram/stopword language-ID heuristic. */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit",
      "auf", "für"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pas", "pour",
      "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "no", "por", "en"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  /** Language ID: score = stopword hits per profile, argmax wins (ties
    * break by profile order en,de,fr,es,zh). Deterministic; accuracy on
    * real multilingual text asserted in TextSpec fixtures. */
  val langId: QueryDef = QueryDef(
    "x_text_langid",
    (s, dir) => {
      val toks = docs(s, dir)
        .withColumn("toks", split(lower(col("text")), " "))
      val scored = profiles.foldLeft(toks) { case (df, (lang, words)) =>
        df.withColumn(s"score_$lang",
          size(expr(s"filter(toks, t -> array_contains(" +
            s"array(${words.map(w => s"'$w'").mkString(",")}), t))")))
      }
      // ties break by profile priority (en > de > fr > es > zh): greatest()
      // compares structs field-by-field, so priority must be the second
      // field — comparing lang strings directly would hand every tie to 'zh'
      val priority = Seq("en", "de", "fr", "es", "zh").reverse.zipWithIndex.toMap
      val best = profiles.keys.toSeq.map(l =>
        struct(col(s"score_$l").as("score"),
          lit(priority(l)).as("prio"), lit(l).as("lang")))
      scored
        .withColumn("best", greatest(best: _*))
        .select(col("doc_id"), col("lang").as("label"),
          col("best.lang").as("pred_lang"),
          col("best.score").as("pred_score"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, lang AS label,
                        string_split(lower(text), ' ') AS toks
                 FROM documents),
      s AS (SELECT doc_id, label,
        len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it','that','for'))) AS s_en,
        len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein','nicht','mit','auf','für'))) AS s_de,
        len(list_filter(toks, t -> t IN ('le','la','les','et','est','un','une','pas','pour','dans'))) AS s_fr,
        len(list_filter(toks, t -> t IN ('el','la','los','y','es','un','una','no','por','en'))) AS s_es,
        len(list_filter(toks, t -> t IN ('的','是','了','在','我','有','和','不','人','这'))) AS s_zh
      FROM t)
      SELECT doc_id, label,
        CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
             WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
             WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS pred_lang,
        CAST(greatest(s_en, s_de, s_fr, s_es, s_zh) AS INTEGER) AS pred_score
      FROM s ORDER BY doc_id""")
  )

  /** Quality scoring: length / token / punctuation / stopword / digit
    * ratios + a composite score. Formula-identical oracle. */
  val quality: QueryDef = QueryDef(
    "x_text_quality",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          col("n_tokens"),
          ((length(col("text")) - (col("n_tokens") - 1)).cast("double") /
            col("n_tokens")).as("avg_token_len"),
          (size(expr("filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to'))"))
            .cast("double") / col("n_tokens")).as("stopword_ratio"),
          (size(expr("filter(toks, t -> t rlike '^[0-9]+$')")).cast("double") /
            col("n_tokens")).as("digit_token_ratio"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[.,!?;:]", "")))
            .as("n_punct"))
        .withColumn("quality_score",
          when(col("n_tokens") >= 20 && col("avg_token_len").between(3, 10) &&
            col("stopword_ratio") > 0.02, 1.0).otherwise(0.0))
        .orderBy(col("doc_id")),
    oracle = Some("""
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
                        len(string_split(text, ' ')) AS n_tokens
                 FROM documents)
      SELECT doc_id,
             length(text) AS n_chars,
             n_tokens,
             CAST(length(text) - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
             CAST(len(list_filter(toks,
               t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
               / n_tokens AS stopword_ratio,
             CAST(len(list_filter(toks,
               t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE)
               / n_tokens AS digit_token_ratio,
             length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
               AS n_punct,
             CAST(CASE WHEN n_tokens >= 20
                        AND CAST(length(text) - (n_tokens - 1) AS DOUBLE) / n_tokens
                            BETWEEN 3 AND 10
                        AND CAST(len(list_filter(toks,
                              t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                            / n_tokens > 0.02
                  THEN 1.0 ELSE 0.0 END AS DOUBLE) AS quality_score
      FROM t ORDER BY doc_id""")
  )

  /** Token counting: whitespace tokens + BPE-ish regex token count
    * (letter-runs / digit-runs / single other chars). */
  val tokenCount: QueryDef = QueryDef(
    "x_text_tokens",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_ws_tokens"),
          regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))
            .as("n_bpe_tokens"),
          (length(col("text")).cast("double") /
            size(split(col("text"), " "))).as("chars_per_token"))
        .orderBy(col("doc_id")),
    oracle = Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_ws_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
               AS n_bpe_tokens,
             CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
               AS chars_per_token
      FROM documents ORDER BY doc_id""")
  )

  /** Corpus token histogram: top-30 tokens (the one shuffling text op —
    * explode + two-phase count, skew-safe because partial aggregation
    * collapses the heavy hitters map-side). */
  val topTokens: QueryDef = QueryDef(
    "x_text_top_tokens",
    (s, dir) =>
      docs(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(30),
    oracle = Some("""
      SELECT token, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      GROUP BY token ORDER BY n DESC, token LIMIT 30""")
  )

  /** Count-min-sketch heavy hitters: the streaming-sketch companion to
    * the exact token histogram above. A d=4 × w=32 CMS is built over the
    * corpus token stream (cell[j][b] = Σ counts of tokens hashing to
    * bucket b under hash j), and each token's frequency is estimated as
    * min_j cell[j][bucket_j(tok)] — always ≥ the true count, with the
    * one-sided error the output exposes as `overcount`. The hash family
    * is the minhash family degenerated to a single-token set:
    * minhash_sig(array(tok), 4) IS [mix(fnv(tok)+ (j+1)·φ)]_{j<4}, so
    * the codegen'd kernel and its DuckDB HUGEINT replay are reused
    * verbatim. w=32 is deliberately small so collisions (and the CMS
    * guarantee) are actually exercised at test scale; at 100 TB w scales
    * to ε=e/w error with the sketch still only d×w cells — the build is
    * a two-phase aggregation over DISTINCT-token counts (heavy hitters
    * collapse map-side), the sketch itself broadcasts for free. */
  val cmsHeavyHitters: QueryDef = QueryDef(
    "x_text_cms_heavyhitters",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n_true"))
      val hashed = toks
        .withColumn("hs", minhashSig(array(col("token")), 4))
        .select(col("token"), col("n_true"), posexplode(col("hs")))
        .select(col("token"), col("n_true"), col("pos").as("j"),
          pmod(col("col"), lit(32L)).as("bucket"))
      val cells = hashed.groupBy(col("j"), col("bucket"))
        .agg(sum(col("n_true")).as("cell"))
      hashed.join(cells, Seq("j", "bucket"))
        .groupBy(col("token"), col("n_true"))
        .agg(min(col("cell")).as("n_est"))
        .select(col("token"), col("n_true"), col("n_est"),
          (col("n_est") - col("n_true")).as("overcount"))
        .orderBy(col("n_true").desc, col("token"))
        .limit(20)
    },
    oracle = Some("""
      WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                   FROM documents),
      tc AS (SELECT token, CAST(count(*) AS BIGINT) AS n_true
             FROM tok GROUP BY token),
      fh AS (SELECT token, n_true,
               list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
                 list_transform(range(1, octet_length(encode(token)) + 1),
                   i -> CAST((strpos('0123456789ABCDEF',
                            substr(hex(encode(token)), i*2-1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF',
                            substr(hex(encode(token)), i*2, 1)) - 1) AS HUGEINT))),
                 (h, c) -> (xor(CAST(h AS UBIGINT), CAST(c AS UBIGINT))::HUGEINT
                            * 1099511628211) % 18446744073709551616) AS fh
             FROM tc),
      z0 AS (SELECT token, n_true, j,
               (fh + (j+1) * CAST(11400714819323198485 AS HUGEINT))
                 % 18446744073709551616 AS z
             FROM fh CROSS JOIN (SELECT unnest(range(0, 4)) AS j) js),
      x0 AS (SELECT token, n_true, j,
               xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM z0),
      m1 AS (SELECT token, n_true, j,
               ((z % 4294967296) * CAST(18397679294719823053 AS HUGEINT)
                + ((z // 4294967296) * 3981806797 % 4294967296) * 4294967296)
               % 18446744073709551616 AS z FROM x0),
      x1 AS (SELECT token, n_true, j,
               xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM m1),
      m2 AS (SELECT token, n_true, j,
               ((z % 4294967296) * CAST(14181476777654086739 AS HUGEINT)
                + ((z // 4294967296) * 444984403 % 4294967296) * 4294967296)
               % 18446744073709551616 AS z FROM x1),
      x2 AS (SELECT token, n_true, j,
               xor(z::UBIGINT, z::UBIGINT >> 33) AS u FROM m2),
      hb AS (SELECT token, n_true, j,
               CAST(CASE WHEN u >= 9223372036854775808
                         THEN u::HUGEINT - 18446744073709551616
                         ELSE u::HUGEINT END AS BIGINT) AS h FROM x2),
      bk AS (SELECT token, n_true, j, ((h % 32) + 32) % 32 AS bucket FROM hb),
      cells AS (SELECT j, bucket, CAST(sum(n_true) AS BIGINT) AS cell
                FROM bk GROUP BY j, bucket),
      est AS (SELECT b.token, b.n_true, min(c.cell) AS n_est
              FROM bk b JOIN cells c ON c.j = b.j AND c.bucket = b.bucket
              GROUP BY b.token, b.n_true)
      SELECT token, n_true, n_est, n_est - n_true AS overcount
      FROM est ORDER BY n_true DESC, token LIMIT 20""")
  )

  /** Document fingerprinting: whole-doc rolling hash + shingle-level
    * fingerprints (custom codegen'd Fingerprint64 inside a higher-order
    * transform), plus the distinct-shingle count per doc. */
  val fingerprint: QueryDef = QueryDef(
    "x_text_fingerprint",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("shingle_fps", expr(
          """transform(sequence(0, greatest(size(toks) - 3, 0)),
             i -> fingerprint64(concat_ws(' ', slice(toks, i + 1, 3))))"""))
        .select(col("doc_id"),
          fingerprint64(col("text")).as("doc_fp"),
          size(array_distinct(col("shingle_fps"))).as("n_distinct_shingles"),
          expr("aggregate(shingle_fps, 0L, (acc, x) -> acc ^ x)")
            .as("xor_shingle_fp"))
        .orderBy(col("doc_id")),
    // the polynomial fingerprint is replicated in DuckDB with HUGEINT
    // wrap-around arithmetic over the UTF-8 bytes (hex(encode(…)) nibbles)
    oracle = Some("""
      WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
      ), sh AS (
        SELECT doc_id, text, toks,
          list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
            i -> array_to_string(toks[i+1:i+3], ' ')) AS shingles
        FROM t
      ), fps AS (
        SELECT doc_id, text,
          list_reduce(
            list_prepend(0::HUGEINT,
              list_transform(range(1, octet_length(encode(text)) + 1),
                i -> CAST((strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2-1, 1)) - 1) * 16
                   + (strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2, 1)) - 1) AS HUGEINT))),
            (acc, b) -> (acc * 1000003::HUGEINT + b) % 18446744073709551616::HUGEINT) AS doc_acc,
          list_transform(shingles, s ->
            list_reduce(
              list_prepend(0::HUGEINT,
                list_transform(range(1, octet_length(encode(s)) + 1),
                  i -> CAST((strpos('0123456789ABCDEF', substr(hex(encode(s)), i*2-1, 1)) - 1) * 16
                     + (strpos('0123456789ABCDEF', substr(hex(encode(s)), i*2, 1)) - 1) AS HUGEINT))),
              (acc, b) -> (acc * 1000003::HUGEINT + b) % 18446744073709551616::HUGEINT)) AS sh_accs
        FROM sh
      ), signed AS (
        SELECT doc_id,
          CAST(CASE WHEN doc_acc >= 9223372036854775808::HUGEINT
               THEN doc_acc - 18446744073709551616::HUGEINT ELSE doc_acc END AS BIGINT) AS doc_fp,
          list_transform(sh_accs, a ->
            CAST(CASE WHEN a >= 9223372036854775808::HUGEINT
                 THEN a - 18446744073709551616::HUGEINT ELSE a END AS BIGINT)) AS sh_fps
        FROM fps
      )
      SELECT doc_id, doc_fp,
        CAST(len(list_distinct(sh_fps)) AS INTEGER) AS n_distinct_shingles,
        list_reduce(list_prepend(0::BIGINT, sh_fps), (a, b) -> xor(a, b))
          AS xor_shingle_fp
      FROM signed ORDER BY doc_id""")
  )

  /** The standard pretraining curation funnel composed end-to-end:
    * quality gate (token count + token length) → language keep-list →
    * exact dedup keeping the canonical (min doc_id per digest) → per-
    * language yield stats. One window shuffle on the digest and one
    * aggregation shuffle on lang — the whole funnel stays two shuffles at
    * any corpus size. */
  val curate: QueryDef = QueryDef(
    "x_pipeline_curate",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = docs(s, dir)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .withColumn("avg_token_len",
          (length(col("text")) - (col("n_tokens") - 1)).cast("double") /
            col("n_tokens"))
        .filter(col("n_tokens") >= 20 && col("avg_token_len").between(3, 10))
        .filter(col("lang").isin("en", "de", "fr", "es"))
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      base.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("total_tokens"),
          avg(col("n_tokens")).as("avg_tokens"))
        .orderBy(col("lang"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, lang, text,
                        len(string_split(text, ' ')) AS n_tokens,
                        CAST(length(text) - (len(string_split(text, ' ')) - 1)
                             AS DOUBLE) / len(string_split(text, ' '))
                          AS avg_token_len
                 FROM documents),
      f AS (SELECT * FROM t
            WHERE n_tokens >= 20 AND avg_token_len BETWEEN 3 AND 10
              AND lang IN ('en', 'de', 'fr', 'es')),
      d AS (SELECT *, row_number() OVER (PARTITION BY md5(text)
                                         ORDER BY doc_id) AS rn
            FROM f)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             avg(n_tokens) AS avg_tokens
      FROM d WHERE rn = 1 GROUP BY lang ORDER BY lang""")
  )

  /** Corpus bigram histogram: adjacent-token pairs exploded and counted
    * two-phase — the n-gram statistics pass every tokenizer-training
    * pipeline runs (same skew-safe shape as the unigram histogram). */
  val bigrams: QueryDef = QueryDef(
    "x_text_bigrams",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> concat(toks[i], ' ', toks[i+1]))")).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20),
    oracle = Some("""
      WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      b AS (SELECT unnest(list_transform(range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i+1])) AS bigram
            FROM t WHERE len(toks) >= 2)
      SELECT bigram, count(*) AS n FROM b
      GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""")
  )

  /** Deterministic hash-based sampling — the reproducible data-mixing
    * primitive: each doc's inclusion is decided by fingerprint64(text) mod
    * 1000 against a per-language rate, so any worker (or a re-run months
    * later) selects the identical subset with zero coordination. Output is
    * per-language kept/total so a wrong hash or rate shows up as a count
    * mismatch. */
  val sample: QueryDef = QueryDef(
    "x_pipeline_sample",
    (s, dir) => {
      // mixture rates per thousand: downsample en, keep most de/fr/es
      val rate = when(col("lang") === "en", 300)
        .when(col("lang") === "de", 800)
        .otherwise(500)
      docs(s, dir)
        .withColumn("bucket",
          pmod(fingerprint64(col("text")), lit(1000L)))
        .withColumn("keep", col("bucket") < rate)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy(col("lang"))
    },
    // the Karp-Rabin fingerprint is replayed in DuckDB with HUGEINT wrap
    // arithmetic over the UTF-8 bytes, then pmod'd like Spark (positive
    // remainder even for negative hashes)
    oracle = Some("""
      WITH f AS (
        SELECT doc_id, lang,
          list_reduce(
            list_prepend(0::HUGEINT,
              list_transform(range(1, octet_length(encode(text)) + 1),
                i -> CAST((strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2-1, 1)) - 1) * 16
                   + (strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2, 1)) - 1) AS HUGEINT))),
            (acc, b) -> (acc * 1000003::HUGEINT + b) % 18446744073709551616::HUGEINT) AS acc
        FROM documents),
      sg AS (SELECT doc_id, lang,
               CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
                         THEN acc - 18446744073709551616::HUGEINT
                         ELSE acc END AS BIGINT) AS fp
             FROM f),
      k AS (SELECT lang,
              ((fp % 1000) + 1000) % 1000 AS bucket
            FROM sg)
      SELECT lang, count(*) AS n_total,
             CAST(sum(CASE WHEN bucket < (CASE WHEN lang = 'en' THEN 300
                                               WHEN lang = 'de' THEN 800
                                               ELSE 500 END)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM k GROUP BY lang ORDER BY lang""")
  )

  /** Sequence packing: assign docs (ordered by id within language) to
    * fixed token-budget bins via a running-sum window — the greedy packing
    * pass that turns a curated corpus into training sequences. One window
    * shuffle on lang, one aggregation; bin boundaries are exact integer
    * math so the oracle replays them. */
  val pack: QueryDef = QueryDef(
    "x_pipeline_pack",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 4096L
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("bin", ((col("cum") - col("n_tokens")) / budget)
          .cast("long"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("bin_tokens"))
        .orderBy(col("lang"), col("bin"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, lang,
                        CAST(len(string_split(text, ' ')) AS BIGINT)
                          AS n_tokens
                 FROM documents),
      c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM t)
      SELECT lang, CAST((cum - n_tokens) // 4096 AS BIGINT) AS bin,
             count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
      FROM c GROUP BY lang, bin ORDER BY lang, bin""")
  )

  /** TF-IDF top terms per document — the relevance/keyword-extraction
    * pass of a text pipeline. tf from one (doc, token) aggregation, df
    * from a second over the tf pairs, corpus size as a broadcast scalar;
    * the smooth idf is ln((N+1)/(df+1)) + 1. Scores round to 4 decimals
    * on BOTH sides (ranking runs on the rounded value) so a 1-ulp ln()
    * difference between libm and DuckDB can't flip a rank. */
  val tfidf: QueryDef = QueryDef(
    "x_text_tfidf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tf = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("token"))
      tf.join(dfreq, Seq("token"))
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf", round(col("tf") *
          (log((col("n_docs") + 1) / (col("df") + 1)) + 1), 4))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("token"), col("tf"),
          col("tfidf"))
        .orderBy(col("doc_id"), col("rk"))
    },
    oracle = Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                   FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf
             FROM tok GROUP BY doc_id, token),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (SELECT tf.doc_id, tf.token, tf.tf,
               round(tf.tf * (ln((nd.n_docs + 1) / (df.df + 1)) + 1), 4)
                 AS tfidf
             FROM tf JOIN df USING (token) CROSS JOIN nd),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, token) AS rk
            FROM sc)
      SELECT doc_id, rk, token, tf, tfidf FROM r WHERE rk <= 3
      ORDER BY doc_id, rk""")
  )

  /** Stratified sampling: a fixed per-stratum target (50 docs per
    * language) instead of x_pipeline_sample's fixed rates. Stratum sizes
    * come from one tiny aggregation broadcast back (NOT a window over the
    * stratum — a per-language window partition would put every 'en' row
    * in one task at 100 TB); the keep decision is pure integer math,
    * bucket(fingerprint) × stratum_n < target × 1000, so any worker
    * reproduces the identical subset with zero coordination. */
  val stratified: QueryDef = QueryDef(
    "x_pipeline_stratified",
    (s, dir) => {
      val target = 50L
      val strata = docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"))
      docs(s, dir)
        .withColumn("bucket", pmod(fingerprint64(col("text")), lit(1000L)))
        .join(broadcast(strata), Seq("lang"))
        .withColumn("keep",
          col("bucket") * col("n_total") < lit(target * 1000L))
        .groupBy(col("lang"))
        .agg(max(col("n_total")).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy(col("lang"))
    },
    oracle = Some("""
      WITH f AS (
        SELECT doc_id, lang,
          list_reduce(
            list_prepend(0::HUGEINT,
              list_transform(range(1, octet_length(encode(text)) + 1),
                i -> CAST((strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2-1, 1)) - 1) * 16
                   + (strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2, 1)) - 1) AS HUGEINT))),
            (acc, b) -> (acc * 1000003::HUGEINT + b) % 18446744073709551616::HUGEINT) AS acc
        FROM documents),
      sg AS (SELECT doc_id, lang,
               CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
                         THEN acc - 18446744073709551616::HUGEINT
                         ELSE acc END AS BIGINT) AS fp
             FROM f),
      k AS (SELECT lang, ((fp % 1000) + 1000) % 1000 AS bucket FROM sg),
      n AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang)
      SELECT k.lang, max(n.n_total) AS n_total,
             CAST(sum(CASE WHEN k.bucket * n.n_total < 50000
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM k JOIN n USING (lang) GROUP BY k.lang ORDER BY k.lang""")
  )

  /** PII redaction: detect + mask emails and phone numbers, report match
    * counts and an md5 of the redacted text (a strong whole-content
    * check). The synthetic corpus has no organic PII, so a deterministic
    * contact line derived from doc_id is appended first — the detection /
    * redaction path is what's under test. Patterns are RE2-safe (no
    * backtracking constructs) so Spark's Java regex and DuckDB's RE2
    * agree; per-row map, no shuffle. */
  val piiRedact: QueryDef = QueryDef(
    "x_text_pii",
    (s, dir) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+1-555-[0-9]{4}"
      docs(s, dir)
        .withColumn("aug", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
        .withColumn("redacted",
          regexp_replace(regexp_replace(col("aug"), email, "<EMAIL>"),
            phone, "<PHONE>"))
        .select(col("doc_id"),
          regexp_count(col("aug"), lit(email)).as("n_emails"),
          regexp_count(col("aug"), lit(phone)).as("n_phones"),
          length(col("redacted")).as("red_len"),
          md5(col("redacted")).as("red_md5"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH a AS (SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     AS aug
                 FROM documents),
      r AS (SELECT doc_id, aug,
              regexp_replace(regexp_replace(aug,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
                '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS redacted
            FROM a)
      SELECT doc_id,
             CAST(len(regexp_extract_all(aug,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS INTEGER) AS n_emails,
             CAST(len(regexp_extract_all(aug, '\+1-555-[0-9]{4}'))
               AS INTEGER) AS n_phones,
             length(redacted) AS red_len,
             md5(redacted) AS red_md5
      FROM r ORDER BY doc_id""")
  )

  /** Temperature-based mixture sampling (α = 0.5): per-source sampling
    * weights ∝ n^α rebalance a skewed corpus toward small sources — the
    * standard LLM data-mixing step between fixed-rate sampling
    * (x_pipeline_sample) and fixed-target stratification
    * (x_pipeline_stratified). The keep rule is pure integer math —
    * bucket · Σ⌊√n⌋ · n_src < target · 10⁶ · ⌊√n_src⌋ — so every worker
    * (and the oracle) reproduces the identical subset bit-for-bit; source
    * stats arrive via one tiny broadcast, the corpus side never shuffles.
    * (The long products bound |corpus| ≲ 10¹² rows here; a real 100 TB+
    * deployment widens the comparison to DECIMAL.) */
  val mix: QueryDef = QueryDef(
    "x_pipeline_mix",
    (s, dir) => {
      val target = 200L
      val counts = docs(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"))
        .withColumn("sqrt_w", floor(sqrt(col("n_total"))).cast("long"))
      val denom = counts.agg(sum(col("sqrt_w")).as("denom"))
      docs(s, dir)
        .withColumn("bucket",
          pmod(fingerprint64(col("text")), lit(1000000L)))
        .join(broadcast(counts), Seq("source"))
        .crossJoin(broadcast(denom))
        .withColumn("keep",
          col("bucket") * col("denom") * col("n_total") <
            lit(target * 1000000L) * col("sqrt_w"))
        .groupBy(col("source"))
        .agg(max(col("n_total")).as("n_total"),
          max(col("sqrt_w")).as("sqrt_w"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy(col("source"))
    },
    oracle = Some("""
      WITH f AS (
        SELECT doc_id, source,
          list_reduce(
            list_prepend(0::HUGEINT,
              list_transform(range(1, octet_length(encode(text)) + 1),
                i -> CAST((strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2-1, 1)) - 1) * 16
                   + (strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2, 1)) - 1) AS HUGEINT))),
            (acc, b) -> (acc * 1000003::HUGEINT + b) % 18446744073709551616::HUGEINT) AS acc
        FROM documents),
      sg AS (SELECT doc_id, source,
               CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
                         THEN acc - 18446744073709551616::HUGEINT
                         ELSE acc END AS BIGINT) AS fp
             FROM f),
      k AS (SELECT source,
              ((fp % 1000000) + 1000000) % 1000000 AS bucket
            FROM sg),
      n AS (SELECT source, count(*) AS n_total,
              CAST(floor(sqrt(count(*))) AS BIGINT) AS sqrt_w
            FROM documents GROUP BY source),
      dn AS (SELECT sum(sqrt_w) AS denom FROM n)
      SELECT k.source, max(n.n_total) AS n_total, max(n.sqrt_w) AS sqrt_w,
             CAST(sum(CASE WHEN k.bucket * dn.denom * n.n_total
                                < 200000000 * n.sqrt_w
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM k JOIN n USING (source) CROSS JOIN dn
      GROUP BY k.source ORDER BY k.source""")
  )

  /** The full curation pipeline composed end-to-end in ONE plan:
    * quality gate → language keep-list → exact dedup (canonical = min
    * doc_id per digest) → deterministic mixture keep → sequence packing.
    * Unlike x_pipeline_pack's per-language window, packing here runs per
    * (lang, shard) where shard = fingerprint bucket % 8 — the form that
    * scales: a 100 TB corpus packs 8 (or 10⁴) independent shard streams
    * per language instead of funneling every 'en' row through one task.
    * Shuffle budget for the whole pipeline: one digest window, one
    * (lang, shard) window, one final aggregation. */
  val e2e: QueryDef = QueryDef(
    "x_pipeline_e2e",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 4096L
      val rate = when(col("lang") === "en", 600)
        .when(col("lang") === "de", 900).otherwise(800)
      val quality = docs(s, dir)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .withColumn("avg_token_len",
          (length(col("text")) - (col("n_tokens") - 1)).cast("double") /
            col("n_tokens"))
        .filter(col("n_tokens") >= 20 && col("avg_token_len").between(3, 10))
        .filter(col("lang").isin("en", "de", "fr", "es"))
      val wd = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val kept = quality
        .withColumn("rn", row_number().over(wd))
        .filter(col("rn") === 1)
        .withColumn("bucket", pmod(fingerprint64(col("text")), lit(1000L)))
        .filter(col("bucket") < rate)
        .withColumn("shard", col("bucket") % 8)
      val wp = Window.partitionBy(col("lang"), col("shard"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      kept
        .withColumn("cum", sum(col("n_tokens").cast("long")).over(wp))
        .withColumn("bin",
          ((col("cum") - col("n_tokens")) / budget).cast("long"))
        .groupBy(col("lang"), col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("bin_tokens"))
        .orderBy(col("lang"), col("shard"), col("bin"))
    },
    oracle = Some("""
      WITH base AS (SELECT doc_id, lang, text,
                      len(string_split(text, ' ')) AS n_tokens,
                      CAST(length(text) - (len(string_split(text, ' ')) - 1)
                           AS DOUBLE) / len(string_split(text, ' '))
                        AS avg_token_len
                    FROM documents),
      q AS (SELECT * FROM base
            WHERE n_tokens >= 20 AND avg_token_len BETWEEN 3 AND 10
              AND lang IN ('en', 'de', 'fr', 'es')),
      d AS (SELECT *, row_number() OVER (PARTITION BY md5(text)
                                         ORDER BY doc_id) AS rn
            FROM q),
      dd AS (SELECT doc_id, lang, text, n_tokens FROM d WHERE rn = 1),
      f AS (SELECT doc_id,
              list_reduce(
                list_prepend(0::HUGEINT,
                  list_transform(range(1, octet_length(encode(text)) + 1),
                    i -> CAST((strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2-1, 1)) - 1) * 16
                       + (strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2, 1)) - 1) AS HUGEINT))),
                (acc, b) -> (acc * 1000003::HUGEINT + b) % 18446744073709551616::HUGEINT) AS acc
            FROM dd),
      sg AS (SELECT doc_id,
               CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
                         THEN acc - 18446744073709551616::HUGEINT
                         ELSE acc END AS BIGINT) AS fp
             FROM f),
      k AS (SELECT dd.*, ((sg.fp % 1000) + 1000) % 1000 AS bucket
            FROM dd JOIN sg USING (doc_id)),
      kept AS (SELECT *, bucket % 8 AS shard FROM k
               WHERE bucket < (CASE WHEN lang = 'en' THEN 600
                                    WHEN lang = 'de' THEN 900
                                    ELSE 800 END)),
      c AS (SELECT *, sum(CAST(n_tokens AS BIGINT)) OVER (
              PARTITION BY lang, shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM kept)
      SELECT lang, shard, CAST((cum - n_tokens) // 4096 AS BIGINT) AS bin,
             count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
      FROM c GROUP BY lang, shard, bin ORDER BY lang, shard, bin""")
  )

  /** Count of the most frequent element = longest run in the sorted
    * array. The init run=0 makes the sentinel-collision case (first
    * element equals the '' seed) compute 0+1 = 1 correctly, so no
    * special-casing is needed. */
  private def topRunCount(arrCol: String) = expr(
    s"""aggregate(array_sort($arrCol),
         struct('' AS prev, 0 AS run, 0 AS best),
         (acc, t) -> if(t = acc.prev,
           struct(t AS prev, acc.run + 1 AS run,
             greatest(acc.best, acc.run + 1) AS best),
           struct(t AS prev, 1 AS run, greatest(acc.best, 1) AS best)),
         acc -> acc.best)""")

  /** Repetition-based quality signals (the Gopher/C4-style filters every
    * pretraining pipeline runs): duplicate-token fraction, most-frequent
    * token/bigram mass, duplicate-bigram fraction, and a composite
    * repetitive flag. All per-row array math over the scan — zero shuffle
    * at any corpus size. The per-row top-count is a run-length fold over
    * the sorted gram array (O(L log L) per doc; the oracle computes the
    * same integers by the naive O(distinct·L) method, so the hash gate
    * also proves the two formulations equivalent). */
  val repetition: QueryDef = QueryDef(
    "x_text_repetition",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("bigrams", expr(
          // guard the 1-token doc: sequence(0, -1) is the DESCENDING
          // array [0, -1] and would index out of bounds; the oracle's
          // range(1, len(toks)) is simply empty there
          "CASE WHEN size(toks) >= 2 THEN " +
            "transform(sequence(0, size(toks) - 2), " +
            "i -> concat(toks[i], ' ', toks[i+1])) " +
            "ELSE array() END"))
        .withColumn("dup_token_frac",
          lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
            col("n_tokens"))
        .withColumn("top_token_frac",
          topRunCount("toks").cast("double") / col("n_tokens"))
        .withColumn("top_bigram_frac",
          when(size(col("bigrams")) > 0,
            topRunCount("bigrams").cast("double") /
              size(col("bigrams"))).otherwise(0.0))
        .withColumn("dup_bigram_frac",
          when(size(col("bigrams")) > 0,
            lit(1.0) - size(array_distinct(col("bigrams"))).cast("double") /
              size(col("bigrams"))).otherwise(0.0))
        .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
          col("top_token_frac"), col("top_bigram_frac"),
          col("dup_bigram_frac"),
          // flag on DUPLICATE mass, not top-gram mass: top_bigram_frac has
          // a 1/(n-1) floor on short docs (one bigram is always "the top"),
          // while dup fractions are exactly 0 for non-repetitive text
          (col("dup_bigram_frac") > 0.18 || col("dup_token_frac") > 0.85)
            .as("is_repetitive"))
        .orderBy(col("doc_id")),
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      b AS (SELECT doc_id, toks, len(toks) AS n_tokens,
              list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1]) AS bigrams
            FROM t),
      m AS (SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
              1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n_tokens
                AS dup_token_frac,
              CAST(list_max(list_transform(list_distinct(toks),
                d -> len(list_filter(toks, t -> t = d)))) AS DOUBLE)
                / n_tokens AS top_token_frac,
              CASE WHEN len(bigrams) > 0
                   THEN CAST(list_max(list_transform(list_distinct(bigrams),
                          d -> len(list_filter(bigrams, x -> x = d))))
                          AS DOUBLE) / len(bigrams)
                   ELSE 0.0 END AS top_bigram_frac,
              CASE WHEN len(bigrams) > 0
                   THEN 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                          / len(bigrams)
                   ELSE 0.0 END AS dup_bigram_frac
            FROM b)
      SELECT doc_id, n_tokens, dup_token_frac, top_token_frac,
             top_bigram_frac, dup_bigram_frac,
             (dup_bigram_frac > 0.18 OR dup_token_frac > 0.85)
               AS is_repetitive
      FROM m ORDER BY doc_id""")
  )

  /** Benchmark-contamination detection: documents sharing any 5-token
    * n-gram with a held-out benchmark set (here: doc_id % 97 = 0 stands in
    * for the eval suite). Corpus docs explode to distinct md5'd 5-grams;
    * the benchmark's gram set — bounded by |benchmark|, not |corpus| — is
    * broadcast and the overlap count is one partial-aggregated groupBy on
    * doc_id. This is the decontamination pass every pretraining corpus
    * runs before training, shaped so the 100 TB side never shuffles more
    * than (doc_id, hash) pairs. */
  val contamination: QueryDef = QueryDef(
    "x_text_contamination",
    (s, dir) => {
      val grams = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 5), " +
            "i -> concat_ws(' ', slice(toks, i + 1, 5)))")).as("gram"))
        .select(col("doc_id"), md5(col("gram")).as("g"))
        .distinct()
      val bench = grams.filter(col("doc_id") % 97 === 0)
        .select(col("g")).distinct()
      val corpus = grams.filter(col("doc_id") % 97 =!= 0)
      val hits = corpus.join(broadcast(bench), Seq("g"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
        .join(hits, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_grams"))
            .as("contam_frac"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("is_contaminated"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents
                 WHERE len(string_split(text, ' ')) >= 5),
      g0 AS (SELECT doc_id,
               unnest(list_transform(range(0, len(toks) - 5 + 1),
                 i -> array_to_string(toks[i+1:i+5], ' '))) AS gram
             FROM t),
      g AS (SELECT DISTINCT doc_id, md5(gram) AS g FROM g0),
      bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
      corpus AS (SELECT * FROM g WHERE doc_id % 97 <> 0),
      hits AS (SELECT doc_id, count(*) AS n_hits
               FROM corpus JOIN bench USING (g) GROUP BY doc_id),
      tot AS (SELECT doc_id, count(*) AS n_grams
              FROM corpus GROUP BY doc_id)
      SELECT tot.doc_id, tot.n_grams,
             coalesce(h.n_hits, 0) AS n_hits,
             CAST(coalesce(h.n_hits, 0) AS DOUBLE) / tot.n_grams
               AS contam_frac,
             coalesce(h.n_hits, 0) > 0 AS is_contaminated
      FROM tot LEFT JOIN hits h USING (doc_id) ORDER BY doc_id""")
  )

  /** K-anonymous aggregate release (k = 8): per-(lang, source) corpus
    * stats are published only for groups with ≥ k members; every smaller
    * group collapses into one '*' residual row so no small-population
    * quasi-identifier combination leaks. Averages recompute from carried
    * sums (never an average of averages), and the suppression decision is
    * pure integer math.
    *
    * Scale shape: one two-phase aggregation over the corpus; the
    * suppressed-side rollup is a second aggregation over the ALREADY
    * collapsed group table (≤ |langs|·|sources| rows), so corpus size
    * only touches the first map side. */
  val kanon: QueryDef = QueryDef(
    "x_pipeline_kanon",
    (s, dir) => {
      val k = 8
      val g = docs(s, dir).groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sc"))
      val released = g.filter(col("n_docs") >= k)
        .select(col("lang"), col("source"), col("n_docs"),
          round(col("sc").cast("double") / col("n_docs"), 4)
            .as("avg_chars"),
          lit(false).as("is_suppressed"))
      val residual = g.filter(col("n_docs") < k)
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("sc")).as("sc"))
        .filter(col("n_docs").isNotNull)
        .select(lit("*").as("lang"), lit("*").as("source"), col("n_docs"),
          round(col("sc").cast("double") / col("n_docs"), 4)
            .as("avg_chars"),
          lit(true).as("is_suppressed"))
      released.unionByName(residual)
        .orderBy(col("lang"), col("source"))
    },
    oracle = Some("""
      WITH g AS (SELECT lang, source, count(*) AS n_docs,
               sum(n_chars) AS sc
             FROM documents GROUP BY lang, source),
      rel AS (SELECT lang, source, n_docs,
                round(CAST(sc AS DOUBLE) / n_docs, 4) AS avg_chars,
                false AS is_suppressed
              FROM g WHERE n_docs >= 8),
      res AS (SELECT '*' AS lang, '*' AS source,
                CAST(sum(n_docs) AS BIGINT) AS n_docs,
                round(CAST(sum(sc) AS DOUBLE) / sum(n_docs), 4)
                  AS avg_chars,
                true AS is_suppressed
              FROM g WHERE n_docs < 8
              HAVING sum(n_docs) IS NOT NULL)
      SELECT * FROM rel UNION ALL SELECT * FROM res
      ORDER BY lang, source""")
  )

  /** Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    * exponential keys — the one-pass distributed algorithm): each doc
    * draws a deterministic pseudo-uniform u ∈ (0, 1] from
    * fingerprint64(doc_id) and scores key = −ln(u) / w with w = n_chars
    * (the quality/importance proxy); the k smallest keys ARE a weighted
    * sample without replacement. Keys round to 6 decimals before ranking
    * (doc_id tiebreak) so a 1-ulp ln() difference can't flip the cut.
    *
    * Scale shape: key assignment is a pure per-row map (the hash is a
    * codegen'd expression) and selection is a global top-k — a bounded
    * heap per partition plus a k-row driver merge, never a full sort.
    * The final rank prefix-scan runs on k = 50 rows only. */
  /** The selection stage alone (keyed scoring + bounded-heap top-k) —
    * exposed so PlanSpec can pin TakeOrderedAndProject on the subplan
    * that Prefix.over's barrier otherwise hides from the final plan. */
  private[graft] def wsampleSelect(s: SparkSession,
      dir: String): DataFrame = {
    val k = 50
    val m = 9007199254740992L // 2^53
    // zero-weight docs can never be sampled under Efraimidis-Spirakis;
    // filtering them also avoids the engines' divide-by-zero divergence
    // (Spark non-ANSI → NULL, DuckDB IEEE → +inf)
    val keyed = docs(s, dir).filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        round(-log((pmod(fingerprint64(col("doc_id").cast("string")),
          lit(m)) + 1).cast("double") / lit(m.toDouble)) /
          col("n_chars"), 6).as("skey"))
    keyed.orderBy(col("skey").asc, col("doc_id")).limit(k)
  }

  val wsample: QueryDef = QueryDef(
    "x_pipeline_wsample",
    (s, dir) => {
      graft.functions.Prefix.over(wsampleSelect(s, dir),
          Seq(col("skey").asc, col("doc_id")),
          Seq(graft.functions.Prefix.rowNumber("rk64")), numParts = 4)
        .withColumn("rk", col("rk64").cast("int"))
        .select(col("rk"), col("doc_id"), col("n_chars"), col("skey"))
        .orderBy(col("rk"))
    },
    oracle = Some("""
      WITH fp AS (SELECT doc_id, n_chars,
          list_reduce(list_prepend(0::HUGEINT,
            list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),
              i -> CAST(ascii(substr(CAST(doc_id AS VARCHAR), i, 1))
                   AS HUGEINT))),
            (acc, b) -> (acc * 1000003::HUGEINT + b)
                        % 18446744073709551616::HUGEINT) AS acc
        FROM documents WHERE n_chars > 0),
      keyed AS (SELECT doc_id, n_chars,
          round(-ln(CAST((acc % 9007199254740992::HUGEINT) + 1 AS DOUBLE)
            / 9007199254740992.0) / n_chars, 6) AS skey
        FROM fp),
      r AS (SELECT *, row_number() OVER (ORDER BY skey ASC, doc_id) AS rk
            FROM keyed)
      SELECT rk, doc_id, n_chars, skey FROM r WHERE rk <= 50
      ORDER BY rk""")
  )

  /** Shannon-entropy quality signals — the compression/perplexity proxy
    * every pretraining filter stack carries: character-level and
    * token-level entropy per document, computed with the single-pass
    * identity H = log2(T) − Σ n·log2(n) / T (no per-symbol probability
    * column, so one two-phase aggregation per granularity).
    *
    * Scale shape: the exploded symbols collapse in the MAP-SIDE partial
    * aggregate (per partition, per doc, at most |alphabet| or |vocab|
    * rows reach the shuffle), so shuffled bytes are bounded by
    * docs × alphabet, not corpus length. Entropies round to 4 decimals
    * (the sum of n·log2 n partials is the one order-sensitive term). */
  val entropy: QueryDef = QueryDef(
    "x_text_entropy",
    (s, dir) => {
      def h(counted: DataFrame, prefix: String): DataFrame =
        counted.groupBy(col("doc_id")).agg(
          count(lit(1)).as(s"n_unique_$prefix"),
          round(log2(sum(col("n"))) -
            sum(col("n") * log2(col("n"))) / sum(col("n")), 4)
            .as(s"${prefix}_entropy"))
      val ce = h(docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), "")).as("u"))
        .groupBy(col("doc_id"), col("u")).agg(count(lit(1)).as("n")),
        "chars")
      val te = h(docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("u"))
        .groupBy(col("doc_id"), col("u")).agg(count(lit(1)).as("n")),
        "tokens")
      ce.join(te, Seq("doc_id"))
        .select(col("doc_id"), col("n_unique_chars"), col("chars_entropy"),
          col("n_unique_tokens"), col("tokens_entropy"),
          (col("chars_entropy") < 3.5).as("is_low_entropy"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH cc AS (SELECT doc_id, unnest(string_split(text, '')) AS u
                  FROM documents),
      cn AS (SELECT doc_id, u, count(*) AS n FROM cc GROUP BY doc_id, u),
      ce AS (SELECT doc_id, count(*) AS n_unique_chars,
               round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 4)
                 AS chars_entropy
             FROM cn GROUP BY doc_id),
      tc AS (SELECT doc_id, unnest(string_split(text, ' ')) AS u
             FROM documents),
      tn AS (SELECT doc_id, u, count(*) AS n FROM tc GROUP BY doc_id, u),
      te AS (SELECT doc_id, count(*) AS n_unique_tokens,
               round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 4)
                 AS tokens_entropy
             FROM tn GROUP BY doc_id)
      SELECT ce.doc_id, n_unique_chars, chars_entropy,
             n_unique_tokens, tokens_entropy,
             chars_entropy < 3.5 AS is_low_entropy
      FROM ce JOIN te USING (doc_id) ORDER BY ce.doc_id""")
  )

  /** The fixed keyword-query set for BM25 retrieval: (q_id, term-position,
    * term). Position `ti` gives each query term a stable slot so the
    * per-document score can be summed in a FIXED order (s0+s1+s2) on both
    * engines — the same order-insensitivity trick as the PQ ADC sum. */
  private val bm25Queries: Seq[(Int, Int, String)] = Seq(
    (0, 0, "spark"), (0, 1, "join"),
    (1, 0, "window"), (1, 1, "sort"),
    (2, 0, "stream"), (2, 1, "batch"), (2, 2, "query"),
    (3, 0, "vector"), (3, 1, "hash"),
    (4, 0, "customer"), (4, 1, "table"), (4, 2, "scan"))

  /** BM25 keyword retrieval — the lexical-search complement to the ANN
    * family (x_ann_*): top-5 documents per query by Okapi BM25
    * (k1 = 1.2, b = 0.75, Lucene-style idf = ln((N − df + ½)/(df + ½) + 1)).
    *
    * Scale shape: the token stream is filtered to the broadcast query-term
    * set BEFORE any aggregation, so tf/df shuffle only matching
    * (doc_id, term) pairs — never the corpus's full token inventory; N and
    * avgdl are one broadcast scalar row. Scores round to 4 decimals before
    * ranking (doc_id tiebreak) so a 1-ulp ln() difference can't flip a
    * rank — same policy as x_text_tfidf. */
  /** The BM25 oracle's CTE chain (query VALUES → tf/df/stats → fixed-order
    * scores → per-query ranking `r`), shared by the bm25 and hybridRrf
    * oracles so a tuning change cannot desynchronize them. */
  private val bm25OracleCtes: String = """q(q_id, ti, term) AS (VALUES
        (0, 0, 'spark'), (0, 1, 'join'),
        (1, 0, 'window'), (1, 1, 'sort'),
        (2, 0, 'stream'), (2, 1, 'batch'), (2, 2, 'query'),
        (3, 0, 'vector'), (3, 1, 'hash'),
        (4, 0, 'customer'), (4, 1, 'table'), (4, 2, 'scan')),
      tok AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
                unnest(string_split(text, ' ')) AS token
              FROM documents),
      tf AS (SELECT doc_id, token, dl, count(*) AS tf
             FROM tok
             WHERE token IN (SELECT DISTINCT term FROM q)
             GROUP BY doc_id, token, dl),
      df AS (SELECT token, count(DISTINCT doc_id) AS df
             FROM tf GROUP BY token),
      st AS (SELECT count(*) AS n_docs,
               avg(len(string_split(text, ' '))) AS avgdl
             FROM documents),
      c AS (SELECT q.q_id, q.ti, tf.doc_id,
              ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1) *
                (tf.tf * 2.2) /
                (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl)) AS c
            FROM tf
            JOIN df USING (token)
            CROSS JOIN st
            JOIN q ON tf.token = q.term),
      sc AS (SELECT q_id, doc_id,
               round(sum(CASE WHEN ti = 0 THEN c ELSE 0 END)
                   + sum(CASE WHEN ti = 1 THEN c ELSE 0 END)
                   + sum(CASE WHEN ti = 2 THEN c ELSE 0 END), 4) AS score
             FROM c GROUP BY q_id, doc_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY score DESC, doc_id) AS rk
            FROM sc)"""

  val bm25: QueryDef = QueryDef(
    "x_search_bm25",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val qterms = s.createDataFrame(bm25Queries).toDF("q_id", "ti", "term")
      val base = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val tok = base.select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("token"))
      val tf = tok.join(broadcast(qterms.select(col("term")).distinct()),
          col("token") === col("term"))
        .groupBy(col("doc_id"), col("token"), col("dl"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("token")).agg(
        countDistinct(col("doc_id")).as("df"))
      val stats = docs(s, dir).agg(count(lit(1)).as("n_docs"),
        avg(size(split(col("text"), " "))).as("avgdl"))
      val contrib = tf
        .join(broadcast(dfreq), Seq("token"))
        .crossJoin(broadcast(stats))
        .join(broadcast(qterms), col("token") === col("term"))
        .select(col("q_id"), col("ti"), col("doc_id"),
          (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
            (col("tf") * 2.2) /
            (col("tf") + lit(1.2) * (lit(0.25) +
              lit(0.75) * col("dl") / col("avgdl")))).as("c"))
      val perTi = (0 until 3).map(i =>
        sum(when(col("ti") === i, col("c")).otherwise(0.0)).as(s"s$i"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("doc_id"))
      contrib.groupBy(col("q_id"), col("doc_id"))
        .agg(perTi.head, perTi.tail: _*)
        .withColumn("score",
          round(col("s0") + col("s1") + col("s2"), 4))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("doc_id"), col("score"))
        .orderBy(col("q_id"), col("rk"))
    },
    oracle = Some(s"""
      WITH $bm25OracleCtes
      SELECT q_id, rk, doc_id, score FROM r WHERE rk <= 5
      ORDER BY q_id, rk""")
  )

  /** Hybrid retrieval via reciprocal-rank fusion — the standard way a
    * production search stack combines BM25's lexical ranking with the
    * vector index's semantic ranking: each query's two top-5 lists merge
    * on a full-outer join and every hit scores
    * Σ 1/(60 + rank) over the lists it appears in (k = 60, the original
    * RRF constant). Ranks are integers, the two-term sum adds in fixed
    * (text, vector) order, so the fused score is bit-exact on both
    * engines with no rounding.
    *
    * Scale shape: both inputs are already top-k-bounded (5 rows per
    * query each), so the fusion join, window and output are
    * O(queries × k) regardless of corpus size — the expensive parts are
    * the underlying BM25 and ANN passes, each already shaped for 100 TB
    * (see their entries). */
  val hybridRrf: QueryDef = QueryDef(
    "x_search_hybrid_rrf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val txt = bm25.run(s, dir)
        .select(col("q_id").cast("long").as("q_id"), col("doc_id"),
          col("rk").as("t_rk"))
      val vec = VectorQueries.bruteTopK.run(s, dir)
        .filter(col("q_id") < 5)
        .select(col("q_id"), col("vec_id").as("doc_id"),
          col("rk").as("v_rk"))
      val fused = txt.join(vec, Seq("q_id", "doc_id"), "full_outer")
        .select(col("q_id"), col("doc_id"),
          (coalesce(lit(1.0) / (col("t_rk") + 60), lit(0.0)) +
            coalesce(lit(1.0) / (col("v_rk") + 60), lit(0.0))).as("rrf"),
          col("t_rk").isNotNull.as("in_text"),
          col("v_rk").isNotNull.as("in_vector"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("rrf").desc, col("doc_id"))
      fused.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("doc_id"), col("rrf"),
          col("in_text"), col("in_vector"))
        .orderBy(col("q_id"), col("rk"))
    },
    oracle = Some(s"""
      WITH $bm25OracleCtes,
      tt AS (SELECT CAST(q_id AS BIGINT) AS q_id, doc_id, rk AS t_rk
             FROM r WHERE rk <= 5),
      vq AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
             WHERE vec_id < 5),
      vscored AS (SELECT vq.q_id, e.vec_id,
               list_cosine_similarity(CAST(vq.q_emb AS DOUBLE[]),
                 CAST(e.embedding AS DOUBLE[])) AS cos
             FROM embeddings e CROSS JOIN vq
             WHERE e.vec_id <> vq.q_id),
      vranked AS (SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, vec_id) AS rk
             FROM vscored),
      vv AS (SELECT q_id, vec_id AS doc_id, rk AS v_rk
             FROM vranked WHERE rk <= 5),
      f AS (SELECT coalesce(tt.q_id, vv.q_id) AS q_id,
               coalesce(tt.doc_id, vv.doc_id) AS doc_id,
               tt.t_rk, vv.v_rk
            FROM tt FULL OUTER JOIN vv
              ON tt.q_id = vv.q_id AND tt.doc_id = vv.doc_id),
      g AS (SELECT q_id, doc_id,
              coalesce(1.0 / (t_rk + 60), 0.0)
                + coalesce(1.0 / (v_rk + 60), 0.0) AS rrf,
              t_rk IS NOT NULL AS in_text,
              v_rk IS NOT NULL AS in_vector
            FROM f),
      h AS (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY rrf DESC, doc_id) AS rk
            FROM g)
      SELECT q_id, rk, doc_id, rrf, in_text, in_vector
      FROM h WHERE rk <= 5 ORDER BY q_id, rk""")
  )

  /** Bigram language-model scoring — the perplexity-proxy quality filter:
    * a corpus-trained add-one-smoothed bigram LM, P(w2|w1) =
    * (c(w1,w2) + 1) / (c(w1) + V), scores every document by its mean
    * log-probability (and perplexity = exp(−mean)). Low scores mark
    * machine-generated/garbled text the way a real LM filter would.
    *
    * Scale shape: the LM "model" is two count tables built by two-phase
    * aggregation; scoring joins each doc's bigrams against them BY KEY
    * (the bigram table scales with the corpus, so it is never broadcast
    * — only the vocab-size scalar is), then one per-doc aggregation.
    * Mean log-prob rounds to 4 (the one order-sensitive sum). */
  val lmScore: QueryDef = QueryDef(
    "x_text_lm_score",
    (s, dir) => {
      val base = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
      val bg = base.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(element_at(toks, i + 1) AS w1, " +
          "element_at(toks, i + 2) AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val vocab = bg.select(col("w1")).union(bg.select(col("w2")))
        .agg(countDistinct(col("w1")).as("v"))
      bg.join(c2, Seq("w1", "w2"))
        .join(c1, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          log((col("c2") + 1).cast("double") / (col("c1") + col("v")))
            .as("lp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(col("lp")), 4).as("avg_logp"))
        .withColumn("ppl", round(exp(-col("avg_logp")), 4))
        .select(col("doc_id"), col("n_bigrams"), col("avg_logp"),
          col("ppl"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents
                 WHERE len(string_split(text, ' ')) >= 2),
      bg AS (SELECT doc_id,
               unnest(list_transform(range(0, len(toks) - 1),
                 i -> {'w1': toks[i+1], 'w2': toks[i+2]}), recursive := true)
             FROM t),
      c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
      c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
      vocab AS (SELECT count(DISTINCT w) AS v FROM (
                  SELECT w1 AS w FROM bg UNION ALL SELECT w2 FROM bg)),
      lp AS (SELECT bg.doc_id,
               ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + vocab.v)) AS lp
             FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
             CROSS JOIN vocab)
      SELECT doc_id, count(*) AS n_bigrams,
             round(avg(lp), 4) AS avg_logp,
             round(exp(-round(avg(lp), 4)), 4) AS ppl
      FROM lp GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Training-shard manifest — the export contract of a curation
    * pipeline (WebDataset/shard-list style): every doc lands in a
    * deterministic shard (fingerprint64(doc_id) mod 8, reproducible on
    * any cluster), and the manifest row per shard carries doc/token
    * counts plus an md5 membership checksum over the sorted doc_id list,
    * so a consumer can verify a shard set before training starts.
    *
    * Scale shape: one two-phase aggregation keyed by shard; the checksum
    * concatenates ids AFTER sort_array on the collected list, so the
    * digest is layout-independent. At 100 TB the membership list per
    * shard is the one state that grows with docs/shards — shard count is
    * the knob that bounds it. */
  val manifest: QueryDef = QueryDef(
    "x_pipeline_manifest",
    (s, dir) => {
      val sharded = docs(s, dir).select(col("doc_id"),
        pmod(fingerprint64(col("doc_id").cast("string")), lit(8L))
          .as("shard_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      sharded.groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          md5(concat_ws(",", sort_array(collect_list(col("doc_id")))))
            .as("membership_md5"))
        .orderBy(col("shard_id"))
    },
    oracle = Some("""
      WITH fp AS (SELECT doc_id,
          len(string_split(text, ' ')) AS n_toks,
          list_reduce(list_prepend(0::HUGEINT,
            list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),
              i -> CAST(ascii(substr(CAST(doc_id AS VARCHAR), i, 1))
                   AS HUGEINT))),
            (acc, b) -> (acc * 1000003::HUGEINT + b)
                        % 18446744073709551616::HUGEINT) AS acc
        FROM documents),
      sh AS (SELECT doc_id, n_toks,
               CAST(acc % 8::HUGEINT AS BIGINT) AS shard_id
             FROM fp)
      SELECT shard_id, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             md5(string_agg(CAST(doc_id AS VARCHAR), ','
               ORDER BY doc_id)) AS membership_md5
      FROM sh GROUP BY shard_id ORDER BY shard_id""")
  )

  /** HyperLogLog distinct-count sketch over corpus shingles — the
    * mergeable-cardinality companion to the CMS frequency sketch above.
    * m=64 registers (p=6; deliberately small so estimation error is
    * actually exercised at test scale); register j holds the max over
    * hashed shingles of rho(h >>> 6) where rho = trailing-zero count + 1.
    * The build is SHARDED to pin mergeability: per-shard registers
    * (doc_id % 8) are max-merged into global registers before estimating
    * — exactly how 1000 executors would each sketch their split and ship
    * 64 bytes to the driver. At 100 TB the sketch build is a two-phase
    * max-aggregation over a per-row codegen'd hash (no distinct shuffle
    * anywhere in the estimate path); the exact-count branch here exists
    * only to expose the observed relative error next to the estimate.
    * The raw harmonic-mean estimator (alpha_64 = 0.709) is emitted
    * unrounded: every term 2^(59-M_j) is summed in exact integer
    * arithmetic (DECIMAL(38,0) / HUGEINT) and the final float divide is
    * written identically on both engines, so the doubles match bit-exact.
    * Hash family: the minhash j=0 hash (FNV-1a + murmur finalizer),
    * replayed in DuckDB HUGEINT arithmetic like the CMS/minhash oracles. */
  val hllDistinct: QueryDef = QueryDef(
    "x_text_hll_distinct",
    (s, dir) => {
      val sh = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("shingle", explode(expr(
          """transform(sequence(0, greatest(size(toks) - 3, 0)),
             i -> concat_ws(' ', slice(toks, i + 1, 3)))""")))
        .select(col("doc_id"), col("shingle"))
      val hashed = sh
        .withColumn("h", element_at(minhashSig(array(col("shingle")), 1), 1))
        .withColumn("bucket", pmod(col("h"), lit(64L)))
        .withColumn("su", shiftrightunsigned(col("h"), 6))
        .withColumn("rho", expr(
          "CASE WHEN su = 0 THEN 59 " +
            "ELSE bit_count((su - (su & (su - 1))) - 1) + 1 END"))
      val shardRegs = hashed
        .groupBy(pmod(col("doc_id"), lit(8L)).as("shard"), col("bucket"))
        .agg(max(col("rho")).as("reg"))
      val regs = shardRegs.groupBy(col("bucket"))
        .agg(max(col("reg")).as("reg"))
      val est = regs.agg(
        count(lit(1)).as("n_buckets"),
        sum(expr("CAST(shiftleft(1L, 59 - reg) AS DECIMAL(38,0))"))
          .as("s_present"))
        .withColumn("s_scaled", col("s_present") +
          (lit(64L) - col("n_buckets")).cast("decimal(38,0)") *
            lit(576460752303423488L).cast("decimal(38,0)"))
      val exact = sh.agg(countDistinct(col("shingle")).as("n_exact"))
      est.crossJoin(exact)
        .withColumn("hll_est",
          lit(0.709) * lit(4096.0) * lit(576460752303423488.0) /
            col("s_scaled").cast("double"))
        .withColumn("rel_err",
          (col("hll_est") - col("n_exact").cast("double")) /
            col("n_exact").cast("double"))
        .select(col("n_exact"), col("n_buckets"), col("hll_est"),
          col("rel_err"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      sh AS (SELECT doc_id,
               unnest(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
                 i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
             FROM t),
      fh AS (SELECT doc_id, shingle,
               list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
                 list_transform(range(1, octet_length(encode(shingle)) + 1),
                   i -> CAST((strpos('0123456789ABCDEF',
                            substr(hex(encode(shingle)), i*2-1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF',
                            substr(hex(encode(shingle)), i*2, 1)) - 1)
                      AS HUGEINT))),
                 (h, c) -> (xor(CAST(h AS UBIGINT), CAST(c AS UBIGINT))::HUGEINT
                            * 1099511628211) % 18446744073709551616) AS fh
             FROM sh),
      z0 AS (SELECT doc_id, shingle,
               (fh + CAST(11400714819323198485 AS HUGEINT))
                 % 18446744073709551616 AS z FROM fh),
      x0 AS (SELECT doc_id, shingle,
               xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM z0),
      m1 AS (SELECT doc_id, shingle,
               ((z % 4294967296) * CAST(18397679294719823053 AS HUGEINT)
                + ((z // 4294967296) * 3981806797 % 4294967296) * 4294967296)
               % 18446744073709551616 AS z FROM x0),
      x1 AS (SELECT doc_id, shingle,
               xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM m1),
      m2 AS (SELECT doc_id, shingle,
               ((z % 4294967296) * CAST(14181476777654086739 AS HUGEINT)
                + ((z // 4294967296) * 444984403 % 4294967296) * 4294967296)
               % 18446744073709551616 AS z FROM x1),
      x2 AS (SELECT doc_id, shingle,
               xor(z::UBIGINT, z::UBIGINT >> 33) AS u FROM m2),
      hb AS (SELECT doc_id,
               CAST(u % 64 AS BIGINT) AS bucket, u >> 6 AS su FROM x2),
      rho AS (SELECT doc_id, bucket,
                CASE WHEN su = 0 THEN 59
                     ELSE CAST(bit_count(
                            CAST((su - (su & (su - 1))) - 1 AS BIGINT))
                          AS INT) + 1 END AS rho
              FROM hb),
      shardreg AS (SELECT doc_id % 8 AS shard, bucket, max(rho) AS reg
                   FROM rho GROUP BY 1, 2),
      reg AS (SELECT bucket, max(reg) AS reg FROM shardreg GROUP BY bucket),
      est AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
                sum(CAST((CAST(1 AS BIGINT) << (59 - reg)) AS HUGEINT))
                  AS s_present
              FROM reg),
      fin AS (SELECT n_buckets,
                s_present + (64 - n_buckets)
                  * CAST(576460752303423488 AS HUGEINT) AS s_scaled
              FROM est),
      ex AS (SELECT count(DISTINCT shingle) AS n_exact FROM sh),
      joined AS (SELECT ex.n_exact, fin.n_buckets,
                   CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
                     * CAST(576460752303423488 AS DOUBLE)
                     / CAST(fin.s_scaled AS DOUBLE) AS hll_est
                 FROM fin, ex)
      SELECT n_exact, n_buckets, hll_est,
             (hll_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
               AS rel_err
      FROM joined""")
  )

  /** Token-budget apportionment across sources — the exact-integer
    * companion to the temperature `mix` sampler: a 100k-token budget is
    * split across sources proportionally to √(source tokens) (τ=0.5
    * upweighting of small domains) and rounded by the largest-remainder
    * (Hamilton) method so the quotas sum to the budget EXACTLY — the
    * per-domain token allocation a training-mix planner emits before any
    * sampling runs. Everything after the token count is integer
    * arithmetic over one |sources|-row frame (the global windows run on
    * ~20 rows, like the sub_cte rank), so Spark and DuckDB agree
    * bit-exactly; ties in the remainder rank break by source name. */
  val budgetMix: QueryDef = QueryDef(
    "x_pipeline_budget_mix",
    (s, dir) => {
      val counts = docs(s, dir)
        .withColumn("n", size(split(col("text"), " ")).cast("long"))
        .groupBy(col("source")).agg(sum(col("n")).as("n_tokens"))
        .withColumn("w",
          floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
      // corpus totals come from plain two-phase aggs broadcast back in
      // (not an unpartitioned window), and the remainder rank is a
      // range-partitioned prefix-scan over the source domain
      val totals = counts.agg(sum(col("w")).as("s_total"))
      val based = counts.crossJoin(broadcast(totals))
        .withColumn("base", expr("(100000 * w) div s_total"))
        .withColumn("rem", expr("(100000 * w) % s_total"))
      val spent = based.agg(sum(col("base")).as("base_total"))
      val ranked = graft.functions.Prefix.over(
          based.crossJoin(broadcast(spent))
            .withColumn("leftover", lit(100000L) - col("base_total")),
          Seq(col("rem").desc, col("source")),
          Seq(graft.functions.Prefix.rowNumber("rk")), numParts = 4)
      ranked
        .withColumn("quota",
          col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
        .select(col("source"), col("n_tokens"), col("w"), col("quota"))
        .orderBy(col("source"))
    },
    oracle = Some("""
      WITH c AS (SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                     AS n_tokens
                 FROM documents GROUP BY source),
      w AS (SELECT source, n_tokens,
              CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w
            FROM c),
      t AS (SELECT source, n_tokens, w,
              sum(w) OVER () AS s_total FROM w),
      b AS (SELECT source, n_tokens, w,
              (100000 * w) // s_total AS base,
              (100000 * w) % s_total AS rem FROM t),
      r AS (SELECT source, n_tokens, w, base, rem,
              100000 - sum(base) OVER () AS leftover,
              row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
      SELECT source, n_tokens, w,
             CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
               AS BIGINT) AS quota
      FROM r ORDER BY source""")
  )

  /** Deterministic 3-way train/val/test split (80/10/10): the split
    * bucket hashes a PURPOSE-SALTED key ("split:" + doc_id), so split
    * membership is independent of every other hash decision in the
    * pipeline (sampling, sharding) — the standard guard against
    * correlated selection. Disjointness and coverage are structural
    * (CASE over one bucket); the oracle replays the salted fingerprint
    * and the per-split/lang footprint. */
  val split3: QueryDef = QueryDef(
    "x_pipeline_split",
    (s, dir) =>
      docs(s, dir)
        .withColumn("bucket", pmod(fingerprint64(
          concat(lit("split:"), col("doc_id").cast("string"))), lit(100L)))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split"), col("lang")),
    oracle = Some("""
      WITH f AS (
        SELECT doc_id, lang, n_chars,
          list_reduce(
            list_prepend(0::HUGEINT,
              list_transform(range(1,
                  octet_length(encode('split:' || doc_id)) + 1),
                i -> CAST((strpos('0123456789ABCDEF',
                         substr(hex(encode('split:' || doc_id)), i*2-1, 1))
                         - 1) * 16
                   + (strpos('0123456789ABCDEF',
                         substr(hex(encode('split:' || doc_id)), i*2, 1))
                         - 1) AS HUGEINT))),
            (acc, b) -> (acc * 1000003::HUGEINT + b)
                        % 18446744073709551616::HUGEINT) AS acc
        FROM documents),
      sg AS (SELECT lang, n_chars,
               ((CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
                           THEN acc - 18446744073709551616::HUGEINT
                           ELSE acc END AS BIGINT) % 100) + 100) % 100
                 AS bucket
             FROM f),
      sp AS (SELECT lang, n_chars,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
             FROM sg)
      SELECT split, lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM sp GROUP BY split, lang ORDER BY split, lang""")
  )

  /** Per-domain cap (crawl-curation standard: no single domain may
    * dominate the corpus — C4/RefinedWeb-style source diversity): keep at
    * most 15 docs per source, best-first by (n_chars desc, doc_id). One
    * ranked window partitioned by source — the shuffle moves (doc_id,
    * source, n_chars) triples only, never text, and each partition's
    * bounded rank check stops scoring after the cap at 100 TB (Spark's
    * WindowGroupLimit pushes rk <= 15 into the sort). */
  val domainCap: QueryDef = QueryDef(
    "x_pipeline_domain_cap",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("source"))
            .orderBy(col("n_chars").desc, col("doc_id"))))
        .filter(col("rk") <= 15)
        .orderBy(col("source"), col("rk")),
    oracle = Some("""
      SELECT doc_id, source, n_chars, CAST(rk AS INT) AS rk FROM (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents)
      WHERE rk <= 15 ORDER BY source, rk""")
  )

  /** Deterministic global shuffle + shard assignment for training export:
    * every epoch pipeline needs a reproducible random order. Key =
    * md5("shuffle:42:" + doc_id) (engine-portable, seed-salted); shard =
    * first two hex nibbles (256 shards); position = rank within shard by
    * key. No global sort anywhere — shard assignment is a per-row map,
    * and each shard orders independently (at 100 TB shard count scales
    * with the corpus so one shard ≈ one executor-sized output file; 256
    * here). Salt differs from x_pipeline_split's on purpose: shuffle
    * order must not correlate with split membership. */
  val shuffleShards: QueryDef = QueryDef(
    "x_pipeline_shuffle",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          md5(concat(lit("shuffle:42:"), col("doc_id").cast("string")))
            .as("k"))
        .withColumn("shard", substring(col("k"), 1, 2))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos")),
    oracle = Some("""
      SELECT doc_id, shard, CAST(pos AS INT) AS pos FROM (
        SELECT doc_id, substr(k, 1, 2) AS shard,
               row_number() OVER (PARTITION BY substr(k, 1, 2)
                 ORDER BY k, doc_id) AS pos
        FROM (SELECT doc_id, md5('shuffle:42:' || doc_id) AS k
              FROM documents))
      ORDER BY shard, pos""")
  )

  /** Exact PHRASE search via a positional inverted index — the query
    * class bag-of-words BM25 cannot express ("slow hash batch" as
    * consecutive tokens, not three independent terms). The posting list
    * (token, doc_id, pos) is filtered to the phrase's tokens immediately
    * after tokenization — inside the scan stage, before any shuffle, so
    * only the three terms' postings ever leave the mappers; then
    * consecutive-position equi-joins chain the terms (t0.pos + 1 =
    * t1.pos, …). At 100 TB the postings come from a PREBUILT inverted
    * index table (the same one x_search_bm25 would persist) and the term
    * filter becomes a genuine parquet pushdown on its token column; the
    * join chain is identical. Per-doc hit counts + first occurrence come
    * out of one grouped pass over matched starts. The oracle re-derives
    * matches by direct window scan — algorithm-independent agreement. */
  val phraseSearch: QueryDef = QueryDef(
    "x_search_phrase",
    (s, dir) => {
      val phrase = Seq("slow", "hash", "batch")
      val postings = docs(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("pos", "p")
        .withColumnRenamed("col", "tok")
        .filter(col("tok").isin(phrase: _*))
      val starts = phrase.zipWithIndex.map { case (t, i) =>
        postings.filter(col("tok") === t)
          .select(col("doc_id"), (col("p") - i).as("start"))
      }.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      starts.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"), min(col("start")).as("first_pos"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      r AS (SELECT doc_id, unnest(range(0, len(toks) - 2)) AS i, toks
            FROM t),
      m AS (SELECT doc_id, i FROM r
            WHERE toks[i+1] = 'slow' AND toks[i+2] = 'hash'
              AND toks[i+3] = 'batch')
      SELECT doc_id, count(*) AS n_hits,
             CAST(min(i) AS INT) AS first_pos
      FROM m GROUP BY doc_id ORDER BY doc_id""")
  )

  /** md5-prefix hash bucket shared by the DSIR features and the hashed
    * embedding: first hex byte of md5(token) mod m. Weak as a general
    * hash but deterministic and byte-identical across engines, which is
    * what the oracle gate needs; both sides lowercase-hex their md5. */
  private def mdBucket(tok: org.apache.spark.sql.Column,
      m: Int): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(tok), 1, 2), 16, 10).cast("int"), lit(m))

  private def duckBucket(e: String, m: Int): String =
    s"((16 * (strpos('0123456789abcdef', substr(md5($e), 1, 1)) - 1) + " +
      s"(strpos('0123456789abcdef', substr(md5($e), 2, 1)) - 1)) % $m)"

  /** DSIR-style importance resampling (Xie et al. 2023, public): score
    * every document by how target-like its hashed unigram features are —
    * avg over tokens of ln p_target(bucket) − ln p_raw(bucket), both
    * add-one-smoothed over 256 md5 buckets — then keep the top quarter.
    * The "target" here is a fixed source allowlist standing in for a
    * curated seed corpus (in production: Wikipedia/books vs crawl).
    *
    * Scale shape: two 256-row histograms (two-phase agg, broadcastable),
    * then a per-token map joined against those tiny tables and one
    * per-doc aggregation — no payload shuffle. The global top-quarter
    * rank is a single-partition window over one row per DOC (fine at
    * sf, the known pattern to swap at 100 TB: take the score threshold
    * from approx_percentile and filter instead). */
  val dsir: QueryDef = QueryDef(
    "x_pipeline_dsir",
    (s, dir) => {
      val targetSrc = Seq("src18", "src7", "src6")
      val tok = docs(s, dir)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), col("source"),
          mdBucket(col("tok"), 256).as("b"))
      val isT = col("source").isin(targetSrc: _*)
      val ct = tok.filter(isT).groupBy(col("b"))
        .agg(count(lit(1)).as("ct"))
      val cr = tok.filter(!isT).groupBy(col("b"))
        .agg(count(lit(1)).as("cr"))
      val tot = tok.agg(
        sum(when(isT, 1L).otherwise(0L)).as("tt"),
        sum(when(!isT, 1L).otherwise(0L)).as("tr"))
      val lr = tok
        .join(broadcast(ct), Seq("b"), "left_outer")
        .join(broadcast(cr), Seq("b"), "left_outer")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          (log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
              (col("tt") + 256)) -
            log((coalesce(col("cr"), lit(0L)) + 1).cast("double") /
              (col("tr") + 256))).as("lr"))
      // per-token terms round to 9 decimals and sum through exact
      // DECIMAL before the mean — a raw avg() over doubles is partial-
      // agg-order-dependent, and a score landing on the 4-decimal
      // rounding boundary would flip ranks between engines (seen once
      // at sf0.1)
      val sc = lr.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"),
          round(sum(round(col("lr"), 9).cast("decimal(28,12)"))
            .cast("double") / count(lit(1)), 4).as("score"))
      val n = sc.agg(count(lit(1)).as("n"))
      // global importance rank without a single-partition window: the
      // per-doc score table range-partitions on (score desc, doc_id) and
      // row numbers merge through broadcast per-range counts
      val ranked = graft.functions.Prefix.over(
          sc.join(docs(s, dir).select(col("doc_id"), col("source")),
            Seq("doc_id")),
          Seq(col("score").desc, col("doc_id")),
          Seq(graft.functions.Prefix.rowNumber("sel_rank64")))
        .withColumn("sel_rank", col("sel_rank64").cast("int"))
        .drop("sel_rank64")
      ranked.crossJoin(broadcast(n))
        .filter(col("sel_rank") <= ceil(col("n") / 4.0))
        .select(col("doc_id"), col("source"), col("n_toks"), col("score"),
          col("sel_rank"))
        .orderBy(col("sel_rank"))
    },
    oracle = Some(s"""
      WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
                 FROM documents),
      tk AS (SELECT doc_id, source, unnest(toks) AS tok FROM t),
      bk AS (SELECT doc_id, source, ${duckBucket("tok", 256)} AS b FROM tk),
      ct AS (SELECT b, count(*) AS ct FROM bk
             WHERE source IN ('src18', 'src7', 'src6') GROUP BY b),
      cr AS (SELECT b, count(*) AS cr FROM bk
             WHERE source NOT IN ('src18', 'src7', 'src6') GROUP BY b),
      tot AS (SELECT
          (SELECT count(*) FROM bk
           WHERE source IN ('src18', 'src7', 'src6')) AS tt,
          (SELECT count(*) FROM bk
           WHERE source NOT IN ('src18', 'src7', 'src6')) AS tr),
      lr AS (SELECT x.doc_id,
               ln(CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) / (tot.tt + 256)) -
               ln(CAST(coalesce(cr.cr, 0) + 1 AS DOUBLE) / (tot.tr + 256))
                 AS lr
             FROM bk x LEFT JOIN ct USING (b) LEFT JOIN cr USING (b)
             CROSS JOIN tot),
      sc AS (SELECT doc_id, count(*) AS n_toks,
               round(CAST(sum(CAST(round(lr, 9) AS DECIMAL(28,12)))
                 AS DOUBLE) / count(*), 4) AS score
             FROM lr GROUP BY doc_id),
      rk AS (SELECT s.doc_id, d.source, s.n_toks, s.score,
               CAST(row_number() OVER (ORDER BY s.score DESC, s.doc_id)
                 AS INT) AS sel_rank
             FROM sc s JOIN documents d USING (doc_id)),
      n AS (SELECT count(*) AS n FROM sc)
      SELECT doc_id, source, n_toks, score, sel_rank
      FROM rk CROSS JOIN n WHERE sel_rank <= ceil(n / 4.0)
      ORDER BY sel_rank"""
    )
  )

  /** Hashed-TF text embedding + cosine top-k (feature-hashing trick,
    * public): each doc becomes a sparse 64-dim term-frequency vector
    * (md5 bucket → count), and the five probe docs (doc_id < 5) retrieve
    * their 5 nearest corpus neighbors by cosine. Bridges the text and
    * vector families without a model: dot products and squared norms
    * stay EXACT INTEGERS (sparse join on bucket, sum of count products),
    * so the only float op is the final normalize — one divide + sqrt,
    * bit-stable across engines, rounded to 4.
    *
    * Scale shape: the probe side is tiny and broadcast; the corpus side
    * is one groupBy(doc, bucket) histogram — candidates are bounded by
    * docs sharing a bucket with a probe (≤ 64 buckets), and the top-k
    * per probe is a bounded window over candidates, not the corpus. */
  val hashEmbed: QueryDef = QueryDef(
    "x_text_hash_embed",
    (s, dir) => {
      val tf = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), mdBucket(col("tok"), 64).as("b"))
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      val nrm = tf.groupBy(col("doc_id"))
        .agg(sum(col("c") * col("c")).as("n2"))
      val q = tf.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), col("b"), col("c").as("qc"))
      val dot = tf.join(broadcast(q), Seq("b"))
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("qc") * col("c")).as("dot"))
      val scored = dot
        .join(nrm.withColumnRenamed("doc_id", "query_id")
          .withColumnRenamed("n2", "qn2"), Seq("query_id"))
        .join(nrm, Seq("doc_id"))
        .select(col("query_id"), col("doc_id"), col("dot"),
          round(col("dot") / sqrt(col("qn2").cast("double") * col("n2")), 4)
            .as("cos"))
      scored.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("doc_id"))).cast("int"))
        .filter(col("rn") <= 5)
        .orderBy(col("query_id"), col("rn"))
    },
    oracle = Some(s"""
      WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
      tf AS (SELECT doc_id, ${duckBucket("tok", 64)} AS b, count(*) AS c
             FROM tk GROUP BY doc_id, b),
      nrm AS (SELECT doc_id, sum(c * c) AS n2 FROM tf GROUP BY doc_id),
      q AS (SELECT doc_id AS query_id, b, c AS qc FROM tf WHERE doc_id < 5),
      dt AS (SELECT q.query_id, t.doc_id, CAST(sum(q.qc * t.c) AS BIGINT)
                 AS dot
             FROM tf t JOIN q USING (b) WHERE t.doc_id <> q.query_id
             GROUP BY q.query_id, t.doc_id),
      sc AS (SELECT d.query_id, d.doc_id, d.dot,
               round(d.dot / sqrt(CAST(nq.n2 AS DOUBLE) * nc.n2), 4) AS cos
             FROM dt d
               JOIN nrm nq ON nq.doc_id = d.query_id
               JOIN nrm nc ON nc.doc_id = d.doc_id),
      rk AS (SELECT query_id, doc_id, dot, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, doc_id) AS INT) AS rn
             FROM sc)
      SELECT query_id, doc_id, dot, cos, rn FROM rk
      WHERE rn <= 5 ORDER BY query_id, rn""")
  )

  /** Data-quality expectations gate (Deequ-style, public pattern): one
    * scan of the corpus computes every check's violation count — null
    * text, duplicate ids, out-of-vocabulary language, n_chars
    * inconsistent with the text, length bounds — then unpivots into one
    * row per check with a pass flag. The contract a training pipeline
    * runs before accepting an ingest batch: a single failed row blocks
    * the batch, and the violation counts say how bad.
    *
    * Scale shape: one two-phase aggregation (count-distinct for the
    * uniqueness check is the only shuffle-heavy piece); the unpivot
    * touches a single row. */
  val expectations: QueryDef = QueryDef(
    "x_pipeline_expectations",
    (s, dir) => {
      val d = docs(s, dir)
      val langs = Seq("en", "de", "fr", "es", "zh")
      d.agg(
          count(lit(1)).as("n"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_text"),
          (count(lit(1)) - countDistinct(col("doc_id"))).as("dup_ids"),
          sum(when(!col("lang").isin(langs: _*), 1L).otherwise(0L))
            .as("bad_lang"),
          sum(when(col("n_chars") =!= length(col("text")), 1L)
            .otherwise(0L)).as("len_mismatch"),
          sum(when(col("n_chars") < 1 || col("n_chars") > 100000, 1L)
            .otherwise(0L)).as("len_oob"))
        .select(expr(
          "stack(6, " +
            "'row_count', n, n > 0, " +
            "'null_text', null_text, null_text = 0, " +
            "'dup_doc_id', dup_ids, dup_ids = 0, " +
            "'bad_lang', bad_lang, bad_lang = 0, " +
            "'len_mismatch', len_mismatch, len_mismatch = 0, " +
            "'len_out_of_bounds', len_oob, len_oob = 0) " +
            "AS (check_name, metric, pass)"))
        .orderBy(col("check_name"))
    },
    oracle = Some("""
      WITH a AS (SELECT count(*) AS n,
          sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS null_text,
          count(*) - count(DISTINCT doc_id) AS dup_ids,
          sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh')
              THEN 1 ELSE 0 END) AS bad_lang,
          sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
            AS len_mismatch,
          sum(CASE WHEN n_chars < 1 OR n_chars > 100000 THEN 1 ELSE 0 END)
            AS len_oob
        FROM documents)
      SELECT check_name, CAST(metric AS BIGINT) AS metric, pass FROM (
        SELECT 'row_count' AS check_name, n AS metric, n > 0 AS pass FROM a
        UNION ALL SELECT 'null_text', null_text, null_text = 0 FROM a
        UNION ALL SELECT 'dup_doc_id', dup_ids, dup_ids = 0 FROM a
        UNION ALL SELECT 'bad_lang', bad_lang, bad_lang = 0 FROM a
        UNION ALL SELECT 'len_mismatch', len_mismatch, len_mismatch = 0 FROM a
        UNION ALL SELECT 'len_out_of_bounds', len_oob, len_oob = 0 FROM a)
      ORDER BY check_name""")
  )

  /** Distribution-drift detection between two corpus snapshots via the
    * population stability index (PSI, standard model-monitoring metric):
    * docs split by id parity stand in for last-week/this-week ingests;
    * each monitored feature (length in fixed 50-char buckets capped at
    * 10, language) gets PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) with add-one
    * smoothing over the feature's observed bucket domain. PSI > 0.2 is
    * the conventional "investigate the pipeline" alarm.
    *
    * Scale shape: two grouped histograms (buckets ≤ max(10, |langs|)),
    * all float math on the tiny bucket table; the per-feature sum folds
    * over buckets in sorted order (`aggregate` over a sort_array'd
    * list), so distributed execution and the serial oracle add in the
    * identical sequence. */
  val driftPsi: QueryDef = QueryDef(
    "x_pipeline_drift_psi",
    (s, dir) => {
      val d = docs(s, dir)
      val feats = d.select(
          when(pmod(col("doc_id"), lit(2)) === 0, lit("old"))
            .otherwise(lit("new")).as("side"),
          expr("least(n_chars div 50, 9)").cast("string").as("len_b"),
          col("lang"))
      val b = feats.select(col("side"), lit("len_bucket").as("feature"),
          col("len_b").as("bucket"))
        .union(feats.select(col("side"), lit("lang").as("feature"),
          col("lang").as("bucket")))
      val cnt = b.groupBy(col("feature"), col("bucket"))
        .agg(sum(when(col("side") === "old", 1L).otherwise(0L)).as("co"),
          sum(when(col("side") === "new", 1L).otherwise(0L)).as("cn"))
      val tot = cnt.groupBy(col("feature"))
        .agg(sum(col("co")).as("n_old"), sum(col("cn")).as("n_new"),
          count(lit(1)).as("k"))
      cnt.join(tot, Seq("feature"))
        .select(col("feature"), col("bucket"),
          ((col("co") + 1) / (col("n_old") + col("k")) -
            (col("cn") + 1) / (col("n_new") + col("k"))).as("diff"),
          log(((col("co") + 1) / (col("n_old") + col("k"))) /
            ((col("cn") + 1) / (col("n_new") + col("k")))).as("lr"),
          col("n_old"), col("n_new"), col("k"))
        .groupBy(col("feature"), col("n_old"), col("n_new"), col("k"))
        .agg(round(expr(
          "aggregate(transform(sort_array(collect_list(" +
            "struct(bucket, diff * lr))), t -> t.col2), " +
            "0.0d, (acc, x) -> acc + x)"), 4).as("psi"))
        .select(col("feature"), col("n_old"), col("n_new"), col("k"),
          col("psi"))
        .orderBy(col("feature"))
    },
    oracle = Some("""
      WITH f AS (SELECT CASE WHEN doc_id % 2 = 0 THEN 'old' ELSE 'new' END
                   AS side,
                 CAST(least(n_chars // 50, 9) AS VARCHAR) AS len_b, lang
                 FROM documents),
      b AS (SELECT side, 'len_bucket' AS feature, len_b AS bucket FROM f
            UNION ALL SELECT side, 'lang', lang FROM f),
      cnt AS (SELECT feature, bucket,
                sum(CASE WHEN side = 'old' THEN 1 ELSE 0 END) AS co,
                sum(CASE WHEN side = 'new' THEN 1 ELSE 0 END) AS cn
              FROM b GROUP BY feature, bucket),
      tot AS (SELECT feature, sum(co) AS n_old, sum(cn) AS n_new,
                count(*) AS k
              FROM cnt GROUP BY feature),
      term AS (SELECT c.feature, c.bucket, t.n_old, t.n_new, t.k,
                 ((c.co + 1) / CAST(t.n_old + t.k AS DOUBLE) -
                  (c.cn + 1) / CAST(t.n_new + t.k AS DOUBLE)) *
                 ln(((c.co + 1) / CAST(t.n_old + t.k AS DOUBLE)) /
                    ((c.cn + 1) / CAST(t.n_new + t.k AS DOUBLE))) AS x
               FROM cnt c JOIN tot t USING (feature))
      SELECT feature, CAST(n_old AS BIGINT) AS n_old,
             CAST(n_new AS BIGINT) AS n_new, CAST(k AS BIGINT) AS k,
             round(list_reduce(list_prepend(0.0,
               list(x ORDER BY bucket)), (a, v) -> a + v), 4) AS psi
      FROM term GROUP BY feature, n_old, n_new, k ORDER BY feature""")
  )

  /** Deterministic k-fold cross-validation assignment (k=5): fold =
    * fingerprint64("fold:" + doc_id) mod 5 — salt-independent of every
    * other pipeline hash (split/shuffle/sample), so fold membership never
    * correlates with split or shard membership. Reports, per fold, the
    * held-out size and the complementary training-set size — the balance
    * check a CV harness logs before training k models.
    *
    * Scale shape: the assignment is a per-row map over the scan (no
    * shuffle); the report aggregates k=5 rows, and the complement
    * n_train = total − n_val folds the broadcast grand total over those
    * 5 rows, not a second corpus pass. */
  val kfold: QueryDef = QueryDef(
    "x_pipeline_kfold",
    (s, dir) => {
      val folds = docs(s, dir)
        .withColumn("fold", pmod(fingerprint64(
          concat(lit("fold:"), col("doc_id").cast("string"))), lit(5L)))
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_val"), sum(col("n_chars")).as("val_chars"))
      val total = folds.agg(sum(col("n_val")).as("n_total"))
      folds.crossJoin(broadcast(total))
        .withColumn("n_train", col("n_total") - col("n_val"))
        .select(col("fold"), col("n_val"), col("val_chars"), col("n_train"))
        .orderBy(col("fold"))
    },
    oracle = Some("""
      WITH f AS (
        SELECT doc_id, n_chars,
          list_reduce(
            list_prepend(0::HUGEINT,
              list_transform(range(1,
                  octet_length(encode('fold:' || doc_id)) + 1),
                i -> CAST((strpos('0123456789ABCDEF',
                         substr(hex(encode('fold:' || doc_id)), i*2-1, 1))
                         - 1) * 16
                   + (strpos('0123456789ABCDEF',
                         substr(hex(encode('fold:' || doc_id)), i*2, 1))
                         - 1) AS HUGEINT))),
            (acc, b) -> (acc * 1000003::HUGEINT + b)
                        % 18446744073709551616::HUGEINT) AS acc
        FROM documents),
      sg AS (SELECT n_chars,
               ((CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
                           THEN acc - 18446744073709551616::HUGEINT
                           ELSE acc END AS BIGINT) % 5) + 5) % 5
                 AS fold
             FROM f),
      agg AS (SELECT fold, count(*) AS n_val,
                CAST(sum(n_chars) AS BIGINT) AS val_chars
              FROM sg GROUP BY fold)
      SELECT fold, n_val, val_chars,
             CAST(sum(n_val) OVER () - n_val AS BIGINT) AS n_train
      FROM agg ORDER BY fold""")
  )

  /** Kneser-Ney-smoothed bigram LM scoring — the standard-smoothing
    * upgrade of x_text_lm_score's add-one: absolute discounting (D=0.75)
    * backed off to the CONTINUATION unigram (how many distinct contexts
    * a word follows, not how often it occurs — the "San Francisco"
    * correction: "Francisco" is frequent but follows only one context,
    * so KN scores it low as a novel continuation). All four count
    * tables (bigram, context, distinct-successor, distinct-predecessor)
    * are exact integers from two-phase aggs; P(w2|w1) =
    * max(c12−D,0)/c1 + D·N1+(w1,·)/c1 · N1+(·,w2)/|bigram types|.
    * Scoring the training corpus itself means no zero-context rows.
    *
    * Scale shape: same as the add-one LM — the model tables join the
    * doc-bigram stream BY KEY (corpus-vocabulary-sized, never
    * broadcast); only the scalar type-count broadcasts. */
  val lmScoreKn: QueryDef = QueryDef(
    "x_text_lm_kn",
    (s, dir) => {
      val D = 0.75
      val base = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
      val bg = base.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(element_at(toks, i + 1) AS w1, " +
          "element_at(toks, i + 2) AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"),
        countDistinct(col("w2")).as("nfwd"))
      val nback = bg.groupBy(col("w2"))
        .agg(countDistinct(col("w1")).as("nback"))
      val types = c2.agg(count(lit(1)).as("n_types"))
      bg.join(c2, Seq("w1", "w2"))
        .join(c1, Seq("w1"))
        .join(nback, Seq("w2"))
        .crossJoin(broadcast(types))
        .select(col("doc_id"),
          log(greatest(col("c2") - D, lit(0.0)) / col("c1") +
            (lit(D) * col("nfwd") / col("c1")) *
              (col("nback").cast("double") / col("n_types"))).as("lp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(col("lp")), 4).as("avg_logp"))
        .withColumn("ppl", round(exp(-col("avg_logp")), 4))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents
                 WHERE len(string_split(text, ' ')) >= 2),
      bg AS (SELECT doc_id,
               unnest(list_transform(range(0, len(toks) - 1),
                 i -> {'w1': toks[i+1], 'w2': toks[i+2]}), recursive := true)
             FROM t),
      c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
      c1 AS (SELECT w1, count(*) AS c1, count(DISTINCT w2) AS nfwd
             FROM bg GROUP BY w1),
      nback AS (SELECT w2, count(DISTINCT w1) AS nback FROM bg GROUP BY w2),
      types AS (SELECT count(*) AS n_types FROM c2),
      lp AS (SELECT bg.doc_id,
               ln(greatest(c2.c2 - 0.75, 0.0) / c1.c1 +
                  (0.75 * c1.nfwd / c1.c1) *
                    (CAST(nback.nback AS DOUBLE) / types.n_types)) AS lp
             FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
                     JOIN nback USING (w2)
             CROSS JOIN types)
      SELECT doc_id, count(*) AS n_bigrams,
             round(avg(lp), 4) AS avg_logp,
             round(exp(-round(avg(lp), 4)), 4) AS ppl
      FROM lp GROUP BY doc_id ORDER BY doc_id""")
  )

  /** More-like-this retrieval — document-to-document search (the "related
    * articles" / "find duplicates of this ticket" query): each query doc
    * (doc_id < 5) is summarized to its top-5 TF-IDF terms, and candidates
    * are scored by the summed idf of the SHARED selected terms — the
    * Lucene MoreLikeThis recipe (select by tf·idf, score by idf overlap),
    * with the same Lucene idf and round-before-rank policy as
    * x_search_bm25.
    *
    * Scale shape: term selection prunes each query doc to 5 terms, so
    * the candidate join fans out by posting-list length of 5·|queries|
    * rare-ish terms, never the full token inventory; tf/df are the same
    * two-phase tables BM25 builds, N is one broadcast scalar. At 100 TB
    * the df table is an index artifact shared with the BM25 path. */
  val moreLikeThis: QueryDef = QueryDef(
    "x_search_more_like_this",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tf = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val st = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val wSel = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("token"))
      val qsel = tf.filter(col("doc_id") < 5)
        .join(df, Seq("token"))
        .crossJoin(broadcast(st))
        .withColumn("idf", log((col("n_docs") - col("df") + 0.5) /
          (col("df") + 0.5) + 1))
        .withColumn("tfidf", round(col("tf") * col("idf"), 4))
        .withColumn("trk", row_number().over(wSel))
        .filter(col("trk") <= 5)
        .select(col("doc_id").as("q_id"), col("token"), col("idf"))
      val wR = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("doc_id"))
      qsel.join(tf.select(col("doc_id"), col("token")), Seq("token"))
        .filter(col("doc_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(round(sum(col("idf")), 4).as("score"),
          count(lit(1)).as("n_shared"))
        .withColumn("rk", row_number().over(wR))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk"), col("doc_id"), col("score"),
          col("n_shared"))
        .orderBy(col("q_id"), col("rk"))
    },
    oracle = Some("""
      WITH tf AS (SELECT doc_id, token, count(*) AS tf FROM (
                    SELECT doc_id, unnest(string_split(text, ' ')) AS token
                    FROM documents)
                  GROUP BY doc_id, token),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      st AS (SELECT count(*) AS n_docs FROM documents),
      qsel AS (SELECT doc_id AS q_id, token, idf FROM (
          SELECT tf.doc_id, tf.token,
            ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1) AS idf,
            row_number() OVER (PARTITION BY tf.doc_id
              ORDER BY round(tf.tf *
                ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1), 4) DESC,
                tf.token) AS trk
          FROM tf JOIN df USING (token) CROSS JOIN st
          WHERE tf.doc_id < 5) WHERE trk <= 5),
      sc AS (SELECT q.q_id, tf.doc_id, round(sum(q.idf), 4) AS score,
               count(*) AS n_shared
             FROM qsel q JOIN tf ON tf.token = q.token
                               AND tf.doc_id <> q.q_id
             GROUP BY q.q_id, tf.doc_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY score DESC, doc_id) AS rk
            FROM sc)
      SELECT q_id, CAST(rk AS INTEGER) AS rk, doc_id, score, n_shared
      FROM r WHERE rk <= 3
      ORDER BY q_id, rk""")
  )

  /** Dataset card — the datasheet a curated corpus ships with (Datasheets
    * for Datasets / model-card practice): one row per source with size,
    * language spread, token volume, length profile, and the corpus-wide
    * exact-duplicate exposure of that source's docs. This is the
    * release-gate summary a data consumer reads BEFORE training — and
    * because every number is oracle-checked, the card is evidence, not
    * marketing.
    *
    * Scale shape: one digest groupBy (the same shuffle class as
    * x_dedup_exact) feeds dup membership by key; everything else is a
    * single two-phase per-source aggregation. No text shuffles — digests
    * and per-row stats only. */
  val datasetCard: QueryDef = QueryDef(
    "x_pipeline_dataset_card",
    (s, dir) => {
      val d = docs(s, dir).withColumn("digest", md5(col("text")))
      val dupCount = d.groupBy(col("digest"))
        .agg(count(lit(1)).as("n_copies"))
      d.join(dupCount, Seq("digest"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"),
          sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
          round(avg(col("n_chars")), 2).as("mean_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
        .withColumn("dup_frac",
          round(col("n_dup_docs").cast("double") / col("n_docs"), 4))
        .orderBy(col("source"))
    },
    oracle = Some("""
      WITH d AS (SELECT source, lang, n_chars, text, md5(text) AS digest
                 FROM documents),
      dc AS (SELECT digest, count(*) AS n_copies FROM d GROUP BY digest),
      j AS (SELECT d.*, dc.n_copies FROM d JOIN dc USING (digest)),
      a AS (SELECT source, count(*) AS n_docs,
              count(DISTINCT lang) AS n_langs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars,
              CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                AS total_tokens,
              round(avg(n_chars), 2) AS mean_chars,
              min(n_chars) AS min_chars, max(n_chars) AS max_chars,
              CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_dup_docs
            FROM j GROUP BY source)
      SELECT source, n_docs, n_langs, total_chars, total_tokens, mean_chars,
             min_chars, max_chars, n_dup_docs,
             round(CAST(n_dup_docs AS DOUBLE) / n_docs, 4) AS dup_frac
      FROM a ORDER BY source""")
  )

  /** Collocation mining via pointwise mutual information — the classic
    * "New York"-detector (Church & Hanks): PMI = ln(p(ab) / p(a)p(b))
    * over corpus bigram vs unigram frequencies finds word pairs that
    * co-occur far more than chance — multiword expressions a tokenizer
    * or glossary builder wants as single units. Min-count 5 suppresses
    * the low-frequency PMI explosion; scores round to 4 decimals BEFORE
    * ranking (w1, w2 tiebreak) so a 1-ulp ln() difference can't flip a
    * rank — the same policy as x_search_bm25.
    *
    * Scale shape: two two-phase count tables (bigram, unigram) joined BY
    * KEY; the scalar totals broadcast; top-20 is a bounded
    * TakeOrdered — no global sort of the vocabulary. */
  val collocationsPmi: QueryDef = QueryDef(
    "x_text_collocations_pmi",
    (s, dir) => {
      val base = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
      val bg = base.select(explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(element_at(toks, i + 1) AS w1, " +
          "element_at(toks, i + 2) AS w2))")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
      val uni = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val totals = cb.agg(sum(col("cab")).as("nbi"))
        .crossJoin(uni.agg(sum(col("cw")).as("nuni")))
      cb.filter(col("cab") >= 5)
        .join(uni.select(col("w").as("w1"), col("cw").as("ca")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("cw").as("cb2")), Seq("w2"))
        .crossJoin(broadcast(totals))
        .withColumn("pmi", round(log(
          (col("cab").cast("double") / col("nbi")) /
            ((col("ca").cast("double") / col("nuni")) *
              (col("cb2").cast("double") / col("nuni")))), 4))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
        .select(col("w1"), col("w2"), col("cab"), col("ca"),
          col("cb2"), col("pmi"))
    },
    oracle = Some("""
      WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents
                 WHERE len(string_split(text, ' ')) >= 2),
      bg AS (SELECT unnest(list_transform(range(0, len(toks) - 1),
               i -> {'w1': toks[i+1], 'w2': toks[i+2]}),
               recursive := true)
             FROM t),
      cb AS (SELECT w1, w2, count(*) AS cab FROM bg GROUP BY w1, w2),
      uni AS (SELECT w, count(*) AS cw FROM (
                SELECT unnest(string_split(text, ' ')) AS w
                FROM documents) GROUP BY w),
      tot AS (SELECT (SELECT CAST(sum(cab) AS BIGINT) FROM cb) AS nbi,
                     (SELECT CAST(sum(cw) AS BIGINT) FROM uni) AS nuni),
      scored AS (SELECT cb.w1, cb.w2, cb.cab,
                   ua.cw AS ca, ub.cw AS cb2,
                   round(ln((CAST(cb.cab AS DOUBLE) / tot.nbi) /
                     ((CAST(ua.cw AS DOUBLE) / tot.nuni) *
                      (CAST(ub.cw AS DOUBLE) / tot.nuni))), 4) AS pmi
                 FROM cb
                 JOIN uni ua ON ua.w = cb.w1
                 JOIN uni ub ON ub.w = cb.w2
                 CROSS JOIN tot
                 WHERE cb.cab >= 5)
      SELECT w1, w2, cab, ca, cb2, pmi FROM scored
      ORDER BY pmi DESC, w1, w2 LIMIT 20""")
  )

  /** TRAINED quality classifier — logistic regression trained INSIDE
    * the engine (the fastText-quality-classifier shape a curation
    * pipeline trains on externally-supplied "good vs bad" labels): 3
    * scan-stage features per doc (token count/100, mean token length/10,
    * long-token fraction), 8 full-batch gradient steps (η = 2). The
    * demo label is the doc's length class (n_chars > 290) — a label the
    * linear model must genuinely LEARN from token statistics (token
    * count correlates, the threshold doesn't appear in any feature);
    * in production the y column is whatever labels the team has.
    * Training state is FOUR DOUBLES on the driver — the model artifact,
    * like the BPE merge table — and each step is one two-phase gradient
    * aggregation over the corpus.
    *
    * Bit-exactness discipline: per-row gradient terms round to 9
    * decimals, then sum through exact DECIMAL(28,12) — partial-agg order
    * cannot perturb the weights; z = w·x evaluates in one fixed operand
    * order; PREDICTION thresholds on the linear score (z ≥ 0), which
    * needs no sigmoid at all. The oracle replays all 8 steps as unrolled
    * single-row weight CTEs.
    *
    * Scale shape: features are a per-row map; each GD step shuffles one
    * 4-double partial per partition; scoring is a broadcast-free per-row
    * map with literal weights. */
  /** LR features (doc_id, y, x1..x3) over the corpus — shared by the
    * classifier and the active-learning selector. */
  private def lrFeatures(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"),
        (col("n_chars") > 290).cast("int").as("y"),
        size(col("toks")).cast("double")./(lit(100)).as("x1"),
        expr("aggregate(toks, 0, (acc, t) -> acc + length(t))")
          .cast("double")./(size(col("toks")))./(lit(10)).as("x2"),
        expr("size(filter(toks, t -> length(t) > 6))").cast("double")
          ./(size(col("toks"))).as("x3"))
      .barrier()

  /** 8 full-batch GD steps (η = 2), decimal-exact gradient sums; returns
    * the 4 learned weights. */
  private def lrTrain(feats: DataFrame): Array[Double] = {
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 8) {
      val z = col("w0") + col("w1") * col("x1") + col("w2") * col("x2") +
        col("w3") * col("x3")
      val sig = lit(1.0) / (lit(1.0) + exp(-z))
      val withW = feats
        .withColumn("w0", lit(w(0))).withColumn("w1", lit(w(1)))
        .withColumn("w2", lit(w(2))).withColumn("w3", lit(w(3)))
        .withColumn("err", sig - col("y").cast("double"))
      val g = withW.agg(
        count(lit(1)).as("n"),
        sum(round(col("err"), 9).cast("decimal(28,12)")).as("g0"),
        sum(round(col("err") * col("x1"), 9).cast("decimal(28,12)"))
          .as("g1"),
        sum(round(col("err") * col("x2"), 9).cast("decimal(28,12)"))
          .as("g2"),
        sum(round(col("err") * col("x3"), 9).cast("decimal(28,12)"))
          .as("g3")).collect()(0)
      val n = g.getLong(0).toDouble
      for (j <- 0 to 3)
        w(j) = w(j) - 2.0 * (g.getDecimal(j + 1).doubleValue() / n)
    }
    w
  }

  /** The LR training chain as DuckDB CTEs (d0, f, w0..w8), shared by
    * both oracle texts. */
  private def lrCtes: String = {
    val steps = (1 to 8).map { i =>
      s"""g$i AS (SELECT count(*) AS n,
             sum(CAST(round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1
                   + w.w2 * f.x2 + w.w3 * f.x3))) - f.y, 9)
                 AS DECIMAL(28,12))) AS g0,
             sum(CAST(round((1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1
                   + w.w2 * f.x2 + w.w3 * f.x3))) - f.y) * f.x1, 9)
                 AS DECIMAL(28,12))) AS g1,
             sum(CAST(round((1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1
                   + w.w2 * f.x2 + w.w3 * f.x3))) - f.y) * f.x2, 9)
                 AS DECIMAL(28,12))) AS g2,
             sum(CAST(round((1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1
                   + w.w2 * f.x2 + w.w3 * f.x3))) - f.y) * f.x3, 9)
                 AS DECIMAL(28,12))) AS g3
           FROM f CROSS JOIN w${i - 1} w),
      w$i AS (SELECT w.w0 - 2.0 * (CAST(g.g0 AS DOUBLE) / g.n) AS w0,
               w.w1 - 2.0 * (CAST(g.g1 AS DOUBLE) / g.n) AS w1,
               w.w2 - 2.0 * (CAST(g.g2 AS DOUBLE) / g.n) AS w2,
               w.w3 - 2.0 * (CAST(g.g3 AS DOUBLE) / g.n) AS w3
             FROM w${i - 1} w CROSS JOIN g$i g)"""
    }.mkString(",")
    s"""d0 AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks
                  FROM documents
                  WHERE len(string_split(text, ' ')) >= 1),
      f AS (SELECT doc_id,
              CAST(n_chars > 290 AS INTEGER) AS y,
              CAST(len(toks) AS DOUBLE) / 100 AS x1,
              CAST(list_reduce(list_prepend(0,
                  list_transform(toks, t -> length(t))),
                  (a, b) -> a + b) AS DOUBLE) / len(toks) / 10 AS x2,
              CAST(len(list_filter(toks, t -> length(t) > 6)) AS DOUBLE)
                / len(toks) AS x3
            FROM d0),
      w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
      $steps"""
  }

  val qualityClassifier: QueryDef = QueryDef(
    "x_pipeline_quality_classifier",
    (s, dir) => {
      val feats = lrFeatures(s, dir)
      val w = lrTrain(feats)
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
        lit(w(3)) * col("x3")
      feats.withColumn("pred", (z >= 0).cast("int"))
        .groupBy()
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pred") === 1 && col("y") === 1, 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("pred") === 1 && col("y") === 0, 1L).otherwise(0L))
            .as("fp"),
          sum(when(col("pred") === 0 && col("y") === 0, 1L).otherwise(0L))
            .as("tn"),
          sum(when(col("pred") === 0 && col("y") === 1, 1L).otherwise(0L))
            .as("fn"))
        .withColumn("accuracy", round((col("tp") + col("tn")).cast("double")
          / col("n_docs"), 4))
        .withColumn("w0", round(lit(w(0)), 6))
        .withColumn("w1", round(lit(w(1)), 6))
        .withColumn("w2", round(lit(w(2)), 6))
        .withColumn("w3", round(lit(w(3)), 6))
    },
    oracle = Some {
      s"""
      WITH $lrCtes,
      scored AS (SELECT f.y,
                   CASE WHEN w.w0 + w.w1 * f.x1 + w.w2 * f.x2
                             + w.w3 * f.x3 >= 0 THEN 1 ELSE 0 END AS pred
                 FROM f CROSS JOIN w8 w)
      SELECT count(*) AS n_docs,
             CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS tp,
             CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS fp,
             CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS tn,
             CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS fn,
             round(CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END)
               AS DOUBLE) / count(*), 4) AS accuracy,
             round((SELECT w0 FROM w8), 6) AS w0,
             round((SELECT w1 FROM w8), 6) AS w1,
             round((SELECT w2 FROM w8), 6) AS w2,
             round((SELECT w3 FROM w8), 6) AS w3
      FROM scored"""
    }
  )

  /** Active-learning batch selection — the "label next" step of the
    * classifier loop: train the same LR, then pick the 20 documents the
    * model is LEAST certain about (smallest |z| — the margin-uncertainty
    * rule) as the next human-labeling batch. Spending annotation budget
    * at the decision boundary is the standard sample-efficiency win over
    * random labeling. z comes from the identical fixed-order dot
    * product, so the |z| ranking needs no rounding to be deterministic
    * (z rounds to 6 for display only; ranking uses rounded |z| so both
    * engines rank the identical keys, doc_id tiebreak).
    *
    * Scale shape: training as in x_pipeline_quality_classifier; the
    * selection is a bounded top-k by |z| — TakeOrdered, no global
    * sort. */
  val activeLearning: QueryDef = QueryDef(
    "x_pipeline_active_learning",
    (s, dir) => {
      val feats = lrFeatures(s, dir)
      val w = lrTrain(feats)
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
        lit(w(3)) * col("x3")
      feats
        .withColumn("z", round(z, 6))
        .withColumn("pred", (col("z") >= 0).cast("int"))
        .withColumn("unc", abs(col("z")))
        .orderBy(col("unc"), col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("z"), col("pred"), col("y"))
        .orderBy(col("unc"), col("doc_id"))
        .drop("unc")
    },
    oracle = Some(s"""
      WITH $lrCtes,
      scored AS (SELECT f.doc_id, f.y,
                   round(w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3, 6)
                     AS z
                 FROM f CROSS JOIN w8 w),
      pick AS (SELECT doc_id, z,
                 CASE WHEN z >= 0 THEN 1 ELSE 0 END AS pred, y,
                 row_number() OVER (ORDER BY abs(z), doc_id) AS rk
               FROM scored)
      SELECT doc_id, z, pred, y FROM pick WHERE rk <= 20
      ORDER BY abs(z), doc_id""")
  )

  /** Zipf-law fit over the vocabulary — the corpus-health diagnostic a
    * data team reads before trusting token statistics: natural text has
    * rank-frequency slope ≈ −1 in log-log space; a much flatter slope
    * means template soup (all words equally common), a much steeper one
    * means degenerate repetition. OLS over the top-100 ranks in closed
    * form: slope = (Σxy − ΣxΣy/n) / (Σx² − (Σx)²/n) on x = ln rank,
    * y = ln freq. The ln inputs are exact integers, per-point terms
    * round to 9 decimals and sum through exact DECIMAL — the same
    * order-immune discipline as the GD gradients — so the fit replays
    * bit-exactly.
    *
    * Scale shape: one two-phase token count; the fit runs on a bounded
    * top-100 (TakeOrdered), so corpus size only touches the count. */
  val zipfFit: QueryDef = QueryDef(
    "x_text_zipf_fit",
    (s, dir) => {
      val freq = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("w"))
        .limit(100)
      val freqRanked = graft.functions.Prefix.over(freq,
          Seq(col("f").desc, col("w")),
          Seq(graft.functions.Prefix.rowNumber("rank64")), numParts = 4)
        .withColumn("rank", col("rank64").cast("int"))
      val pts = freqRanked.select(
        log(col("rank").cast("double")).as("x"),
        log(col("f").cast("double")).as("y"))
      pts.agg(count(lit(1)).as("n"),
          sum(round(col("x"), 9).cast("decimal(28,12)")).as("sx"),
          sum(round(col("y"), 9).cast("decimal(28,12)")).as("sy"),
          sum(round(col("x") * col("y"), 9).cast("decimal(28,12)"))
            .as("sxy"),
          sum(round(col("x") * col("x"), 9).cast("decimal(28,12)"))
            .as("sxx"))
        .withColumn("slope", round(
          (col("sxy").cast("double") - col("sx").cast("double")
            * col("sy").cast("double") / col("n"))
          / (col("sxx").cast("double") - col("sx").cast("double")
            * col("sx").cast("double") / col("n")), 4))
        .withColumn("intercept", round(
          col("sy").cast("double") / col("n")
          - ((col("sxy").cast("double") - col("sx").cast("double")
              * col("sy").cast("double") / col("n"))
            / (col("sxx").cast("double") - col("sx").cast("double")
              * col("sx").cast("double") / col("n")))
            * col("sx").cast("double") / col("n"), 4))
        .select(col("n"), col("slope"), col("intercept"))
    },
    oracle = Some("""
      WITH freq AS (SELECT w, count(*) AS f FROM (
                      SELECT unnest(string_split(text, ' ')) AS w
                      FROM documents) GROUP BY w
                    ORDER BY f DESC, w LIMIT 100),
      rk AS (SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rank
             FROM freq),
      pts AS (SELECT ln(CAST(rank AS DOUBLE)) AS x,
                ln(CAST(f AS DOUBLE)) AS y
              FROM rk),
      agg AS (SELECT count(*) AS n,
                sum(CAST(round(x, 9) AS DECIMAL(28,12))) AS sx,
                sum(CAST(round(y, 9) AS DECIMAL(28,12))) AS sy,
                sum(CAST(round(x * y, 9) AS DECIMAL(28,12))) AS sxy,
                sum(CAST(round(x * x, 9) AS DECIMAL(28,12))) AS sxx
              FROM pts)
      SELECT n,
             round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sy AS DOUBLE) / n)
               / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / n), 4) AS slope,
             round(CAST(sy AS DOUBLE) / n
               - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sy AS DOUBLE) / n)
                 / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sx AS DOUBLE) / n))
                 * CAST(sx AS DOUBLE) / n, 4) AS intercept
      FROM agg""")
  )

  /** Label-noise audit — the confident-learning step of the classifier
    * loop (the Cleanlab recipe, inverted from active learning): where
    * active learning asks for labels the model is UNSURE about, this
    * flags rows whose label the model CONFIDENTLY contradicts (pred ≠ y
    * with large |z|) — in a real pipeline these are the mislabeled
    * examples that poison training, surfaced for re-annotation. Top-20
    * by |z| DESC among disagreements, doc_id tiebreak on the rounded
    * score.
    *
    * Scale shape: same training as the classifier; the audit is a
    * filter + bounded top-k on (doc_id, z) pairs. */
  val labelNoise: QueryDef = QueryDef(
    "x_pipeline_label_noise",
    (s, dir) => {
      val feats = lrFeatures(s, dir)
      val w = lrTrain(feats)
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
        lit(w(3)) * col("x3")
      feats
        .withColumn("z", round(z, 6))
        .withColumn("pred", (col("z") >= 0).cast("int"))
        .filter(col("pred") =!= col("y"))
        .withColumn("conf", abs(col("z")))
        .orderBy(col("conf").desc, col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("z"), col("pred"), col("y"))
    },
    oracle = Some(s"""
      WITH $lrCtes,
      scored AS (SELECT f.doc_id, f.y,
                   round(w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3, 6)
                     AS z
                 FROM f CROSS JOIN w8 w),
      dis AS (SELECT doc_id, z,
                CASE WHEN z >= 0 THEN 1 ELSE 0 END AS pred, y,
                row_number() OVER (ORDER BY abs(z) DESC, doc_id) AS rk
              FROM scored
              WHERE (CASE WHEN z >= 0 THEN 1 ELSE 0 END) <> y)
      SELECT doc_id, z, pred, y FROM dis WHERE rk <= 20
      ORDER BY abs(z) DESC, doc_id""")
  )

  /** Heaps'-law vocabulary growth — the companion diagnostic to the Zipf
    * fit: natural corpora grow vocabulary sublinearly (V ≈ K·N^β,
    * β ≈ 0.5); a vocabulary that SATURATES (flat curve) is template
    * soup, one that grows linearly is noise/IDs. Computed exactly and
    * order-independently: each token's FIRST-SEEN doc (min doc_id)
    * turns the curve into a cumulative histogram over doc_id
    * thresholds — no sequential scan, two two-phase aggs.
    *
    * Scale shape: the first-seen table is vocabulary-sized, keyed by
    * token; the curve collapses to |thresholds| rows. */
  val heapsGrowth: QueryDef = QueryDef(
    "x_text_vocab_growth",
    (s, dir) => {
      val thresholds = Seq(50L, 100L, 200L, 300L, 400L, 500L)
      val firstSeen = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(min(col("doc_id")).as("first_doc"))
      // each token votes into every threshold beyond its first sighting —
      // a constant-width explode, no non-equi join against the vocabulary
      firstSeen
        .select(explode(array(thresholds.map(t =>
          when(col("first_doc") < t, lit(t))): _*)).as("n_docs"))
        .filter(col("n_docs").isNotNull)
        .groupBy(col("n_docs"))
        .agg(count(lit(1)).as("vocab_size"))
        .crossJoin(broadcast(
          firstSeen.agg(count(lit(1)).as("vocab_total"))))
        .select(col("n_docs"), col("vocab_size"), col("vocab_total"))
        .orderBy(col("n_docs"))
    },
    oracle = Some("""
      WITH fs AS (SELECT w, min(doc_id) AS first_doc FROM (
                    SELECT doc_id, unnest(string_split(text, ' ')) AS w
                    FROM documents) GROUP BY w),
      vt AS (SELECT CAST(count(*) AS BIGINT) AS vocab_total FROM fs),
      th AS (SELECT CAST(unnest([50, 100, 200, 300, 400, 500]) AS BIGINT)
               AS n_docs)
      SELECT th.n_docs,
             CAST(count(*) AS BIGINT) AS vocab_size,
             vt.vocab_total
      FROM fs JOIN th ON fs.first_doc < th.n_docs CROSS JOIN vt
      GROUP BY th.n_docs, vt.vocab_total
      ORDER BY th.n_docs""")
  )

  /** Probability calibration curve (reliability diagram) — the check
    * that the classifier's SCORES mean what they claim: bucket σ(z)
    * into deciles and compare each bucket's mean predicted probability
    * against its OBSERVED positive rate. A well-calibrated model tracks
    * the diagonal; a curve bowed away from it says the probabilities
    * need temperature scaling before any threshold set on them can be
    * trusted. Mean predicted prob uses the decimal-exact-sum
    * discipline; observed rate is exact integers.
    *
    * Scale shape: training as before; the diagram is a 10-row two-phase
    * aggregation over (bucket, y, rounded σ). */
  val calibration: QueryDef = QueryDef(
    "x_pipeline_calibration",
    (s, dir) => {
      val feats = lrFeatures(s, dir)
      val w = lrTrain(feats)
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
        lit(w(3)) * col("x3")
      feats
        .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
        .withColumn("bucket",
          least(floor(col("p") * 10).cast("long"), lit(9L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("p").cast("decimal(18,6)")).cast("double")
            / count(lit(1)), 4).as("mean_pred"),
          round(sum(col("y")).cast("double") / count(lit(1)), 4)
            .as("obs_rate"))
        .orderBy(col("bucket"))
    },
    oracle = Some(s"""
      WITH $lrCtes,
      sc AS (SELECT f.y,
               round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2
                 + w.w3 * f.x3))), 6) AS p
             FROM f CROSS JOIN w8 w),
      bk AS (SELECT y, p,
               CAST(least(CAST(floor(p * 10) AS INTEGER), 9) AS BIGINT)
                 AS bucket
             FROM sc)
      SELECT bucket, count(*) AS n,
             round(CAST(sum(CAST(p AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 4) AS mean_pred,
             round(CAST(sum(y) AS DOUBLE) / count(*), 4) AS obs_rate
      FROM bk GROUP BY bucket ORDER BY bucket""")
  )

  /** Exact ROC AUC of the trained classifier — the threshold-free
    * discrimination metric, computed as the Mann-Whitney rank statistic
    * with tie-corrected average ranks: AUC = (Σ_{pos} R̄ − P(P+1)/2) /
    * (P·N). Everything up to the final division is INTEGER arithmetic
    * (u2 carries 2× the U statistic so tie half-ranks stay integral),
    * so the metric is exact — no trapezoid sums, no fp accumulation.
    *
    * Scale shape: scores round to 6 decimals, so the corpus first
    * collapses to the DISTINCT-score domain (z, count, positives) with
    * one two-phase aggregation; the tie-corrected ranks come from a
    * range-partitioned prefix-scan over that bounded domain
    * ([[graft.functions.Prefix]]) — no single-partition window, and the
    * per-row table never moves after the collapse. */
  val aucMetric: QueryDef = QueryDef(
    "x_pipeline_auc",
    (s, dir) => {
      val feats = lrFeatures(s, dir)
      val w = lrTrain(feats)
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
        lit(w(3)) * col("x3")
      // collapse to the DISTINCT rounded-score domain before ranking:
      // scores round to 6 decimals, so (z, row count, positive count) is
      // a bounded domain table; the tie-corrected rank then needs only a
      // global cumulative row count over that domain, which Prefix.over
      // computes with range-partitioned windows — no row of the scored
      // corpus ever passes through a single-partition WindowExec
      val dom = feats.select(col("y"), round(z, 6).as("z"))
        .groupBy(col("z"))
        .agg(count(lit(1)).as("tiecnt"),
          sum(col("y").cast("long")).as("pos"))
      val ranked = graft.functions.Prefix.over(dom, Seq(col("z")),
          Seq(graft.functions.Prefix.sumOf(col("tiecnt"), "cum")))
        .withColumn("minrk", col("cum") - col("tiecnt") + 1L)
        .withColumn("avg2", lit(2L) * col("minrk") + col("tiecnt") - 1L)
      ranked.agg(
          sum(col("pos")).as("n_pos"),
          sum(col("tiecnt") - col("pos")).as("n_neg"),
          sum(col("pos") * col("avg2")).as("sum2"))
        .withColumn("u2",
          col("sum2") - col("n_pos") * (col("n_pos") + 1))
        .withColumn("auc", round(col("u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6))
        .select(col("n_pos"), col("n_neg"), col("u2"), col("auc"))
    },
    oracle = Some(s"""
      WITH $lrCtes,
      sc AS (SELECT f.y,
               round(w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3, 6)
                 AS z
             FROM f CROSS JOIN w8 w),
      rk AS (SELECT y, z,
               CAST(rank() OVER (ORDER BY z) AS BIGINT) AS minrk,
               CAST(count(*) OVER (PARTITION BY z) AS BIGINT) AS tiecnt
             FROM sc),
      a AS (SELECT CAST(sum(y) AS BIGINT) AS n_pos,
              CAST(sum(1 - y) AS BIGINT) AS n_neg,
              CAST(sum(CASE WHEN y = 1
                       THEN 2 * minrk + tiecnt - 1 ELSE 0 END)
                AS BIGINT) AS sum2
            FROM rk)
      SELECT n_pos, n_neg,
             sum2 - n_pos * (n_pos + 1) AS u2,
             round(CAST(sum2 - n_pos * (n_pos + 1) AS DOUBLE)
               / (2.0 * n_pos * n_neg), 6) AS auc
      FROM a""")
  )

  /** Jensen-Shannon divergence of each SOURCE's token distribution from
    * the corpus — the source-homogeneity diagnostic that complements
    * x_pipeline_drift_psi's across-TIME drift: a source whose JSD spikes
    * writes in a different vocabulary than the rest of the corpus
    * (scraper drift, wrong-language feed, spam injection). Distributions
    * live over the corpus top-50 tokens + an OTHER bucket (bounded,
    * identical support everywhere), add-one smoothed; JSD =
    * ½KL(p‖m) + ½KL(q‖m), m = ½(p+q), bounded in [0, ln 2]. Per-bucket
    * terms round to 12 decimals and sum through exact DECIMAL, so the
    * partial-agg order can't perturb the statistic.
    *
    * Scale shape: one two-phase corpus count + a bounded top-50, then a
    * per-(source, token) count joined BY KEY against the broadcast
    * corpus distribution; |sources| × 51 term rows aggregate at the
    * end. */
  val sourceJsd: QueryDef = QueryDef(
    "x_text_source_jsd",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
      val top = toks.groupBy(col("w")).agg(count(lit(1)).as("cw"))
        .orderBy(col("cw").desc, col("w")).limit(50)
        .select(col("w"))
      val bucketed = toks.join(broadcast(top).withColumn("keep", lit(1)),
          Seq("w"), "left")
        .select(col("source"),
          when(col("keep").isNotNull, col("w")).otherwise(lit("OTHER"))
            .as("b"))
      val srcCnt = bucketed.groupBy(col("source"), col("b"))
        .agg(count(lit(1)).as("c"))
      val srcTot = bucketed.groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"))
      val corpCnt = bucketed.groupBy(col("b"))
        .agg(count(lit(1)).as("cc"))
      val corpTot = bucketed.agg(count(lit(1)).as("nc"))
      val nBuckets = lit(51)
      // full (source × bucket) spine so zero-count buckets smooth in
      val spine = srcTot.crossJoin(
        broadcast(corpCnt.select(col("b"))))
      spine
        .join(srcCnt, Seq("source", "b"), "left")
        .join(broadcast(corpCnt), Seq("b"))
        .crossJoin(broadcast(corpTot))
        .withColumn("p", (coalesce(col("c"), lit(0L)) + 1).cast("double")
          / (col("n_tokens") + nBuckets))
        .withColumn("q", (col("cc") + 1).cast("double")
          / (col("nc") + nBuckets))
        .withColumn("m", (col("p") + col("q")) / 2)
        .withColumn("term",
          (col("p") * log(col("p") / col("m"))
            + col("q") * log(col("q") / col("m"))) / 2)
        .groupBy(col("source"), col("n_tokens"))
        .agg(round(sum(round(col("term"), 12).cast("decimal(28,14)"))
          .cast("double"), 6).as("jsd"))
        .orderBy(col("source"))
    },
    oracle = Some("""
      WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS w
                    FROM documents),
      top AS (SELECT w FROM (SELECT w, count(*) AS cw FROM toks GROUP BY w
                             ORDER BY cw DESC, w LIMIT 50)),
      bk AS (SELECT t.source,
               CASE WHEN top.w IS NOT NULL THEN t.w
                    ELSE chr(1) || 'OTHER' END AS b
             FROM toks t LEFT JOIN top ON top.w = t.w),
      sc AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c
             FROM bk GROUP BY source, b),
      st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
             FROM bk GROUP BY source),
      cc AS (SELECT b, CAST(count(*) AS BIGINT) AS cc FROM bk GROUP BY b),
      ct AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM bk),
      sp AS (SELECT st.source, st.n_tokens, cc.b, cc.cc
             FROM st CROSS JOIN cc),
      t AS (SELECT sp.source, sp.n_tokens,
              CAST(coalesce(sc.c, 0) + 1 AS DOUBLE)
                / (sp.n_tokens + 51) AS p,
              CAST(sp.cc + 1 AS DOUBLE) / (ct.nc + 51) AS q
            FROM sp LEFT JOIN sc ON sc.source = sp.source AND sc.b = sp.b
            CROSS JOIN ct),
      t2 AS (SELECT source, n_tokens,
               (p * ln(p / ((p + q) / 2))
                + q * ln(q / ((p + q) / 2))) / 2 AS term
             FROM t)
      SELECT source, n_tokens,
             round(CAST(sum(CAST(round(term, 12) AS DECIMAL(28,14)))
               AS DOUBLE), 6) AS jsd
      FROM t2 GROUP BY source, n_tokens ORDER BY source""")
  )

  /** Precision/recall curve at nine probability thresholds — the
    * operating-point table that turns the classifier into a POLICY: a
    * curation run picks the threshold whose precision meets its
    * contamination budget and reads off the recall it pays. All counts
    * are exact integers over the rounded-6 σ scores; P/R/F1 are single
    * divisions with explicit empty-denominator rules.
    *
    * Scale shape: the threshold explode is constant-width (×9); one
    * two-phase agg keyed by threshold. */
  val prCurve: QueryDef = QueryDef(
    "x_pipeline_pr_curve",
    (s, dir) => {
      val feats = lrFeatures(s, dir)
      val w = lrTrain(feats)
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
        lit(w(3)) * col("x3")
      val ths = (1 to 9).map(t => lit(t / 10.0))
      feats
        .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
        .select(col("y"), col("p"),
          explode(array(ths: _*)).as("threshold"))
        .withColumn("pred", (col("p") >= col("threshold")).cast("int"))
        .groupBy(col("threshold"))
        .agg(
          sum(when(col("pred") === 1 && col("y") === 1, 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("pred") === 1 && col("y") === 0, 1L).otherwise(0L))
            .as("fp"),
          sum(when(col("pred") === 0 && col("y") === 1, 1L).otherwise(0L))
            .as("fn"))
        .withColumn("precision", when(col("tp") + col("fp") === 0, 0.0)
          .otherwise(round(col("tp").cast("double")
            / (col("tp") + col("fp")), 4)))
        .withColumn("recall", when(col("tp") + col("fn") === 0, 0.0)
          .otherwise(round(col("tp").cast("double")
            / (col("tp") + col("fn")), 4)))
        .withColumn("f1", when(col("precision") + col("recall") === 0.0, 0.0)
          .otherwise(round(lit(2.0) * col("precision") * col("recall")
            / (col("precision") + col("recall")), 4)))
        .orderBy(col("threshold"))
    },
    oracle = Some(s"""
      WITH $lrCtes,
      sc AS (SELECT f.y,
               round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2
                 + w.w3 * f.x3))), 6) AS p
             FROM f CROSS JOIN w8 w),
      th AS (SELECT CAST(unnest(
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE)
               AS threshold),
      ex AS (SELECT sc.y, sc.p, th.threshold,
               CASE WHEN sc.p >= th.threshold THEN 1 ELSE 0 END AS pred
             FROM sc CROSS JOIN th),
      ag AS (SELECT threshold,
               CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS tp,
               CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fp,
               CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fn
             FROM ex GROUP BY threshold),
      pr AS (SELECT threshold, tp, fp, fn,
               CASE WHEN tp + fp = 0 THEN 0.0
                    ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 4)
                 END AS precision,
               CASE WHEN tp + fn = 0 THEN 0.0
                    ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 4)
                 END AS recall
             FROM ag)
      SELECT threshold, tp, fp, fn, precision, recall,
             CASE WHEN precision + recall = 0.0 THEN 0.0
                  ELSE round(2.0 * precision * recall
                    / (precision + recall), 4) END AS f1
      FROM pr ORDER BY threshold""")
  )

  def defs: Seq[QueryDef] = Seq(langId, quality, tokenCount, topTokens,
    fingerprint, curate, bigrams, sample, pack, tfidf, stratified, piiRedact,
    repetition, contamination, mix, e2e, bm25, entropy, kanon, wsample,
    hybridRrf, lmScore, manifest, cmsHeavyHitters, hllDistinct, budgetMix,
    split3, domainCap, shuffleShards, phraseSearch, dsir, hashEmbed,
    expectations, driftPsi, kfold, lmScoreKn, moreLikeThis, datasetCard,
    collocationsPmi, qualityClassifier, activeLearning, zipfFit, labelNoise,
    heapsGrowth, calibration, aucMetric, sourceJsd, prCurve)
}
