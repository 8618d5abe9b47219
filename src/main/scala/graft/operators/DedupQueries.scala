package graft.operators

import graft.sources.Checkpoints.BarrierOps
import graft.{QueryDef, Tables}
import graft.functions.HashFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (extension suite —
  * the reference's only dedup is DISTINCT / GROUP BY; these add the
  * large-corpus near-dup machinery a 100 TB text pipeline needs).
  *
  * Scale design notes:
  *  - exact dedup = hash-groupBy on a digest — one shuffle on the digest,
  *    never on the document text;
  *  - MinHash-LSH: per-doc signature is a codegen'd map (no shuffle), then
  *    candidates come from a band-key equi-join — the join key is
  *    (band_id, band_hash), so cost scales with collisions, not |docs|²;
  *  - SimHash: 4×16-bit chunk banding gives the same join-not-crossjoin
  *    property for hamming-distance near-dups.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** 8×4 banding of a 32-long minhash `sig` column: one (doc_id,
    * band_id, band_key) row per band, where the key is the raw 4-hash
    * signature slice (a struct — same shuffle properties as a re-hash,
    * zero collision risk, and the DuckDB oracles rebuild the identical
    * key). The single source of truth for band count/width; every
    * banded dedup op (LSH, clusters, incremental, cc) goes through
    * here, so a band-geometry change cannot desynchronize them. */
  private def minhashBands(withSig: DataFrame,
      materialize: Boolean = true): DataFrame = {
    val bands = withSig
      .select(col("doc_id"),
        posexplode(expr("transform(sequence(0, 7), " +
          "b -> struct(sig[b*4] AS h0, sig[b*4+1] AS h1, " +
          "sig[b*4+2] AS h2, sig[b*4+3] AS h3))")))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_key")
    // materialize ONCE: every banded op reads the band table at least
    // twice (bucket-rep aggregation + member join); without this each
    // reference re-runs the 32-hash signature map over the tokenized
    // corpus — the dominant per-row compute of the whole family.
    // Checkpointed state is (id, band_id, 4 longs) only, never text.
    // Callers that read the bands exactly once (the streaming classify
    // path, whose artifacts persist to parquet anyway) skip the barrier.
    if (materialize) bands.barrier() else bands
  }

  /** Exact dedup via content digest: first occurrence wins, copies counted
    * (hash-groupBy — the scalable exact-dedup plan). */
  val exact: QueryDef = QueryDef(
    "x_dedup_exact",
    (s, dir) => {
      val w = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
      docs(s, dir)
        .withColumn("digest", md5(col("text")))
        .withColumn("dup_rank", row_number().over(w))
        .withColumn("n_copies", count(lit(1))
          .over(Window.partitionBy(col("digest"))))
        .select(col("doc_id"), col("digest"),
          col("dup_rank"), col("n_copies"),
          (col("dup_rank") === 1).as("is_canonical"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      SELECT doc_id, md5(text) AS digest,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank,
             count(*) OVER (PARTITION BY md5(text)) AS n_copies,
             (row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
               AS is_canonical
      FROM documents ORDER BY doc_id""")
  )

  /** Token-set Jaccard similarity between consecutive doc_ids — the exact
    * n-gram-Jaccard verification kernel, oracle-checkable in SQL. */
  val ngramJaccard: QueryDef = QueryDef(
    "x_dedup_jaccard",
    (s, dir) => {
      val a = docs(s, dir).select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks_a"))
      val b = docs(s, dir).select((col("doc_id") - 1).as("b_prev"),
        array_distinct(split(col("text"), " ")).as("toks_b"))
      a.join(b, col("doc_id") === col("b_prev"))
        .select(col("doc_id"),
          (size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
            size(array_union(col("toks_a"), col("toks_b"))))
            .as("jaccard_next"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
                 FROM documents)
      SELECT a.doc_id,
             CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
             len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard_next
      FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
      ORDER BY a.doc_id""")
  )

  /** DuckDB reimplementation of the MinHash signature + banding pipeline
    * (mirrors HashKernels.minhash exactly): FNV-1a 64 per token folded in
    * HUGEINT wrap arithmetic over the UTF-8 BYTES (hex-nibble extraction,
    * so non-ASCII tokens hash identically to the Scala kernel), the murmur finalizer's two 64×64-bit
    * multiplies emulated by 32-bit split multiplication mod 2^64, signed
    * min per hash slot (Scala Long comparison is signed), then 8 bands
    * keyed on the raw 4-long signature slices — byte-identical to the
    * Spark side, so the driver's hash gate covers the custom kernel too.
    * Constants: 14695981039346656037=FNV offset, 1099511628211=FNV prime,
    * 11400714819323198485=golden-ratio increment, 18397679294719823053 /
    * 14181476777654086739=murmur mix multipliers (3981806797 / 444984403
    * are their low 32 bits). */
  private val minhashBandsSql = """
      WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
                 FROM documents),
      tok AS (SELECT doc_id, unnest(toks) AS tok FROM d),
      fh AS (SELECT doc_id,
               list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
                 list_transform(range(1, octet_length(encode(tok)) + 1),
                   i -> CAST((strpos('0123456789ABCDEF',
                            substr(hex(encode(tok)), i*2-1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF',
                            substr(hex(encode(tok)), i*2, 1)) - 1) AS HUGEINT))),
                 (h, c) -> (xor(CAST(h AS UBIGINT), CAST(c AS UBIGINT))::HUGEINT
                            * 1099511628211) % 18446744073709551616) AS fh
             FROM tok),
      z0 AS (SELECT doc_id, j,
               (fh + (j+1) * CAST(11400714819323198485 AS HUGEINT))
                 % 18446744073709551616 AS z
             FROM fh CROSS JOIN (SELECT unnest(range(0, 32)) AS j) js),
      x0 AS (SELECT doc_id, j,
               xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM z0),
      m1 AS (SELECT doc_id, j,
               ((z % 4294967296) * CAST(18397679294719823053 AS HUGEINT)
                + ((z // 4294967296) * 3981806797 % 4294967296) * 4294967296)
               % 18446744073709551616 AS z FROM x0),
      x1 AS (SELECT doc_id, j,
               xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM m1),
      m2 AS (SELECT doc_id, j,
               ((z % 4294967296) * CAST(14181476777654086739 AS HUGEINT)
                + ((z // 4294967296) * 444984403 % 4294967296) * 4294967296)
               % 18446744073709551616 AS z FROM x1),
      x2 AS (SELECT doc_id, j,
               xor(z::UBIGINT, z::UBIGINT >> 33) AS u FROM m2),
      hs AS (SELECT doc_id, j,
               CAST(CASE WHEN u >= 9223372036854775808
                         THEN u::HUGEINT - 18446744073709551616
                         ELSE u::HUGEINT END AS BIGINT) AS h FROM x2),
      sig AS (SELECT doc_id, j, min(h) AS h FROM hs GROUP BY doc_id, j),
      sigs AS (SELECT doc_id, list(h ORDER BY j) AS sig FROM sig
               GROUP BY doc_id),
      bands AS (SELECT doc_id, b, sig[4*b+1] AS h0, sig[4*b+2] AS h1,
                       sig[4*b+3] AS h2, sig[4*b+4] AS h3
                FROM sigs CROSS JOIN (SELECT unnest(range(0, 8)) AS b) bs)"""

  /** MinHash + LSH banding near-dup detection: k=32 hashes, 8 bands × 4.
    * Candidate pairs come only from band-bucket equi-joins; each candidate
    * is verified with exact token-set Jaccard. Output is per-doc (always
    * |docs| rows): candidate count and best verified similarity. */
  val minhashLsh: QueryDef = QueryDef(
    "x_dedup_minhash_lsh",
    (s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("toks"))
        .withColumn("sig", minhashSig(col("toks"), 32))
      val bands = minhashBands(base)
      // Pair each bucket member with the bucket's representative (min doc)
      // instead of all-pairs: candidates are O(docs × bands) even when a
      // bucket is huge, which is what survives a 100 TB homogeneous corpus
      // (all-pairs in a hot bucket is O(n²)). Transitive dups still land on
      // the same representative, so cluster membership is preserved.
      val reps = bands.groupBy(col("band_id"), col("band_key"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > 1)
      val pairs = bands
        .join(reps, Seq("band_id", "band_key"))
        .filter(col("doc_id") =!= col("rep_id"))
        .select(col("rep_id").as("a"), col("doc_id").as("b"))
        .distinct()
      // r16 (VERDICT r15 #6, guide §2 recomputation): the two verify
      // joins consume toksOf under DIFFERENT aliases, so exchange reuse
      // never fires and the documents tokenize (split + array_distinct)
      // ran twice as two sequential single-task broadcast builds.
      // Barrier it once; the checkpoint side loses size stats, which
      // here flips the planner to broadcasting the CANDIDATE-PAIR side
      // (the genuinely small one) instead of the token table — the
      // right build side at 100 TB anyway.
      val toksOf = graft.sources.Checkpoints.barrier(
        base.select(col("doc_id"), col("toks")))
      val verified = pairs
        .join(toksOf.withColumnRenamed("doc_id", "a")
          .withColumnRenamed("toks", "toks_a"), Seq("a"))
        .join(toksOf.withColumnRenamed("doc_id", "b")
          .withColumnRenamed("toks", "toks_b"), Seq("b"))
        .select(col("a"), col("b"),
          (size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
            size(array_union(col("toks_a"), col("toks_b")))).as("jaccard"))
      // explode both endpoints in ONE pass — a union of two selects over
      // `verified` would re-execute the whole candidate-scoring pipeline
      val perDoc = verified
        .select(explode(array(col("a"), col("b"))).as("doc_id"),
          col("jaccard"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_candidates"),
          max(col("jaccard")).as("best_jaccard"))
      base.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"))
        .orderBy(col("doc_id"))
    },
    oracle = Some(minhashBandsSql + """,
      reps AS (SELECT b, h0, h1, h2, h3, min(doc_id) AS rep_id
               FROM bands GROUP BY b, h0, h1, h2, h3 HAVING count(*) > 1),
      pairs AS (SELECT DISTINCT r.rep_id AS pa, x.doc_id AS pb
                FROM bands x JOIN reps r USING (b, h0, h1, h2, h3)
                WHERE x.doc_id <> r.rep_id),
      scored AS (SELECT pa, pb,
                   CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE) /
                   len(list_distinct(list_concat(da.toks, db.toks))) AS jaccard
                 FROM pairs
                 JOIN d da ON da.doc_id = pa
                 JOIN d db ON db.doc_id = pb),
      per AS (SELECT unnest([pa, pb]) AS doc_id, jaccard FROM scored),
      agg AS (SELECT doc_id, count(*) AS n_candidates,
                     max(jaccard) AS best_jaccard
              FROM per GROUP BY doc_id)
      SELECT d.doc_id, coalesce(agg.n_candidates, 0) AS n_candidates,
             coalesce(agg.best_jaccard, 0.0) AS best_jaccard
      FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""")
  )

  /** MinHash ESTIMATOR calibration — the sketch-quality gate next to the
    * detector: for every LSH candidate pair, the signature-agreement
    * estimate (matching positions / 32) is compared against the exact
    * token-set Jaccard, bucketed by absolute error decile. A healthy
    * 32-hash sketch concentrates mass in deciles 0-2; drift here is how a
    * production dedup pipeline notices a broken hash or an adversarial
    * corpus BEFORE trusting the sketch at 100 TB (where exact
    * verification of every pair is unaffordable and only calibrated
    * sampling is possible). Candidates + signatures + exact Jaccard are
    * all deterministic, so the oracle replays the whole comparison. */
  val minhashCalibration: QueryDef = QueryDef(
    "x_dedup_minhash_calibration",
    (s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("toks"))
        .withColumn("sig", minhashSig(col("toks"), 32))
      val bands = minhashBands(base)
      val reps = bands.groupBy(col("band_id"), col("band_key"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > 1)
      val pairs = bands
        .join(reps, Seq("band_id", "band_key"))
        .filter(col("doc_id") =!= col("rep_id"))
        .select(col("rep_id").as("a"), col("doc_id").as("b"))
        .distinct()
      val scored = pairs
        .join(base.select(col("doc_id").as("a"), col("toks").as("toks_a"),
          col("sig").as("sig_a")), Seq("a"))
        .join(base.select(col("doc_id").as("b"), col("toks").as("toks_b"),
          col("sig").as("sig_b")), Seq("b"))
        .select(
          (size(array_intersect(col("toks_a"), col("toks_b")))
            .cast("double") /
            size(array_union(col("toks_a"), col("toks_b")))).as("jac"),
          (expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), " +
            "v -> v))").cast("double") / 32).as("est"))
      scored
        .withColumn("err_decile",
          floor(abs(col("est") - col("jac")) * 10).cast("int"))
        .groupBy(col("err_decile"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(col("jac")), 4).as("avg_jaccard"),
          round(avg(col("est")), 4).as("avg_estimate"))
        .orderBy(col("err_decile"))
    },
    oracle = Some(minhashBandsSql + """,
      reps AS (SELECT b, h0, h1, h2, h3, min(doc_id) AS rep_id
               FROM bands GROUP BY b, h0, h1, h2, h3 HAVING count(*) > 1),
      pairs AS (SELECT DISTINCT r.rep_id AS pa, x.doc_id AS pb
                FROM bands x JOIN reps r USING (b, h0, h1, h2, h3)
                WHERE x.doc_id <> r.rep_id),
      scored AS (SELECT
                   CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE) /
                   len(list_distinct(list_concat(da.toks, db.toks)))
                     AS jac,
                   CAST(len(list_filter(range(1, 33),
                     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32 AS est
                 FROM pairs
                 JOIN d da ON da.doc_id = pa
                 JOIN d db ON db.doc_id = pb
                 JOIN sigs sa ON sa.doc_id = pa
                 JOIN sigs sb ON sb.doc_id = pb)
      SELECT CAST(floor(abs(est - jac) * 10) AS INTEGER) AS err_decile,
             count(*) AS n_pairs,
             round(avg(jac), 4) AS avg_jaccard,
             round(avg(est), 4) AS avg_estimate
      FROM scored GROUP BY 1 ORDER BY err_decile""")
  )

  /** SimHash near-dup: 64-bit fingerprint per doc (custom codegen'd
    * Expression), banded into 4×16-bit chunks for the candidate join,
    * hamming ≤ 12 counts as near-dup. */
  val simhash: QueryDef = QueryDef(
    "x_dedup_simhash",
    (s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"),
          simhash64(split(col("text"), " ")).as("sh"))
      val chunks = base.select(col("doc_id"), col("sh"),
          posexplode(expr(
            "transform(sequence(0, 3), c -> (sh >> (c * 16)) & 65535)")))
        .withColumnRenamed("pos", "chunk_id")
        .withColumnRenamed("col", "chunk_val")
      // same representative-pairing trick as minhashLsh: O(docs × chunks)
      val reps = chunks.groupBy(col("chunk_id"), col("chunk_val"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > 1)
      val repHash = base.select(col("doc_id").as("rep_id"),
        col("sh").as("sh_a"))
      val cand = chunks
        .join(reps, Seq("chunk_id", "chunk_val"))
        .filter(col("doc_id") =!= col("rep_id"))
        .select(col("rep_id"), col("doc_id").as("b"), col("sh").as("sh_b"))
        .distinct()
        .join(repHash, Seq("rep_id"))
        .withColumnRenamed("rep_id", "a")
        .withColumn("hd", hamming64(col("sh_a"), col("sh_b")))
        .filter(col("hd") <= 12)
      val perDoc = cand
        .select(explode(array(col("a"), col("b"))).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_near_dups"))
      base.join(perDoc, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("sh").as("simhash"),
          coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"))
        .orderBy(col("doc_id"))
    },
    // DuckDB rebuilds the 64-bit simhash bit-exactly: FNV-1a per raw token
    // (duplicates kept — simhash votes are weighted by occurrence), ±1
    // votes per bit position, sign-pack through UBIGINT, then the same
    // 4×16-bit chunk banding + hamming filter (bit_count of signed xor
    // matches Long.bitCount).
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
      fh AS (SELECT doc_id,
               list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
                 list_transform(range(1, octet_length(encode(tok)) + 1),
                   i -> CAST((strpos('0123456789ABCDEF',
                            substr(hex(encode(tok)), i*2-1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF',
                            substr(hex(encode(tok)), i*2, 1)) - 1) AS HUGEINT))),
                 (h, c) -> (xor(CAST(h AS UBIGINT), CAST(c AS UBIGINT))::HUGEINT
                            * 1099511628211) % 18446744073709551616) AS fh
             FROM tok),
      votes AS (SELECT doc_id, b,
                  sum(CASE WHEN ((fh::UBIGINT >> b) & 1) = 1
                           THEN 1 ELSE -1 END) AS v
                FROM fh CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bs
                GROUP BY doc_id, b),
      shu AS (SELECT doc_id,
                sum(CASE WHEN v > 0
                         THEN (CAST(1 AS UBIGINT) << b)::HUGEINT
                         ELSE 0 END) AS z
              FROM votes GROUP BY doc_id),
      sh AS (SELECT doc_id,
               CAST(CASE WHEN z >= 9223372036854775808
                         THEN z - 18446744073709551616
                         ELSE z END AS BIGINT) AS simhash,
               z::UBIGINT AS zu
             FROM shu),
      chunks AS (SELECT doc_id, c,
                   CAST((zu >> (16*c)) & 65535 AS BIGINT) AS cv
                 FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS c) cs),
      reps AS (SELECT c, cv, min(doc_id) AS rep_id
               FROM chunks GROUP BY c, cv HAVING count(*) > 1),
      cand AS (SELECT DISTINCT r.rep_id AS pa, x.doc_id AS pb
               FROM chunks x JOIN reps r USING (c, cv)
               WHERE x.doc_id <> r.rep_id),
      near AS (SELECT pa, pb FROM cand
               JOIN sh sa ON sa.doc_id = pa
               JOIN sh sb ON sb.doc_id = pb
               WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 12),
      per AS (SELECT unnest([pa, pb]) AS doc_id FROM near),
      agg AS (SELECT doc_id, count(*) AS n_near_dups
              FROM per GROUP BY doc_id)
      SELECT sh.doc_id, sh.simhash,
             coalesce(agg.n_near_dups, 0) AS n_near_dups
      FROM sh LEFT JOIN agg USING (doc_id) ORDER BY doc_id""")
  )

  /** Embedding-cosine near-dup: 4 independent LSH tables × 16 hyperplanes
    * (65536 buckets per table), candidates via chain pairing — each bucket
    * member pairs with its id-successor in the same bucket — so candidate
    * volume is O(vectors × tables) even in degenerate buckets, never
    * all-pairs. Chain beats star-to-representative on recall: two similar
    * vectors sharing a bucket with an unrelated min-id collider still get
    * compared (directly when adjacent, or in another table's chain), while
    * a star pairing scores everyone only against the possibly-unrelated
    * representative. cosine ≥ 0.9 flags a near-dup. */
  /** Chain-paired embedding near-dup candidates verified at cosine ≥ 0.9
    * (shared by x_dedup_embedding and the SemDedup funnel): 4 tables ×
    * 16 hyperplanes, each bucket member pairs with its id-successor, so
    * candidate volume is O(vectors × tables); ids only travel through the
    * explode+shuffle, the 64-float payload re-joins per candidate. In
    * every pair a < b (lead() orders by vec_id). */
  private def embeddingNearDupPairs(emb: DataFrame): DataFrame = {
    val tables = 4
    val planes = 16
    val bucketed = emb.select(col("vec_id"),
        posexplode(array((0 until tables).map(tbl =>
          graft.functions.VectorFunctions
            .lshBucket(col("embedding"), planes, 42L + tbl)): _*)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bucket")
    val chain = Window.partitionBy(col("tbl"), col("bucket"))
      .orderBy(col("vec_id"))
    val cand = bucketed
      .withColumn("nxt", lead(col("vec_id"), 1).over(chain))
      .filter(col("nxt").isNotNull)
      .select(col("vec_id").as("a"), col("nxt").as("b"))
      .distinct()
    cand
      .join(emb.withColumnRenamed("vec_id", "a")
        .withColumnRenamed("embedding", "va"), Seq("a"))
      .join(emb.withColumnRenamed("vec_id", "b")
        .withColumnRenamed("embedding", "vb"), Seq("b"))
      .select(col("a"), col("b"),
        graft.functions.VectorFunctions.cosineSim(col("va"), col("vb"))
          .as("cos"))
      .filter(col("cos") >= 0.9)
  }

  val embeddingNearDup: QueryDef = QueryDef(
    "x_dedup_embedding",
    (s, dir) => {
      val planes = 16
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val scored = embeddingNearDupPairs(emb)
      val perVec = scored
        .select(explode(array(col("a"), col("b"))).as("vec_id"))
        .groupBy(col("vec_id")).agg(count(lit(1)).as("n_near_dups"))
      emb.select(col("vec_id"),
          graft.functions.VectorFunctions
            .lshBucket(col("embedding"), planes, 42L).as("bucket"))
        .join(perVec, Seq("vec_id"), "left_outer")
        .select(col("vec_id"), col("bucket"),
          coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"))
        .orderBy(col("vec_id"))
    },
    // DuckDB rebuilds the whole path bit-exactly: hyperplane weights =
    // murmur-mixed FNV of (plane, dim) bytes over seed 42+table, scaled by
    // Long.MaxValue; dot products and cosines via list_reduce ordered folds
    // (same IEEE operation order as the Scala kernel, so the sign tests and
    // the 0.9 threshold see identical doubles).
    oracle = Some(
      LshOracleSql.weightsAndBuckets(tables = 4, planes = 16) + s""",
      chain AS (SELECT vec_id, t, bucket,
                  lead(vec_id) OVER (PARTITION BY t, bucket
                                     ORDER BY vec_id) AS nxt
                FROM buckets),
      cand AS (SELECT DISTINCT vec_id AS pa, nxt AS pb
               FROM chain WHERE nxt IS NOT NULL),
      cosed AS (SELECT pa, pb,
${LshOracleSql.cosineExpr} AS c
                FROM cand
                JOIN e ea ON ea.vec_id = pa
                JOIN e eb ON eb.vec_id = pb),
      per AS (SELECT unnest([pa, pb]) AS vec_id FROM cosed WHERE c >= 0.9),
      agg AS (SELECT vec_id, count(*) AS n_near_dups
              FROM per GROUP BY vec_id)
      SELECT b0.vec_id, b0.bucket, coalesce(agg.n_near_dups, 0) AS n_near_dups
      FROM (SELECT vec_id, bucket FROM buckets WHERE t = 0) b0
      LEFT JOIN agg USING (vec_id) ORDER BY vec_id""")
  )

  /** Cluster assignment: each doc's cluster id = the min representative
    * across its LSH buckets (one-hop union-find approximation — the
    * standard single-pass clustering a 100 TB dedup pipeline runs before
    * keeping one doc per cluster). */
  val clusters: QueryDef = QueryDef(
    "x_dedup_clusters",
    (s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("toks"))
        .withColumn("sig", minhashSig(col("toks"), 32))
      val bands = minhashBands(base)
      val bucketMin = bands.groupBy(col("band_id"), col("band_key"))
        .agg(min(col("doc_id")).as("bucket_min"))
      val clusterOf = bands
        .join(bucketMin, Seq("band_id", "band_key"))
        .groupBy(col("doc_id"))
        .agg(min(col("bucket_min")).as("cluster_id"))
      clusterOf
        .withColumn("is_cluster_head", col("doc_id") === col("cluster_id"))
        .orderBy(col("doc_id"))
    },
    oracle = Some(minhashBandsSql + """,
      bucket_min AS (SELECT b, h0, h1, h2, h3, min(doc_id) AS m
                     FROM bands GROUP BY b, h0, h1, h2, h3),
      cl AS (SELECT x.doc_id, min(bm.m) AS cluster_id
             FROM bands x JOIN bucket_min bm USING (b, h0, h1, h2, h3)
             GROUP BY x.doc_id)
      SELECT doc_id, cluster_id, doc_id = cluster_id AS is_cluster_head
      FROM cl ORDER BY doc_id""")
  )

  /** Incremental dedup: classify a NEW batch (source = 'src9') against the
    * EXISTING corpus (every other source) — the shape a production pipeline
    * runs per ingest instead of re-deduping 100 TB from scratch. Exact
    * status via a digest semi-join (new side shuffles 16-byte digests
    * only); near status via the same minhash banding as x_dedup_minhash_lsh,
    * where each new doc pairs with the min existing doc per shared band
    * bucket — O(new × bands) candidates regardless of bucket sizes — and is
    * verified with exact token-set Jaccard ≥ 0.8. At scale the existing
    * side's band→min-doc index is a precomputed artifact keyed exactly like
    * `exBands` here; only the new batch pays per-ingest work. */
  val incremental: QueryDef = QueryDef(
    "x_dedup_incremental",
    (s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"), col("source"),
          array_distinct(split(col("text"), " ")).as("toks"),
          md5(col("text")).as("digest"))
      val newDocs = base.filter(col("source") === "src9")
      val existing = base.filter(col("source") =!= "src9")
      val exactDup = newDocs
        .join(existing.select(col("digest")).distinct(), Seq("digest"),
          "left_semi")
        .select(col("doc_id"), lit(true).as("exact"))
      def bands(df: DataFrame): DataFrame =
        minhashBands(df.withColumn("sig", minhashSig(col("toks"), 32)))
      val exBands = bands(existing).groupBy(col("band_id"), col("band_key"))
        .agg(min(col("doc_id")).as("ex_id"))
      val candidates = bands(newDocs)
        .join(exBands, Seq("band_id", "band_key"))
        .select(col("doc_id"), col("ex_id")).distinct()
      val verified = candidates
        .join(newDocs.select(col("doc_id"), col("toks")), Seq("doc_id"))
        .join(existing.select(col("doc_id").as("ex_id"),
          col("toks").as("ex_toks")), Seq("ex_id"))
        .groupBy(col("doc_id"))
        .agg(max(
          size(array_intersect(col("toks"), col("ex_toks"))).cast("double") /
            size(array_union(col("toks"), col("ex_toks"))))
          .as("best_jaccard"))
      newDocs.select(col("doc_id"))
        .join(exactDup, Seq("doc_id"), "left_outer")
        .join(verified, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
          when(coalesce(col("exact"), lit(false)), "exact")
            .when(coalesce(col("best_jaccard"), lit(0.0)) >= 0.8, "near")
            .otherwise("novel").as("status"))
        .orderBy(col("doc_id"))
    },
    oracle = Some(incrementalClassifySql)
  )

  /** The per-ingest classification oracle, shared verbatim by the batch
    * (`x_dedup_incremental`) and streaming (`x_stream_neardup`) duals —
    * per-doc status depends only on the doc and the frozen existing-side
    * artifacts, so batch and stream must produce identical rows. */
  private lazy val incrementalClassifySql: String = minhashBandsSql + """,
      src AS (SELECT doc_id, source, md5(text) AS digest FROM documents),
      newd AS (SELECT doc_id FROM src WHERE source = 'src9'),
      exact AS (SELECT DISTINCT s.doc_id
                FROM src s JOIN src e ON s.digest = e.digest
                WHERE s.source = 'src9' AND e.source <> 'src9'),
      exbands AS (SELECT b, h0, h1, h2, h3, min(bands.doc_id) AS ex_id
                  FROM bands JOIN src USING (doc_id)
                  WHERE src.source <> 'src9'
                  GROUP BY b, h0, h1, h2, h3),
      cand AS (SELECT DISTINCT bands.doc_id, eb.ex_id
               FROM bands JOIN src USING (doc_id)
               JOIN exbands eb USING (b, h0, h1, h2, h3)
               WHERE src.source = 'src9'),
      ver AS (SELECT c.doc_id,
                max(CAST(len(list_intersect(dn.toks, de.toks)) AS DOUBLE) /
                    len(list_distinct(list_concat(dn.toks, de.toks))))
                  AS best_jaccard
              FROM cand c
              JOIN d dn ON dn.doc_id = c.doc_id
              JOIN d de ON de.doc_id = c.ex_id
              GROUP BY c.doc_id)
      SELECT n.doc_id,
             coalesce(v.best_jaccard, 0.0) AS best_jaccard,
             CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
                  WHEN coalesce(v.best_jaccard, 0.0) >= 0.8 THEN 'near'
                  ELSE 'novel' END AS status
      FROM newd n
      LEFT JOIN exact e ON e.doc_id = n.doc_id
      LEFT JOIN ver v ON v.doc_id = n.doc_id
      ORDER BY n.doc_id"""

  /** STREAMING per-ingest near-dup classification — the streaming dual
    * of x_dedup_incremental, and the arrival path a production corpus
    * actually runs: the existing corpus's dedup index (distinct
    * digests, band→min-doc buckets, token sets for verification) is
    * persisted ONCE as parquet artifacts, and new documents land on a
    * file stream whose micro-batches classify against those FROZEN
    * artifacts in foreachBatch — exact status via a digest semi-join,
    * near status via band-bucket candidates verified with exact token
    * Jaccard ≥ 0.8, per doc, exactly as the batch op.
    *
    * Per-doc status depends only on the doc and the frozen index —
    * new docs never pair with each other (matching the batch
    * semantics) — so the union over micro-batches equals the batch
    * answer row-for-row regardless of batching, and the op shares
    * x_dedup_incremental's DuckDB oracle verbatim.
    *
    * Exactly-once: foreachBatch is at-least-once under retry, so each
    * batch OVERWRITES a deterministic per-batchId output partition
    * (`out/b=<id>`) — a replayed batch rewrites identical bytes
    * instead of duplicating rows. Scale shape: the classify joins are
    * stream-batch joins against persisted small-side artifacts
    * (band index ≈ distinct buckets, digests ≈ 16 B/doc); each
    * micro-batch pays O(batch × bands) candidate work and the corpus
    * is never rescanned — a 100 TB/day crawl ingest amortizes to
    * per-arrival cost, with index refresh as a separate (locked,
    * manifest-committed) maintenance job like the ANN segment story. */
  val streamNearDup: QueryDef = QueryDef(
    "x_stream_neardup",
    (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = docs(s, dir)
        .select(col("doc_id"), col("source"),
          array_distinct(split(col("text"), " ")).as("toks"),
          md5(col("text")).as("digest"))
      val existing = base.filter(col("source") =!= "src9")
      val tmp = DdlDmlQueries.scratch("stream_neardup")
      // build + persist the existing-side index artifacts ONCE (the
      // production build job); the stream reads the persisted copies —
      // a static side with live training lineage re-evaluates it per
      // micro-batch (the x_stream_ann_ingest lesson)
      existing.select(col("digest")).distinct()
        .write.mode("overwrite").parquet(s"$tmp/digests")
      minhashBands(existing.withColumn("sig", minhashSig(col("toks"), 32)),
          materialize = false)
        .groupBy(col("band_id"), col("band_key"))
        .agg(min(col("doc_id")).as("ex_id"))
        .write.mode("overwrite").parquet(s"$tmp/exbands")
      existing.select(col("doc_id").as("ex_id"), col("toks").as("ex_toks"))
        .write.mode("overwrite").parquet(s"$tmp/extoks")
      val newRaw = docs(s, dir).filter(col("source") === "src9")
      newRaw.repartition(4).write.mode("overwrite").parquet(s"$tmp/src")
      val digestsF = s.read.parquet(s"$tmp/digests")
      val exBandsF = s.read.parquet(s"$tmp/exbands")
      val exToksF = s.read.parquet(s"$tmp/extoks")
      val q = s.readStream.schema(newRaw.schema)
        .option("maxFilesPerTrigger", 1) // force multiple micro-batches
        .parquet(s"$tmp/src")
        .writeStream
        .foreachBatch { (b: DataFrame, bid: Long) =>
          val nb = b.select(col("doc_id"),
            array_distinct(split(col("text"), " ")).as("toks"),
            md5(col("text")).as("digest"))
          val exact = nb.join(digestsF, Seq("digest"), "left_semi")
            .select(col("doc_id"), lit(true).as("exact"))
          val cand = minhashBands(
              nb.withColumn("sig", minhashSig(col("toks"), 32)),
              materialize = false)
            .join(exBandsF, Seq("band_id", "band_key"))
            .select(col("doc_id"), col("ex_id")).distinct()
          val verified = cand
            .join(nb.select(col("doc_id"), col("toks")), Seq("doc_id"))
            .join(exToksF, Seq("ex_id"))
            .groupBy(col("doc_id"))
            .agg(max(size(array_intersect(col("toks"), col("ex_toks")))
                .cast("double") /
              size(array_union(col("toks"), col("ex_toks"))))
              .as("best_jaccard"))
          nb.select(col("doc_id"))
            .join(exact, Seq("doc_id"), "left_outer")
            .join(verified, Seq("doc_id"), "left_outer")
            .select(col("doc_id"),
              coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
              when(coalesce(col("exact"), lit(false)), "exact")
                .when(coalesce(col("best_jaccard"), lit(0.0)) >= 0.8,
                  "near")
                .otherwise("novel").as("status"))
            .write.mode("overwrite").parquet(s"$tmp/out/b=$bid")
          ()
        }
        .option("checkpointLocation", s"$tmp/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("doc_id"), col("best_jaccard"), col("status"))
        .orderBy(col("doc_id"))
    },
    oracle = Some(incrementalClassifySql)
  )

  /** SemDedup-style joint curation across BOTH modalities: the text
    * quality gate and exact text dedup compose with embedding-space
    * near-dup removal (documents ⋈ embeddings on doc_id = vec_id). A
    * doc is semantically dropped when it is the larger-id side of a
    * verified cosine ≥ 0.9 chain pair — the one-hop keep-the-earliest
    * approximation of SemDedup cluster pruning. Output is the per-lang
    * funnel (quality → text-dedup → semdedup counts), all integers, so
    * the whole multimodal pipeline sits under the byte-exact gate. One
    * digest window + the bounded near-dup machinery — text never joins
    * against vectors until both sides are down to ids. */
  val semdedup: QueryDef = QueryDef(
    "x_pipeline_semdedup",
    (s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val dropped = embeddingNearDupPairs(emb)
        .select(col("b").as("doc_id")).distinct()
        .withColumn("sem_dup", lit(true))
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      docs(s, dir)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .filter(col("n_tokens") >= 20)
        .withColumn("rn", row_number().over(w))
        .join(dropped, Seq("doc_id"), "left_outer")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_quality"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_text_kept"),
          sum(when(col("rn") === 1 &&
            !coalesce(col("sem_dup"), lit(false)), 1L).otherwise(0L))
            .as("n_sem_kept"))
        .orderBy(col("lang"))
    },
    // the embedding near-dup chain replays via LshOracleSql (same
    // fragments as x_dedup_embedding), composed with the text funnel
    oracle = Some(
      LshOracleSql.weightsAndBuckets(tables = 4, planes = 16) + s""",
      chain AS (SELECT vec_id, t, bucket,
                  lead(vec_id) OVER (PARTITION BY t, bucket
                                     ORDER BY vec_id) AS nxt
                FROM buckets),
      cand AS (SELECT DISTINCT vec_id AS pa, nxt AS pb
               FROM chain WHERE nxt IS NOT NULL),
      cosed AS (SELECT pa, pb,
${LshOracleSql.cosineExpr} AS c
                FROM cand
                JOIN e ea ON ea.vec_id = pa
                JOIN e eb ON eb.vec_id = pb),
      dropped AS (SELECT DISTINCT pb AS doc_id FROM cosed WHERE c >= 0.9),
      q AS (SELECT doc_id, lang, text FROM documents
            WHERE len(string_split(text, ' ')) >= 20),
      dq AS (SELECT *, row_number() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn
             FROM q)
      SELECT lang, count(*) AS n_quality,
             CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_text_kept,
             CAST(sum(CASE WHEN rn = 1 AND d.doc_id IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_sem_kept
      FROM dq LEFT JOIN dropped d USING (doc_id)
      GROUP BY lang ORDER BY lang""")
  )

  /** One large-star round: over the symmetric neighbor view, every node u
    * connects its strictly LARGER neighbors to m = min(N(u) ∪ {u}). The
    * output is canonical (bigger, smaller) edges — m ≤ u < v always. */
  private[graft] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
    val m = sym.groupBy(col("a")).agg(min(col("b")).as("mn"))
      .select(col("a"), least(col("a"), col("mn")).as("m"))
    sym.join(m, Seq("a"))
      .filter(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
      .distinct()
  }

  /** One small-star round over canonical (a > b) edges: every node a
    * connects its smaller neighbors AND itself to m = min of those
    * neighbors. Output stays canonical; self-loops drop. */
  private[graft] def smallStar(edges: DataFrame): DataFrame = {
    val m = edges.groupBy(col("a")).agg(min(col("b")).as("m"))
    val reparent = edges.join(m, Seq("a"))
      .filter(col("b") =!= col("m"))
      .select(col("b").as("a"), col("m").as("b"))
    reparent.union(m.select(col("a"), col("m").as("b")))
      .distinct()
  }

  /** Alternating star contraction (the MapReduce-CC algorithm of Kiveris
    * et al., public knowledge): large-star + small-star rounds until the
    * edge set reaches its fixed point — a union of stars whose centers
    * are the component minima. O(log n) rounds in practice (O(log² n)
    * proven), independent of graph DIAMETER — a pathological boilerplate
    * chain that would cost hash-min propagation O(n) rounds converges
    * logarithmically (pinned with a planted 64-doc chain in
    * VectorTextSpec). Returns (star edges (a=node, b=component min),
    * rounds). Input edges may be any orientation; self-loops ignored. */
  private[graft] def connectedComponents(edges0: DataFrame,
      maxRounds: Int = 25): (DataFrame, Int) = {
    var edges = edges0
      .select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .barrier()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(edges)).barrier()
      // both sides are distinct sets: equal counts + empty one-sided
      // difference ⇒ equal sets ⇒ fixed point reached
      converged = next.count() == edges.count() &&
        next.except(edges).isEmpty
      edges = next
      rounds += 1
    }
    require(converged, s"star contraction not converged in $rounds rounds")
    (edges, rounds)
  }

  /** Connected-components dedup clustering, iterated to CONVERGENCE —
    * the exact version of x_dedup_clusters' one-hop approximation. The
    * similarity graph is the same star edge set (each doc ↔ the min doc
    * of every shared minhash band bucket: O(docs × bands) edges, never
    * all-pairs), contracted by alternating large-star/small-star rounds
    * to the fixed point where every doc points at its component minimum.
    * Transitive chains (A~B~C where A and C never share a bucket) land
    * in ONE cluster, which the one-hop pass cannot guarantee.
    *
    * Scale shape: the loop state is id-only (a, b) edge pairs — two
    * longs per edge, never text; each round is two grouped-min passes
    * plus a convergence compare, and `localCheckpoint` truncates lineage
    * so round N's plan does not replay rounds 1..N-1. Round count is
    * O(log n) (star contraction), NOT graph diameter. The DuckDB oracle
    * computes the same fixed point independently via a recursive-CTE
    * transitive closure, so the gate checks true convergence, not just
    * one sweep. */
  /** Size of x_dedup_cc's derived star-edge set (the minhash-band star
    * the contraction loop iterates over) — the bench artifact's
    * output-normalization column for the cc scaling leg, same rationale
    * as GraphQueries.derivedEdgeCount: the edge set grows with band
    * collisions, so per-edge cost is the scale-honest ratio. */
  private[graft] def ccStarEdgeCount(s: SparkSession, dir: String): Long = {
    val base = docs(s, dir)
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .withColumn("sig", minhashSig(col("toks"), 32))
    val bands = minhashBands(base)
    val bucketMin = bands.groupBy(col("band_id"), col("band_key"))
      .agg(min(col("doc_id")).as("m"))
    bands.join(bucketMin, Seq("band_id", "band_key"))
      .filter(col("doc_id") =!= col("m"))
      .select(col("doc_id").as("a"), col("m").as("b"))
      .distinct().count()
  }

  /** Stride-1 L-token window digests over the corpus: one row per
    * (doc_id, pos) with h = md5 of the window's tokens. The SINGLE
    * definition every span-family consumer shares — detection
    * (x_dedup_spans), removal, provenance, and the bench's
    * flagged-count normalization (spanFlaggedCount) must digest
    * identically, or the normalization denominator measures a
    * different corpus than the operators it normalizes. */
  private def windowDigests(s: SparkSession, dir: String,
      L: Int): org.apache.spark.sql.DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= L)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(toks) - $L), " +
          s"i -> md5(concat_ws(' ', slice(toks, i + 1, $L))))"))
        .as(Seq("pos", "h")))

  /** Size of the span family's FLAGGED-POSITION set — stride-1 window
    * positions whose 10-token digest occurs more than once corpus-wide,
    * i.e. the input to x_dedup_spans' / x_dedup_span_removal's island
    * merge and rewrite stages. The bench's scaling legs normalize the
    * span walls on this count (same rationale as ccStarEdgeCount /
    * derivedEdgeCount): on the self-cloned scaling corpus every window
    * gains N-1 byte-identical twins, so the flagged set jumps from the
    * sparse genuine-dup fraction to essentially ALL windows — growth a
    * raw wall ratio would misread as engine superlinearity. One
    * two-phase digest count, (pos, md5) pairs only, text never moves. */
  private[graft] def spanFlaggedCount(s: SparkSession,
      dir: String): Long =
    windowDigests(s, dir, 10)
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n")), lit(0L)).as("flagged"))
      .collect()(0).getLong(0)

  val cc: QueryDef = QueryDef(
    "x_dedup_cc",
    (s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("toks"))
        .withColumn("sig", minhashSig(col("toks"), 32))
      val bands = minhashBands(base)
      val bucketMin = bands.groupBy(col("band_id"), col("band_key"))
        .agg(min(col("doc_id")).as("m"))
      val star = bands.join(bucketMin, Seq("band_id", "band_key"))
        .filter(col("doc_id") =!= col("m"))
        .select(col("doc_id").as("a"), col("m").as("b"))
        .distinct()
      val (starEdges, _) = connectedComponents(star)
      // at the fixed point every non-root node carries exactly one edge
      // to its component min; singletons label themselves
      val labels = base.select(col("doc_id"))
        .join(starEdges.select(col("a").as("doc_id"),
          col("b").as("lbl")), Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
      val sizes = labels.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          (col("doc_id") === col("cluster_id")).as("is_cluster_head"))
        .orderBy(col("doc_id"))
    },
    // the oracle derives the SAME fixed point a different way: recursive
    // transitive closure over the symmetric star edges, then min reachable
    // id per doc — if Spark's loop stopped early or propagated wrongly,
    // the component minima disagree and the hash gate fails
    oracle = Some(minhashBandsSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
      bucket_min AS (SELECT b, h0, h1, h2, h3, min(doc_id) AS m
                     FROM bands GROUP BY b, h0, h1, h2, h3),
      star AS (SELECT x.doc_id AS a, bm.m AS bb
               FROM bands x JOIN bucket_min bm USING (b, h0, h1, h2, h3)
               WHERE x.doc_id <> bm.m),
      edges AS (SELECT a, bb FROM star UNION SELECT bb, a FROM star),
      reach AS (SELECT doc_id AS a, doc_id AS r FROM d
                UNION
                SELECT e.a, reach.r
                FROM edges e JOIN reach ON reach.a = e.bb),
      lbl AS (SELECT a AS doc_id, min(r) AS cluster_id
              FROM reach GROUP BY a),
      sz AS (SELECT cluster_id, count(*) AS cluster_size
             FROM lbl GROUP BY cluster_id)
      SELECT l.doc_id, l.cluster_id, sz.cluster_size,
             l.doc_id = l.cluster_id AS is_cluster_head
      FROM lbl l JOIN sz USING (cluster_id) ORDER BY doc_id""")
  )

  /** Substring-level dedup at 10-token-chunk granularity with document
    * reconstruction — dedup BELOW the document boundary (the pass that
    * catches boilerplate shared across otherwise-distinct pages, which
    * doc-level digests never see). Each doc splits into fixed 10-token
    * chunks; the globally-first occurrence of each chunk (by doc_id, then
    * position) survives, and every doc is re-assembled from its kept
    * chunks in order.
    *
    * Scale shape: the chunk TEXT never shuffles. Map-side each doc emits
    * (doc_id, chunk_idx, md5) triples; the first-occurrence window and
    * the per-doc kept-index aggregation move digests and ids only, and
    * the reconstruction join re-derives chunk text from the doc's own
    * token array after the winners come back keyed by doc_id (pinned in
    * PlanSpec). */
  val chunkDedup: QueryDef = QueryDef(
    "x_dedup_chunks",
    (s, dir) => {
      val C = 10
      val base = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val digests = base.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(toks) / $C.0) as int) - 1), " +
          s"i -> md5(concat_ws(' ', slice(toks, i * $C + 1, $C))))"))
        .as(Seq("chunk_idx", "h")))
      val w = Window.partitionBy(col("h"))
        .orderBy(col("doc_id"), col("chunk_idx"))
      val kept = digests.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("chunk_idx"))).as("kept_idx"))
      base
        .withColumn("n_chunks",
          expr(s"cast(ceil(size(toks) / $C.0) as int)"))
        .join(kept, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(size(col("kept_idx")), lit(0)).as("n_kept"),
          coalesce(expr(s"concat_ws(' ', transform(kept_idx, " +
            s"i -> concat_ws(' ', slice(toks, i * $C + 1, $C))))"), lit(""))
            .as("dedup_text"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH n AS (SELECT doc_id, string_split(text, ' ') AS toks,
                   CAST(ceil(len(string_split(text, ' ')) / 10.0) AS INT)
                     AS n_chunks
                 FROM documents),
      ch AS (SELECT doc_id, toks,
               unnest(range(0, n_chunks)) AS chunk_idx
             FROM n),
      hx AS (SELECT doc_id, chunk_idx,
               md5(array_to_string(
                 toks[chunk_idx*10+1 : chunk_idx*10+10], ' ')) AS h
             FROM ch),
      kept AS (SELECT doc_id, chunk_idx FROM (
                 SELECT doc_id, chunk_idx, row_number() OVER (
                   PARTITION BY h ORDER BY doc_id, chunk_idx) AS rk
                 FROM hx) WHERE rk = 1),
      ka AS (SELECT doc_id, count(*) AS n_kept,
               list_sort(list(chunk_idx)) AS kept_idx
             FROM kept GROUP BY doc_id)
      SELECT n.doc_id, n.n_chunks,
             coalesce(ka.n_kept, 0) AS n_kept,
             coalesce(array_to_string(list_transform(ka.kept_idx,
               i -> array_to_string(n.toks[i*10+1 : i*10+10], ' ')), ' '),
               '') AS dedup_text
      FROM n LEFT JOIN ka USING (doc_id) ORDER BY doc_id""")
  )

  /** Exact duplicated-SPAN detection — sliding-window exact-substring
    * dedup (the Lee et al. "Deduplicating Training Data" shape at
    * 10-token window granularity): every stride-1 10-token window is
    * digested; windows whose digest occurs more than once ANYWHERE in
    * the corpus (cross-doc or intra-doc) flag their positions, and per
    * doc the flagged positions merge gaps-and-islands style into maximal
    * duplicated spans. Catches UNALIGNED boilerplate that the fixed
    * non-overlapping chunk grid of x_dedup_chunks provably misses (a
    * shared 15-token run straddling a chunk boundary — pinned in
    * VectorTextSpec).
    *
    * Scale shape: the shuffle carries (doc_id, pos, md5) triples only —
    * stride-1 windows cost L× the chunk pass in rows but the payload per
    * row is still ~40 B and text never moves; the duplicate filter is a
    * two-phase digest count, and the island merge is one window over the
    * (small) flagged-position set partitioned by doc_id. The dup ratio
    * is an exact integer quotient emitted unrounded (identical doubles
    * both engines). */
  val spanDedup: QueryDef = QueryDef(
    "x_dedup_spans",
    (s, dir) => {
      val L = 10
      val base = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val hh = windowDigests(s, dir, L)
      val dup = hh.groupBy(col("h")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).select(col("h"))
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val flagged = hh.join(dup, Seq("h"))
        .select(col("doc_id"), col("pos"))
        .withColumn("brk",
          when(col("pos") - lag(col("pos"), 1).over(wd) > L, 1)
            .otherwise(when(lag(col("pos"), 1).over(wd).isNull, 1)
              .otherwise(0)))
        .withColumn("island", sum(col("brk")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val spans = flagged.groupBy(col("doc_id"), col("island"))
        .agg(min(col("pos")).as("s"), (max(col("pos")) + L).as("e"))
      val perDoc = spans.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_dup_spans"),
          max(col("e") - col("s")).as("max_span_len"),
          sum(col("e") - col("s")).as("n_dup_tokens"))
      base.select(col("doc_id"), size(col("toks")).as("n_tokens"))
        .join(perDoc, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
          coalesce(col("max_span_len"), lit(0)).as("max_span_len"),
          coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
          (coalesce(col("n_dup_tokens"), lit(0L)).cast("double") /
            col("n_tokens")).as("dup_ratio"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      sh AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 9)) AS pos
             FROM t WHERE len(toks) >= 10),
      hh AS (SELECT doc_id, pos,
               md5(array_to_string(toks[pos+1 : pos+10], ' ')) AS h
             FROM sh),
      dup AS (SELECT h FROM hh GROUP BY h HAVING count(*) > 1),
      fl AS (SELECT doc_id, pos FROM hh JOIN dup USING (h)),
      isl AS (SELECT doc_id, pos,
                CASE WHEN lag(pos) OVER w IS NULL THEN 1
                     WHEN pos - lag(pos) OVER w > 10 THEN 1
                     ELSE 0 END AS brk
              FROM fl WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      isl2 AS (SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
               FROM isl),
      sp AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 10 AS e
             FROM isl2 GROUP BY doc_id, island),
      agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
                max(e - s) AS max_span_len,
                CAST(sum(e - s) AS BIGINT) AS n_dup_tokens
              FROM sp GROUP BY doc_id)
      SELECT t.doc_id, len(t.toks) AS n_tokens,
             coalesce(a.n_dup_spans, 0) AS n_dup_spans,
             coalesce(a.max_span_len, 0) AS max_span_len,
             coalesce(a.n_dup_tokens, 0) AS n_dup_tokens,
             CAST(coalesce(a.n_dup_tokens, 0) AS DOUBLE) / len(t.toks)
               AS dup_ratio
      FROM t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""")
  )

  /** Exact duplicated-span REMOVAL — the rewrite pass over
    * x_dedup_spans' detection (Lee et al. "Deduplicating Training Data
    * Makes Language Models Better" semantics at 10-token window
    * granularity): every stride-1 10-token window whose digest occurs
    * more than once in the corpus is removed EXCEPT its globally-first
    * occurrence (min doc_id, then min pos), and each document is
    * re-emitted with the covered token positions excised. Completes the
    * dedup matrix: x_dedup_chunks REWRITES but only at the aligned chunk
    * grid (provably misses straddling runs — pinned in VectorTextSpec);
    * x_dedup_spans catches unaligned runs but only DETECTS. This cell is
    * unaligned + rewrite + first-occurrence-preserving.
    *
    * Scale shape: identical to the detection pass — the shuffle carries
    * (doc_id, pos, md5) triples, never text. The first-occurrence rank
    * and duplicate count share one hash partitioning on the digest; the
    * island merge windows over the (small) flagged set per doc; and the
    * rewrite is a doc_id-keyed join of a few (start,end) spans back to
    * the doc's own token array, excised by an expression-level array
    * filter (a Catalyst higher-order function — no UDF, no shuffle) —
    * token text never leaves its partition. Output carries md5(clean)
    * rather than the rewritten text so the verify payload stays O(1)
    * per doc at any document size. */
  val spanRemoval: QueryDef = QueryDef(
    "x_dedup_span_removal",
    (s, dir) => {
      val L = 10
      val base = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val hh = windowDigests(s, dir, L)
      // one shuffle on h serves both: occurrence rank (first survives)
      // and the duplicate gate (digests seen once remove nothing)
      val wOcc = Window.partitionBy(col("h"))
        .orderBy(col("doc_id"), col("pos"))
      val flagged = hh
        .withColumn("occ", row_number().over(wOcc))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("h"))))
        .filter(col("n") > 1 && col("occ") > 1)
        .select(col("doc_id"), col("pos"))
      // gaps-and-islands merge of flagged window starts into maximal
      // covered [s, e) spans — same recurrence as x_dedup_spans
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val spans = flagged
        .withColumn("brk",
          when(lag(col("pos"), 1).over(wd).isNull, 1)
            .otherwise(when(col("pos") - lag(col("pos"), 1).over(wd) > L, 1)
              .otherwise(0)))
        .withColumn("island", sum(col("brk")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("pos")).as("s"), (max(col("pos")) + L).as("e"))
      val perDoc = spans.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("s"), col("e"))))
            .as("spans"),
          sum(col("e") - col("s")).as("n_removed"))
      base.join(perDoc, Seq("doc_id"), "left_outer")
        .withColumn("kept", expr(
          "CASE WHEN spans IS NULL THEN toks " +
            "ELSE filter(toks, (t, i) -> " +
            "NOT exists(spans, sp -> i >= sp.s AND i < sp.e)) END"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed_tokens"),
          size(col("kept")).as("n_kept_tokens"),
          md5(concat_ws(" ", col("kept"))).as("clean_md5"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      sh AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 9)) AS pos
             FROM t WHERE len(toks) >= 10),
      hh AS (SELECT doc_id, pos,
               md5(array_to_string(toks[pos+1 : pos+10], ' ')) AS h
             FROM sh),
      ranked AS (SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY h
                     ORDER BY doc_id, pos) AS occ,
                   count(*) OVER (PARTITION BY h) AS n
                 FROM hh),
      fl AS (SELECT doc_id, pos FROM ranked WHERE n > 1 AND occ > 1),
      isl AS (SELECT doc_id, pos,
                CASE WHEN lag(pos) OVER w IS NULL THEN 1
                     WHEN pos - lag(pos) OVER w > 10 THEN 1
                     ELSE 0 END AS brk
              FROM fl WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      isl2 AS (SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
               FROM isl),
      sp AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 10 AS e
             FROM isl2 GROUP BY doc_id, island),
      cov AS (SELECT DISTINCT doc_id, unnest(range(s, e)) AS i FROM sp),
      tok AS (SELECT doc_id, unnest(toks) AS tok,
                unnest(range(0, len(toks))) AS i
              FROM t),
      kept AS (SELECT tok.doc_id, tok.tok, tok.i
               FROM tok LEFT JOIN cov
                 ON tok.doc_id = cov.doc_id AND tok.i = cov.i
               WHERE cov.i IS NULL),
      rem AS (SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS n_removed
              FROM sp GROUP BY doc_id),
      ka AS (SELECT doc_id, count(*) AS n_kept,
               md5(string_agg(tok, ' ' ORDER BY i)) AS clean_md5
             FROM kept GROUP BY doc_id)
      SELECT t.doc_id, len(t.toks) AS n_tokens,
             coalesce(r.n_removed, 0) AS n_removed_tokens,
             coalesce(ka.n_kept, 0) AS n_kept_tokens,
             coalesce(ka.clean_md5, md5('')) AS clean_md5
      FROM t LEFT JOIN rem r USING (doc_id)
             LEFT JOIN ka USING (doc_id)
      ORDER BY t.doc_id""")
  )

  /** Duplicated-span PROVENANCE — the attribution readout over the
    * span family (reference behavior: the engine tells you WHAT is
    * duplicated; an operator curating a 100 TB crawl also needs WHERE
    * the boilerplate comes from — which upstream page seeded the
    * template that 10k mirrors carry). Every stride-1 10-token window
    * whose digest recurs corpus-wide attributes its non-first
    * occurrences to the digest's globally-first occurrence's document
    * (min doc_id, then min pos — the same survivor rule
    * x_dedup_span_removal preserves); per (source doc, duplicating
    * doc) pair the attributed window count is aggregated and the top
    * 20 pairs emitted (ties broken by ids — fully deterministic).
    *
    * Scale shape: IDENTICAL to the removal pass's first phase — the
    * shuffle carries (doc_id, pos, md5) triples, and ONE digest hash
    * partitioning serves both the occurrence rank and the
    * first-occurrence attribution (first_value over the same window
    * spec — Catalyst reuses the sort/partitioning, no second
    * shuffle). Crucially this is NOT an all-pairs join within digest
    * groups (quadratic in group size — the classic provenance
    * blow-up): each occurrence emits exactly one (src, dup)
    * attribution, so the aggregate input is O(positions) at any
    * duplication density. The pair aggregate shuffles (src, dup)
    * longs only; top-20 is a bounded TakeOrdered heap. */
  val spanProvenance: QueryDef = QueryDef(
    "x_dedup_span_provenance",
    (s, dir) => {
      val hh = windowDigests(s, dir, 10)
      val wOcc = Window.partitionBy(col("h"))
        .orderBy(col("doc_id"), col("pos"))
      hh.withColumn("occ", row_number().over(wOcc))
        .withColumn("src_doc", first(col("doc_id")).over(wOcc))
        .filter(col("occ") > 1 && col("src_doc") =!= col("doc_id"))
        .groupBy(col("src_doc"), col("doc_id").as("dup_doc"))
        .agg(count(lit(1)).as("n_shared_windows"))
        .orderBy(col("n_shared_windows").desc, col("src_doc"),
          col("dup_doc"))
        .limit(20)
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      sh AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 9)) AS pos
             FROM t WHERE len(toks) >= 10),
      hh AS (SELECT doc_id, pos,
               md5(array_to_string(toks[pos+1 : pos+10], ' ')) AS h
             FROM sh),
      r AS (SELECT doc_id, pos,
              row_number() OVER w AS occ,
              first_value(doc_id) OVER w AS src_doc
            FROM hh WINDOW w AS (PARTITION BY h ORDER BY doc_id, pos)),
      p AS (SELECT src_doc, doc_id AS dup_doc
            FROM r WHERE occ > 1 AND src_doc <> doc_id)
      SELECT src_doc, dup_doc, count(*) AS n_shared_windows
      FROM p GROUP BY src_doc, dup_doc
      ORDER BY n_shared_windows DESC, src_doc, dup_doc LIMIT 20""")
  )

  /** KMV (bottom-k) sketch corpus-overlap estimation: how much does
    * corpus A (even doc_ids) overlap corpus B (odd doc_ids)? Each side
    * keeps only its k=64 smallest distinct shingle hashes — a bounded
    * TakeOrderedAndProject heap per side, NEVER a corpus-sized state —
    * and the Jaccard estimate is |{h in bottom-k(A∪B) : h ∈ A ∧ h ∈ B}|/k
    * (Beyer et al.'s KMV estimator, public-knowledge technique). The
    * exact Jaccard over distinct shingles is computed alongside so the
    * output exposes the estimation error. At 100 TB: each executor heaps
    * its split's bottom-k, the driver-side merge is k longs per corpus,
    * and comparing ANY pair of pre-built corpus sketches is O(k) — the
    * pre-ingest "how much of this new crawl is already in my training
    * set" check that runs before any per-document dedup. The sketch
    * membership joins run on ≤k-row frames (broadcast for free). Hash:
    * the minhash j=0 hash, replayed in DuckDB HUGEINT arithmetic. */
  val kmvOverlap: QueryDef = QueryDef(
    "x_dedup_kmv_overlap",
    (s, dir) => {
      val side = when(col("doc_id") % 2 === 0, "a").otherwise("b")
      val sh = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("shingle", explode(expr(
          """transform(sequence(0, greatest(size(toks) - 3, 0)),
             i -> concat_ws(' ', slice(toks, i + 1, 3)))""")))
        .select(side.as("side"), col("shingle")).distinct()
      val hs = sh
        .select(col("side"),
          element_at(minhashSig(array(col("shingle")), 1), 1).as("h"))
        .distinct()
      val aSk = hs.filter(col("side") === "a").select(col("h"))
        .orderBy(col("h")).limit(64)
      val bSk = hs.filter(col("side") === "b").select(col("h"))
        .orderBy(col("h")).limit(64)
      val merged = aSk.union(bSk).distinct().orderBy(col("h")).limit(64)
      val est = merged
        .join(aSk.withColumn("in_a", lit(1)), Seq("h"), "left")
        .join(bSk.withColumn("in_b", lit(1)), Seq("h"), "left")
        .agg(sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("n_both"))
      val flags = sh.groupBy(col("shingle")).agg(
        max(when(col("side") === "a", 1).otherwise(0)).as("ia"),
        max(when(col("side") === "b", 1).otherwise(0)).as("ib"))
      val exact = flags.agg(
        sum(col("ia")).cast("long").as("n_a"),
        sum(col("ib")).cast("long").as("n_b"),
        sum(when(col("ia") === 1 && col("ib") === 1, 1L).otherwise(0L))
          .as("n_inter"),
        count(lit(1)).as("n_union"))
      exact.crossJoin(est)
        .withColumn("j_exact",
          col("n_inter").cast("double") / col("n_union").cast("double"))
        .withColumn("j_est", col("n_both").cast("double") / lit(64.0))
        .withColumn("est_err", col("j_est") - col("j_exact"))
        .select(col("n_a"), col("n_b"), col("n_inter"), col("n_union"),
          col("j_exact"), col("j_est"), col("est_err"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      sh0 AS (SELECT doc_id,
                unnest(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
                  i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
              FROM t),
      sh AS (SELECT DISTINCT
               CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS side,
               shingle
             FROM sh0),
      fh AS (SELECT side, shingle,
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
      z0 AS (SELECT side, (fh + CAST(11400714819323198485 AS HUGEINT))
               % 18446744073709551616 AS z FROM fh),
      x0 AS (SELECT side,
               xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM z0),
      m1 AS (SELECT side,
               ((z % 4294967296) * CAST(18397679294719823053 AS HUGEINT)
                + ((z // 4294967296) * 3981806797 % 4294967296) * 4294967296)
               % 18446744073709551616 AS z FROM x0),
      x1 AS (SELECT side,
               xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM m1),
      m2 AS (SELECT side,
               ((z % 4294967296) * CAST(14181476777654086739 AS HUGEINT)
                + ((z // 4294967296) * 444984403 % 4294967296) * 4294967296)
               % 18446744073709551616 AS z FROM x1),
      x2 AS (SELECT side,
               xor(z::UBIGINT, z::UBIGINT >> 33) AS u FROM m2),
      hb AS (SELECT side,
               CAST(CASE WHEN u >= 9223372036854775808
                         THEN u::HUGEINT - 18446744073709551616
                         ELSE u::HUGEINT END AS BIGINT) AS h FROM x2),
      hs AS (SELECT DISTINCT side, h FROM hb),
      a_sk AS (SELECT h FROM hs WHERE side = 'a' ORDER BY h LIMIT 64),
      b_sk AS (SELECT h FROM hs WHERE side = 'b' ORDER BY h LIMIT 64),
      merged AS (SELECT h FROM
                   (SELECT h FROM a_sk UNION SELECT h FROM b_sk) u
                 ORDER BY h LIMIT 64),
      estc AS (SELECT CAST(count(*) AS BIGINT) AS n_both FROM merged
               WHERE h IN (SELECT h FROM a_sk)
                 AND h IN (SELECT h FROM b_sk)),
      flags AS (SELECT shingle,
                  max(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ia,
                  max(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS ib
                FROM sh GROUP BY shingle),
      ex AS (SELECT CAST(sum(ia) AS BIGINT) AS n_a,
               CAST(sum(ib) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_inter,
               CAST(count(*) AS BIGINT) AS n_union
             FROM flags)
      SELECT n_a, n_b, n_inter, n_union,
             CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS j_exact,
             CAST(n_both AS DOUBLE) / 64.0 AS j_est,
             CAST(n_both AS DOUBLE) / 64.0
               - CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS est_err
      FROM ex, estc""")
  )

  /** Content-defined chunking (CDC) dedup: chunk boundaries are decided
    * by the CONTENT of a fixed 4-token window (cut after token i when
    * md5 of tokens i-3..i starts with nibble 0 or 1 → expected chunk
    * ~8 tokens), so identical runs chunk identically at ANY offset —
    * the shift-robustness the fixed 10-token grid of x_dedup_chunks
    * lacks (an inserted header shifts every grid chunk; CDC re-syncs
    * after one window). This is the rolling-window boundary scheme
    * backup/storage dedup uses, applied at token granularity.
    *
    * Scale shape: boundary decisions and chunk digests are per-row
    * higher-order expressions over the scan (no shuffle); the only
    * shuffle is the two-phase (md5 → count) duplicate filter, carrying
    * ~40 B digests — chunk text never moves. At 100 TB the window/nibble
    * parameters trade chunk size vs boundary density with the plan shape
    * unchanged. */
  val cdcChunks: QueryDef = QueryDef(
    "x_dedup_cdc_chunks",
    (s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        // cut after 0-based token i (full-window positions only) when the
        // window digest's first nibble is 0 or 1; sequence() descends when
        // stop < start, so guard short docs to an empty cut list
        .withColumn("cuts", expr(
          """CASE WHEN size(toks) >= 5 THEN
               filter(sequence(3, size(toks) - 2),
                 i -> substring(md5(concat_ws(' ', slice(toks, i - 2, 4))),
                                1, 1) IN ('0', '1'))
             ELSE array() END"""))
        .withColumn("starts",
          expr("concat(array(0), transform(cuts, c -> c + 1))"))
        .withColumn("chunks", expr(
          """transform(sequence(0, size(starts) - 1),
             j -> concat_ws(' ', slice(toks, element_at(starts, j + 1) + 1,
                    (CASE WHEN j = size(starts) - 1 THEN size(toks)
                          ELSE element_at(starts, j + 2) END)
                    - element_at(starts, j + 1))))"""))
      val chunkRows = base.select(col("doc_id"),
        explode(expr("transform(chunks, c -> md5(c))")).as("h"))
      val dupCounts = chunkRows.groupBy(col("h"))
        .agg(count(lit(1)).as("n"))
      val perDoc = chunkRows.join(dupCounts, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      base.select(col("doc_id"), size(col("toks")).as("n_toks"))
        .join(perDoc, Seq("doc_id"))
        .withColumn("avg_chunk_toks",
          col("n_toks").cast("double") / col("n_chunks").cast("double"))
        .select(col("doc_id"), col("n_toks"), col("n_chunks"),
          col("avg_chunk_toks"), col("n_dup_chunks"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      c AS (SELECT doc_id, toks,
              list_filter(range(3, len(toks) - 1),
                i -> substr(md5(array_to_string(toks[i-2:i+1], ' ')), 1, 1)
                     IN ('0', '1')) AS cuts
            FROM t),
      st AS (SELECT doc_id, toks,
               list_prepend(0, list_transform(cuts, x -> x + 1)) AS starts
             FROM c),
      ch AS (SELECT doc_id, len(toks) AS n_toks,
               list_transform(range(0, len(starts)),
                 j -> md5(array_to_string(
                   toks[starts[j+1]+1 :
                        CASE WHEN j = len(starts) - 1 THEN len(toks)
                             ELSE starts[j+2] END], ' '))) AS hs
             FROM st),
      cr AS (SELECT doc_id, n_toks, unnest(hs) AS h FROM ch),
      dc AS (SELECT h, count(*) AS n FROM cr GROUP BY h),
      pd AS (SELECT cr.doc_id, any_value(cr.n_toks) AS n_toks,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN dc.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_chunks
             FROM cr JOIN dc USING (h) GROUP BY cr.doc_id)
      SELECT doc_id, n_toks, n_chunks,
             CAST(n_toks AS DOUBLE) / CAST(n_chunks AS DOUBLE)
               AS avg_chunk_toks,
             n_dup_chunks
      FROM pd ORDER BY doc_id""")
  )

  /** EXACT set-similarity self-join at Jaccard ≥ 4/5 over 3-token
    * shingle sets — the deterministic complement to minhash-LSH: LSH is
    * probabilistic (banding can miss a true pair), this op provably
    * finds EVERY qualifying pair, via the prefix-filtering bound
    * (PPJoin family, public knowledge): order each doc's shingles by
    * ascending global frequency (rarest first); two sets with
    * |A∩B|/|A∪B| ≥ τ MUST share a shingle among each side's first
    * n − ⌈τ·n⌉ + 1, so the candidate join runs only on those prefix
    * keys — and prefixes are by construction the corpus-RAREST
    * shingles, so bucket sizes stay small exactly where a naive
    * token-join explodes (boilerplate shingles never enter a prefix).
    * The threshold test is pure integer arithmetic (5·|∩| ≥ 4·|∪|);
    * the reported jaccard is a single int/int division — one IEEE op,
    * identical in both engines.
    *
    * Scale shape: shingles are xxhash64'd to 8-byte keys right after the
    * per-doc string-distinct, so every shuffle (frequency count, prefix
    * ranking, candidate self-join) moves longs, never shingle text; the
    * verify step joins each candidate pair to its two sorted hash arrays
    * and counts the true intersection with a codegen'd array_intersect —
    * candidates only, never all pairs, and no second explode of the
    * corpus. The global frequency table is a two-phase count joined BY
    * KEY (like the LM bigram table), never broadcast — at 100 TB it is
    * corpus-vocabulary-sized. (The prefix bound only needs SOME total
    * order shared by both sides, so ordering by hashed-token frequency is
    * as complete as ordering by string; the oracle replays the string
    * pipeline and the final Jaccard-filtered pair set is
    * algorithm-independent.) */
  val setJoin: QueryDef = QueryDef(
    "x_dedup_setjoin",
    (s, dir) => {
      // r15: spread below the shingle derivation (same ~2.5 s
      // single-task profile and rationale as x_dedup_containment)
      val d = Tables.spread(docs(s, dir)
          .select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), array_distinct(when(size(col("toks")) >= 3,
          expr("transform(sequence(0, size(toks) - 3), " +
            "i -> concat_ws(' ', slice(toks, i + 1, 3)))"))
          .otherwise(expr("array()"))).as("shs"))
        // hash AFTER the string distinct: n stays the exact string-set
        // size; 64-bit collisions are the standard negligible trade
        .select(col("doc_id"),
          expr("transform(shs, x -> xxhash64(x))").as("sh"))
        .withColumn("n", size(col("sh")).cast("long"))
        // materialize ONCE: the shingled table feeds the posting explode
        // AND both sides of the verify join — lazily each reference
        // re-runs the whole shingle/distinct/hash derivation (the
        // dominant per-row compute). Checkpointed state is (id, hash
        // array, n) longs — spill-friendly; see GraphQueries for the
        // reliable-checkpoint note at cluster scale.
        // The n>0 filter sits ABOVE the barrier (r15): below it,
        // predicate pushdown drags the whole shingle derivation under
        // the spread's repartition — back onto the single scan split's
        // one core (profiled; the checkpoint carrying a few empty-
        // shingle rows is free by comparison).
        .barrier()
        .filter(col("n") > 0)
      val tok = d.select(col("doc_id"), col("n"), explode(col("sh")).as("t"))
      val freq = tok.groupBy(col("t")).agg(count(lit(1)).as("f"))
      val pref = tok.join(freq, Seq("t"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("f"), col("t"))))
        .filter(col("rk") <= col("n") - expr("(4 * n + 4) div 5") + 1)
        .select(col("t"), col("doc_id"), col("n"), col("rk"))
      // length filter (PPJoin): J(A,B) ≥ 4/5 forces 4·|B| ≤ 5·|A| (and
      // symmetrically), so size-incompatible prefix collisions are culled
      // before the verify stage ever sees them. Then the POSITIONAL
      // filter (PPJoin Lemma 2): at the first shared prefix token —
      // positions i in A, j in B of the common frequency order — overlap
      // ≤ 1 + min(|A|−i, |B|−j); since earlier matches give larger
      // bounds, max() over the observed matches IS the first-match
      // bound. J ≥ 4/5 needs overlap ≥ 4(|A|+|B|)/9, so pairs whose
      // bound can't reach it never enter the array-intersect verify —
      // at sf0.1 this cuts verify pairs 43.5k → 12.8k (3.4×), and the
      // verify shuffle (two sorted hash arrays per pair) shrinks with it.
      val cand = pref.as("pa")
        .join(pref.as("pb"), col("pa.t") === col("pb.t") &&
          col("pa.doc_id") < col("pb.doc_id") &&
          col("pa.n") * 4 <= col("pb.n") * 5 &&
          col("pb.n") * 4 <= col("pa.n") * 5)
        .groupBy(col("pa.doc_id").as("da"), col("pb.doc_id").as("db"))
        .agg(max(lit(1) + least(col("pa.n") - col("pa.rk"),
          col("pb.n") - col("pb.rk"))).as("ub"),
          first(col("pa.n")).as("ca"), first(col("pb.n")).as("cb"))
        .filter(lit(9) * col("ub") >= lit(4) * (col("ca") + col("cb")))
        .select(col("da"), col("db"))
      val sets = d.select(col("doc_id"),
        sort_array(col("sh")).as("sha"), col("n"))
      cand
        .join(sets.select(col("doc_id").as("da"), col("sha").as("sa"),
          col("n").as("na")), Seq("da"))
        .join(sets.select(col("doc_id").as("db"), col("sha").as("sb"),
          col("n").as("nb")), Seq("db"))
        .withColumn("ix", size(array_intersect(col("sa"), col("sb")))
          .cast("long"))
        .filter(expr("5 * ix >= 4 * (na + nb - ix)"))
        .select(col("da"), col("db"), col("ix"), col("na"), col("nb"),
          (col("ix").cast("double") / (col("na") + col("nb") - col("ix")))
            .as("jaccard"))
        .orderBy(col("da"), col("db"))
    },
    oracle = Some("""
      WITH dd AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(
               range(0, len(toks) - 2),
               i -> array_to_string(toks[i+1 : i+3], ' '))) AS s
             FROM dd WHERE len(toks) >= 3),
      nn AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM sh
             WHERE len(s) > 0),
      tok AS (SELECT doc_id, unnest(s) AS t FROM sh),
      freq AS (SELECT t, count(*) AS f FROM tok GROUP BY t),
      pref AS (SELECT doc_id, t FROM (
                 SELECT x.doc_id, x.t, nn.n,
                   row_number() OVER (PARTITION BY x.doc_id
                     ORDER BY freq.f, x.t) AS rk
                 FROM tok x JOIN freq USING (t) JOIN nn USING (doc_id))
               WHERE rk <= n - (4 * n + 4) // 5 + 1),
      cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
               FROM pref a JOIN pref b
                 ON a.t = b.t AND a.doc_id < b.doc_id),
      inter AS (SELECT c.da, c.db, CAST(count(*) AS BIGINT) AS ix
                FROM cand c
                  JOIN tok x ON x.doc_id = c.da
                  JOIN tok y ON y.doc_id = c.db AND y.t = x.t
                GROUP BY c.da, c.db)
      SELECT i.da, i.db, i.ix, na.n AS na, nb.n AS nb,
             CAST(i.ix AS DOUBLE) / (na.n + nb.n - i.ix) AS jaccard
      FROM inter i
        JOIN nn na ON na.doc_id = i.da
        JOIN nn nb ON nb.doc_id = i.db
      WHERE 5 * i.ix >= 4 * (na.n + nb.n - i.ix)
      ORDER BY i.da, i.db""")
  )

  /** KEEP-BEST dedup consolidation — the decision step after clustering:
    * "which duplicate do you keep?" Each minhash cluster (same derivation
    * as x_dedup_clusters) elects the member with the most content
    * (n_chars desc, doc_id tiebreak) as its survivor; the report gives
    * per-cluster member count, survivor, and the chars kept vs dropped —
    * the numbers a curation run logs to justify its deletions.
    *
    * Scale shape: clustering shuffles (doc_id, band key) longs; the
    * election is one ranked window over (cluster_id, doc_id, n_chars)
    * triples — never text; cluster sizes are bounded by the band
    * geometry, so no window partition explodes. */
  val keepBest: QueryDef = QueryDef(
    "x_dedup_keep_best",
    (s, dir) => {
      val d0 = docs(s, dir)
      val base = d0
        .select(col("doc_id"), array_distinct(split(col("text"), " "))
          .as("toks"))
        .withColumn("sig", minhashSig(col("toks"), 32))
      val bands = minhashBands(base)
      val bucketMin = bands.groupBy(col("band_id"), col("band_key"))
        .agg(min(col("doc_id")).as("bucket_min"))
      val clusterOf = bands
        .join(bucketMin, Seq("band_id", "band_key"))
        .groupBy(col("doc_id"))
        .agg(min(col("bucket_min")).as("cluster_id"))
      val withQ = clusterOf
        .join(d0.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      withQ.withColumn("rk", row_number().over(w))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max(when(col("rk") === 1, col("doc_id"))).as("kept_doc"),
          max(when(col("rk") === 1, col("n_chars"))).as("kept_chars"),
          (sum(col("n_chars")) -
            max(when(col("rk") === 1, col("n_chars")))).as("dropped_chars"))
        .orderBy(col("cluster_id"))
    },
    oracle = Some(minhashBandsSql + """,
      bucket_min AS (SELECT b, h0, h1, h2, h3, min(doc_id) AS m
                     FROM bands GROUP BY b, h0, h1, h2, h3),
      cl AS (SELECT x.doc_id, min(bm.m) AS cluster_id
             FROM bands x JOIN bucket_min bm USING (b, h0, h1, h2, h3)
             GROUP BY x.doc_id),
      q AS (SELECT cl.cluster_id, cl.doc_id, dd.n_chars,
              row_number() OVER (PARTITION BY cl.cluster_id
                ORDER BY dd.n_chars DESC, cl.doc_id) AS rk
            FROM cl JOIN documents dd USING (doc_id))
      SELECT cluster_id, count(*) AS n_members,
             max(CASE WHEN rk = 1 THEN doc_id END) AS kept_doc,
             max(CASE WHEN rk = 1 THEN n_chars END) AS kept_chars,
             CAST(sum(n_chars) - max(CASE WHEN rk = 1 THEN n_chars END)
               AS BIGINT) AS dropped_chars
      FROM q GROUP BY cluster_id ORDER BY cluster_id""")
  )

  /** EXACT containment self-join at C(A→B) = |A∩B|/|A| ≥ 4/5 over
    * 3-token shingle sets — the ASYMMETRIC complement to x_dedup_setjoin:
    * Jaccard misses a short doc quoted inside a long one (the union term
    * swamps the overlap), containment is exactly the "A is mostly inside
    * B" test a quote/boilerplate/partial-copy pass needs, and it is
    * directional (A⊂B does not imply B⊂A).
    *
    * Candidate generation uses the one-sided prefix bound: if
    * |A∩B| ≥ τ·|A| then A must share a shingle among its
    * n_a − ⌈τ·n_a⌉ + 1 rarest (global-frequency-ascending order) — but
    * B gets NO prefix (containment does not bound B's size), so A's
    * prefix joins B's FULL posting list. That stays cheap for the same
    * reason setjoin's prefix does: prefixes are by construction the
    * corpus-rarest shingles, so their posting lists are short.
    *
    * Scale shape: identical shuffle discipline to setjoin — shingles are
    * xxhash64'd before any shuffle (longs, never text), the frequency
    * table joins BY KEY, and the verify intersect runs on candidates
    * only. The threshold test is integer (5·ix ≥ 4·na); the reported
    * containment is one int/int division, identical in both engines. */
  val containment: QueryDef = QueryDef(
    "x_dedup_containment",
    (s, dir) => {
      // r15: spread below the shingle derivation — profiled as a ~2 s
      // single-task stage on the bench's one-split corpus (the 3-gram
      // transform + distinct + hash per doc is the query's dominant
      // per-row compute); identity at scale, Tables.spread
      val d = Tables.spread(docs(s, dir)
          .select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), array_distinct(when(size(col("toks")) >= 3,
          expr("transform(sequence(0, size(toks) - 3), " +
            "i -> concat_ws(' ', slice(toks, i + 1, 3)))"))
          .otherwise(expr("array()"))).as("shs"))
        .select(col("doc_id"),
          expr("transform(shs, x -> xxhash64(x))").as("sh"))
        .withColumn("n", size(col("sh")).cast("long"))
        // n>0 above the barrier — same pushdown trap as x_dedup_setjoin
        .barrier()
        .filter(col("n") > 0)
      val tok = d.select(col("doc_id"), col("n"), explode(col("sh")).as("t"))
      val freq = tok.groupBy(col("t")).agg(count(lit(1)).as("f"))
      // A-side prefix: rarest n - ceil(4n/5) + 1 shingles
      val pref = tok.join(freq, Seq("t"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("f"), col("t"))))
        .filter(col("rk") <= col("n") - expr("(4 * n + 4) div 5") + 1)
        .select(col("t"), col("doc_id").as("da"))
      val cand = pref
        .join(tok.select(col("t"), col("doc_id").as("db")), Seq("t"))
        .filter(col("da") =!= col("db"))
        .select(col("da"), col("db")).distinct()
      val sets = d.select(col("doc_id"), sort_array(col("sh")).as("sha"),
        col("n"))
      cand
        .join(sets.select(col("doc_id").as("da"), col("sha").as("sa"),
          col("n").as("na")), Seq("da"))
        .join(sets.select(col("doc_id").as("db"), col("sha").as("sb")),
          Seq("db"))
        .withColumn("ix", size(array_intersect(col("sa"), col("sb")))
          .cast("long"))
        .filter(expr("5 * ix >= 4 * na"))
        .select(col("da"), col("db"), col("ix"), col("na"),
          (col("ix").cast("double") / col("na")).as("containment"))
        .orderBy(col("da"), col("db"))
    },
    oracle = Some("""
      WITH dd AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(
               range(0, len(toks) - 2),
               i -> array_to_string(toks[i+1 : i+3], ' '))) AS s
             FROM dd WHERE len(toks) >= 3),
      nn AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM sh
             WHERE len(s) > 0),
      tok AS (SELECT doc_id, unnest(s) AS t FROM sh),
      freq AS (SELECT t, count(*) AS f FROM tok GROUP BY t),
      pref AS (SELECT doc_id, t FROM (
                 SELECT x.doc_id, x.t, nn.n,
                   row_number() OVER (PARTITION BY x.doc_id
                     ORDER BY freq.f, x.t) AS rk
                 FROM tok x JOIN freq USING (t) JOIN nn USING (doc_id))
               WHERE rk <= n - (4 * n + 4) // 5 + 1),
      cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
               FROM pref a JOIN tok b
                 ON a.t = b.t AND a.doc_id <> b.doc_id),
      inter AS (SELECT c.da, c.db, CAST(count(*) AS BIGINT) AS ix
                FROM cand c
                  JOIN tok x ON x.doc_id = c.da
                  JOIN tok y ON y.doc_id = c.db AND y.t = x.t
                GROUP BY c.da, c.db)
      SELECT i.da, i.db, i.ix, na.n AS na,
             CAST(i.ix AS DOUBLE) / na.n AS containment
      FROM inter i JOIN nn na ON na.doc_id = i.da
      WHERE 5 * i.ix >= 4 * na.n
      ORDER BY i.da, i.db""")
  )

  /** Cross-split LEAKAGE audit — the contamination check every eval-split
    * pipeline must run and most forget: a near-dup cluster whose members
    * land in DIFFERENT splits leaks training text into val/test (the
    * model "memorizes" the test set through its train-side twin), which
    * dedup-then-split avoids only if dedup keys the split — this op
    * measures whether it did. Clusters come from the same minhash
    * banding as x_dedup_clusters; splits from the same salted hash as
    * x_pipeline_split; the report lists every cluster straddling ≥2
    * splits with its per-split membership.
    *
    * Scale shape: both inputs are per-row maps over the scan (signature
    * + split bucket); the audit itself aggregates (cluster_id, split)
    * pairs — ids and enum strings, never text — and the straddle filter
    * prunes the overwhelmingly common single-split clusters before
    * anything is reported. */
  val splitLeakage: QueryDef = QueryDef(
    "x_pipeline_split_leakage",
    (s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("toks"))
        .withColumn("sig", minhashSig(col("toks"), 32))
      val bands = minhashBands(base)
      val bucketMin = bands.groupBy(col("band_id"), col("band_key"))
        .agg(min(col("doc_id")).as("bucket_min"))
      val clusterOf = bands
        .join(bucketMin, Seq("band_id", "band_key"))
        .groupBy(col("doc_id"))
        .agg(min(col("bucket_min")).as("cluster_id"))
      clusterOf
        .withColumn("bucket", pmod(fingerprint64(
          concat(lit("split:"), col("doc_id").cast("string"))), lit(100L)))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          countDistinct(col("split")).as("n_splits"),
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
        .filter(col("n_splits") > 1)
        .orderBy(col("cluster_id"))
    },
    oracle = Some(minhashBandsSql + """,
      bucket_min AS (SELECT b, h0, h1, h2, h3, min(doc_id) AS m
                     FROM bands GROUP BY b, h0, h1, h2, h3),
      cl AS (SELECT x.doc_id, min(bm.m) AS cluster_id
             FROM bands x JOIN bucket_min bm USING (b, h0, h1, h2, h3)
             GROUP BY x.doc_id),
      sfp AS (SELECT doc_id,
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
      ssp AS (SELECT doc_id,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
             FROM (SELECT doc_id,
                     ((CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
                                 THEN acc - 18446744073709551616::HUGEINT
                                 ELSE acc END AS BIGINT) % 100) + 100) % 100
                       AS bucket
                   FROM sfp)),
      jj AS (SELECT cl.cluster_id, ssp.split
             FROM cl JOIN ssp USING (doc_id))
      SELECT cluster_id, count(*) AS n_members,
             count(DISTINCT split) AS n_splits,
             CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_train,
             CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_val,
             CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_test
      FROM jj GROUP BY cluster_id
      HAVING count(DISTINCT split) > 1
      ORDER BY cluster_id""")
  )

  def defs: Seq[QueryDef] = Seq(exact, ngramJaccard, minhashLsh,
    minhashCalibration, simhash,
    embeddingNearDup, clusters, incremental, streamNearDup, semdedup, cc,
    chunkDedup,
    spanDedup, spanRemoval, spanProvenance, kmvOverlap, cdcChunks,
    setJoin, keepBest,
    containment,
    splitLeakage)
}
