package graft.operators

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
      val bands = base.select(col("doc_id"),
          posexplode(expr("transform(sequence(0, 7), " +
            "b -> hash(sig[b*4], sig[b*4+1], sig[b*4+2], sig[b*4+3]))")))
        .withColumnRenamed("pos", "band_id")
        .withColumnRenamed("col", "band_hash")
      // Pair each bucket member with the bucket's representative (min doc)
      // instead of all-pairs: candidates are O(docs × bands) even when a
      // bucket is huge, which is what survives a 100 TB homogeneous corpus
      // (all-pairs in a hot bucket is O(n²)). Transitive dups still land on
      // the same representative, so cluster membership is preserved.
      val reps = bands.groupBy(col("band_id"), col("band_hash"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > 1)
      val pairs = bands
        .join(reps, Seq("band_id", "band_hash"))
        .filter(col("doc_id") =!= col("rep_id"))
        .select(col("rep_id").as("a"), col("doc_id").as("b"))
        .distinct()
      val toksOf = base.select(col("doc_id"), col("toks"))
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
    oracle = None // custom minhash signature — verified in DedupSpec instead
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
    oracle = None // custom simhash — verified in DedupSpec instead
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
  val embeddingNearDup: QueryDef = QueryDef(
    "x_dedup_embedding",
    (s, dir) => {
      val tables = 4
      val planes = 16
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      // ids only through the explode+shuffle; the 64-float payload stays
      // behind and is re-joined per candidate, not per (vec, table)
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
      val scored = cand
        .join(emb.withColumnRenamed("vec_id", "a")
          .withColumnRenamed("embedding", "va"), Seq("a"))
        .join(emb.withColumnRenamed("vec_id", "b")
          .withColumnRenamed("embedding", "vb"), Seq("b"))
        .select(col("a"), col("b"),
          graft.functions.VectorFunctions.cosineSim(col("va"), col("vb"))
            .as("cos"))
        .filter(col("cos") >= 0.9)
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
    oracle = None // LSH bucketing is graft-specific — verified in VectorSpec
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
      val bands = base.select(col("doc_id"),
          posexplode(expr("transform(sequence(0, 7), " +
            "b -> hash(sig[b*4], sig[b*4+1], sig[b*4+2], sig[b*4+3]))")))
        .withColumnRenamed("pos", "band_id")
        .withColumnRenamed("col", "band_hash")
      val bucketMin = bands.groupBy(col("band_id"), col("band_hash"))
        .agg(min(col("doc_id")).as("bucket_min"))
      val clusterOf = bands
        .join(bucketMin, Seq("band_id", "band_hash"))
        .groupBy(col("doc_id"))
        .agg(min(col("bucket_min")).as("cluster_id"))
      clusterOf
        .withColumn("is_cluster_head", col("doc_id") === col("cluster_id"))
        .orderBy(col("doc_id"))
    },
    oracle = None // custom minhash signature — cluster sanity in DedupSpec
  )

  def defs: Seq[QueryDef] = Seq(exact, ngramJaccard, minhashLsh, simhash,
    embeddingNearDup, clusters)
}
