package graft.operators

/** DuckDB-oracle SQL builder that replays `VectorQueries.ivfTopK`'s
  * k-means machinery bit-exactly:
  *
  *  - init assignment = Karp-Rabin FNV-style polynomial fingerprint of the
  *    decimal vec_id string (the Scala side's `fingerprint64`, 2^64 wrap
  *    rebuilt with HUGEINT modular arithmetic), pmod'd into k clusters;
  *  - each Lloyd iteration: per-dim double sums / count, rounded through
  *    FLOAT exactly like the Spark side's `array<float>` centroid cast
  *    (which also absorbs partial-agg summation-order noise), then argmax
  *    cosine with ties to the LARGER cid (Spark's max(struct(ccos, cid)));
  *  - probes: top-nprobe centroids per query, ties to the SMALLER cid
  *    (row_number ordered by qcos desc, cid);
  *  - candidates from the final assignment, then exact cosine top-k.
  *
  * All cosines are list_reduce ordered folds in ascending dim order — the
  * IEEE operation order of `VectorKernels.cosine` (dot, normA, normB each
  * its own accumulation chain).
  */
private[operators] object IvfOracleSql {

  /** Ordered-fold cosine between two DOUBLE[] columns (64 dims). */
  private def cos(a: String, b: String): String = s"""
        list_reduce(list_transform(range(1, 65), i -> $a[i] * $b[i]),
          (x, y) -> x + y)
        / (sqrt(list_reduce(list_transform(range(1, 65), i -> $a[i] * $a[i]),
             (x, y) -> x + y))
           * sqrt(list_reduce(list_transform(range(1, 65), i -> $b[i] * $b[i]),
               (x, y) -> x + y)))"""

  /** Centroid CTE pair cNs/cNv over assignment CTE `from`. */
  private def centroids(n: Int, from: String): String = s"""
      c${n}s AS (SELECT a.cid, d.i, sum(ev.emb[d.i]) AS s, count(*) AS cnt
                 FROM $from a JOIN e ev USING (vec_id)
                 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
                 GROUP BY a.cid, d.i),
      c${n}v AS (SELECT cid,
                   list(CAST(CAST(s / cnt AS FLOAT) AS DOUBLE) ORDER BY i)
                     AS cen
                 FROM c${n}s GROUP BY cid)"""

  /** Reassignment CTE aN: argmax cosine vs centroids cMv, ties → larger
    * cid (mirrors Spark's max(struct(ccos, cid)).getField("cid")). */
  private def reassign(n: Int, centsCte: String): String = s"""
      a${n}s AS (SELECT ev.vec_id, c.cid,
${cos("ev.emb", "c.cen")} AS ccos
                 FROM e ev CROSS JOIN $centsCte c),
      a$n AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY ccos DESC, cid DESC) AS rk
                FROM a${n}s) WHERE rk = 1)"""

  def sql(k: Int, nprobe: Int, iters: Int, topk: Int, nq: Int): String = {
    val iterCtes = (1 to iters).map { it =>
      centroids(it, s"a${it - 1}") + "," + reassign(it, s"c${it}v")
    }.mkString(",")
    val finalCents = centroids(iters + 1, s"a$iters")
    s"""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                 FROM embeddings),
      fp AS (SELECT vec_id,
               list_reduce(list_prepend(0::HUGEINT,
                 list_transform(
                   range(1, length(CAST(vec_id AS VARCHAR)) + 1),
                   i -> CAST(ascii(substr(CAST(vec_id AS VARCHAR), i, 1))
                             AS HUGEINT))),
                 (acc, b) -> (acc * 1000003::HUGEINT + b)
                             % 18446744073709551616::HUGEINT) AS acc
             FROM e),
      a0 AS (SELECT vec_id,
               CAST((((CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
                                 THEN acc - 18446744073709551616::HUGEINT
                                 ELSE acc END AS BIGINT) % $k) + $k) % $k)
                    AS INTEGER) AS cid
             FROM fp),$iterCtes,$finalCents,
      prb AS (SELECT q_id, cid FROM (
                SELECT q.vec_id AS q_id, c.cid,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY
${cos("q.emb", "c.cen")} DESC, c.cid) AS rk
                FROM e q CROSS JOIN c${iters + 1}v c
                WHERE q.vec_id < $nq) WHERE rk <= $nprobe),
      cand AS (SELECT DISTINCT p.q_id, a.vec_id
               FROM a$iters a JOIN prb p USING (cid)
               WHERE a.vec_id <> p.q_id),
      scored AS (SELECT c.q_id, c.vec_id,
${cos("eq.emb", "ev.emb")} AS cos
                 FROM cand c
                 JOIN e eq ON eq.vec_id = c.q_id
                 JOIN e ev ON ev.vec_id = c.vec_id),
      ranked AS (SELECT q_id, vec_id, cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, vec_id) AS rk
                 FROM scored)
      SELECT q_id, rk, vec_id, cos FROM ranked WHERE rk <= $topk
      ORDER BY q_id, rk"""
  }
}
