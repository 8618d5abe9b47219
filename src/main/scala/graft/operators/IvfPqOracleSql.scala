package graft.operators

/** DuckDB oracle for `VectorQueries.ivfpqTopK` — the composed IVF+PQ
  * index: the coarse quantizer's probe-pruned candidate pairs (kcand,
  * from IvfOracleSql.coreCtes) are scored by the product quantizer's ADC
  * distance table (dtab, from PqOracleSql.coreCtes) instead of exact
  * cosine. Both chains share the eraw/fp CTEs and use disjoint names, so
  * the whole index replays in one WITH — fingerprint inits, both k-means
  * trainings, probe/argmin/argmax tie rules, and the fixed-order ADC sum
  * are all bit-exact against the Spark side. */
private[operators] object IvfPqOracleSql {

  def sql(k: Int, nprobe: Int, m: Int, sub: Int, kpq: Int, iters: Int,
      topk: Int, nq: Int): String = s"""
      WITH ${IvfOracleSql.coreCtes(k, nprobe, iters, nq)},
      ${PqOracleSql.coreCtes(m, sub, kpq, iters, nq)},
      ${PqOracleSql.adcTail(m, iters, topk, "kcand")}"""

  /** Oracle for `x_ann_index_ingest`: trains both quantizers on the BASE
    * corpus only (vec_id % 8 <> 0), then encodes the held-out batch
    * (vec_id % 8 = 0) against the frozen final centroids/codebook with
    * the same argmax-larger-cid / argmin-smaller-cid tie rules the Spark
    * encode uses. */
  def ingestSql(k: Int, m: Int, sub: Int, kpq: Int, iters: Int): String = {
    val cos = AnnOracleCommon.cos _
    val l2 = s"""list_reduce(list_transform(range(1, ${sub + 1}),
            i -> (sv.svec[i] - c.cen[i]) * (sv.svec[i] - c.cen[i])),
          (x, y) -> x + y)"""
    s"""
      WITH ${IvfOracleSql.coreCtes(k, 4, iters, 10, "vec_id % 8 <> 0")},
      ${PqOracleSql.coreCtes(m, sub, kpq, iters, 10, "vec_id % 8 <> 0")},
      batch AS (SELECT vec_id, emb FROM eraw WHERE vec_id % 8 = 0),
      bas AS (SELECT vec_id, cid FROM (
          SELECT b.vec_id, c.cid,
                 row_number() OVER (PARTITION BY b.vec_id
                   ORDER BY ${cos("b.emb", "c.cen")} DESC, c.cid DESC) AS rk
          FROM batch b CROSS JOIN kc${iters + 1}v c) WHERE rk = 1),
      bsub AS (SELECT vec_id, ss.ss,
                 e.nemb[ss.ss * $sub + 1 : ss.ss * $sub + $sub] AS svec
               FROM (SELECT vec_id, list_transform(emb, x -> x /
                       sqrt(list_reduce(list_transform(emb, v -> v * v),
                         (x, y) -> x + y))) AS nemb
                     FROM batch) e
               CROSS JOIN (SELECT unnest(range(0, $m)) AS ss) ss),
      bcode AS (SELECT vec_id, ss, cid FROM (
          SELECT sv.vec_id, sv.ss, c.cid,
                 row_number() OVER (PARTITION BY sv.vec_id, sv.ss
                   ORDER BY $l2 ASC, c.cid ASC) AS rk
          FROM bsub sv JOIN c${iters + 1}v c USING (ss)) WHERE rk = 1),
      bl AS (SELECT vec_id,
               string_agg(CAST(cid AS VARCHAR), ',' ORDER BY ss) AS codes_csv
             FROM bcode GROUP BY vec_id)
      SELECT a.vec_id, a.cid, l.codes_csv
      FROM bas a JOIN bl l USING (vec_id) ORDER BY a.vec_id"""
  }

  /** Oracle for `AnnIndex.buildSummary`: replays both trainings and
    * summarizes the final assignment (ka/a member counts) and the final
    * centroid/codebook tables (kc/c norms, rounded 4) — the persisted
    * artifacts' content, derived independently. */
  def buildSummarySql(k: Int, nprobe: Int, m: Int, sub: Int, kpq: Int,
      iters: Int, nq: Int): String = {
    val norm = (c: String) =>
      s"round(list_reduce(list_transform($c, x -> x * x), " +
        "(a, b) -> a + b), 4)"
    s"""
      WITH ${IvfOracleSql.coreCtes(k, nprobe, iters, nq)},
      ${PqOracleSql.coreCtes(m, sub, kpq, iters, nq)},
      coarse_n AS (SELECT cid, count(*) AS n FROM ka$iters GROUP BY cid),
      coarse_sum AS (SELECT 'coarse' AS component, c.cid AS k1, -1 AS k2,
          n.n, ${norm("c.cen")} AS norm_r4
        FROM kc${iters + 1}v c JOIN coarse_n n USING (cid)),
      pq_n AS (SELECT ss, cid, count(*) AS n FROM a$iters GROUP BY ss, cid),
      pq_sum AS (SELECT 'pq' AS component, c.ss AS k1, c.cid AS k2,
          n.n, ${norm("c.cen")} AS norm_r4
        FROM c${iters + 1}v c JOIN pq_n n USING (ss, cid))
      SELECT component, k1, k2, n, norm_r4 FROM coarse_sum
      UNION ALL SELECT component, k1, k2, n, norm_r4 FROM pq_sum
      ORDER BY component, k1, k2"""
  }
}
