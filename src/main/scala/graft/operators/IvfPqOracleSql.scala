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
