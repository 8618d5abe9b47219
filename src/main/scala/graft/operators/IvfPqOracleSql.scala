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
}
