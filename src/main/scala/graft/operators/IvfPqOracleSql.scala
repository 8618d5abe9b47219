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
  /** Batch-encode CTEs shared by the ingest and merge oracles: the
    * held-out rows (vec_id % 8 = 0) encoded against the FROZEN
    * base-trained centroids (bas — argmax cosine, ties to larger cid)
    * and codebook (bcode — argmin L2, ties to smaller cid), mirroring
    * coarseReassign / pqEncode exactly. Assumes the coarse chain
    * (kc{iters+1}v) and PQ chain (c{iters+1}v) are in scope. */
  private def batchEncodeCtes(m: Int, sub: Int, iters: Int): String = {
    val cos = AnnOracleCommon.cos _
    val l2 = s"""list_reduce(list_transform(range(1, ${sub + 1}),
            i -> (sv.svec[i] - c.cen[i]) * (sv.svec[i] - c.cen[i])),
          (x, y) -> x + y)"""
    s"""batch AS (SELECT vec_id, emb FROM eraw WHERE vec_id % 8 = 0),
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
          FROM bsub sv JOIN c${iters + 1}v c USING (ss)) WHERE rk = 1)"""
  }

  /** Oracle for `x_ann_index_merge`: the base-trained index absorbs the
    * frozen-encoded batch WITHOUT retraining — merged assignment and
    * code lists are the unions of the base chains' finals with the
    * batch encodes, probes stay on the base centroids, and the ADC tail
    * scores candidates drawn from the MERGED posting lists against the
    * base codebook. This is the read-side contract of an index
    * compaction: queries see ingested vectors with no quantizer
    * change.
    *
    * With `tombWhere` set (the `x_ann_index_delete` oracle), the merged
    * posting/code lists additionally drop every tombstoned vec_id — the
    * FAISS remove_ids contract: a delete edits the inverted lists only,
    * never the quantizers, so surviving candidates keep their exact
    * codes/scores and deleted ids can never reach the ADC tail. */
  def mergedSql(k: Int, nprobe: Int, m: Int, sub: Int, kpq: Int,
      iters: Int, topk: Int, nq: Int, tombWhere: String = ""): String = {
    val live = if (tombWhere.isEmpty) "" else s" WHERE NOT ($tombWhere)"
    s"""
      WITH ${IvfOracleSql.coreCtes(k, nprobe, iters, nq, "vec_id % 8 <> 0")},
      ${PqOracleSql.coreCtes(m, sub, kpq, iters, nq, "vec_id % 8 <> 0")},
      ${batchEncodeCtes(m, sub, iters)},
      masg AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid FROM ka$iters
               UNION ALL SELECT vec_id, cid FROM bas)$live),
      mcode AS (SELECT vec_id, ss, cid FROM (
                SELECT vec_id, ss, cid FROM a$iters
                UNION ALL SELECT vec_id, ss, cid FROM bcode)$live),
      mcand AS (SELECT DISTINCT p.q_id, a.vec_id
                FROM masg a JOIN kprb p USING (cid)
                WHERE a.vec_id <> p.q_id),
      ${PqOracleSql.adcTail(m, iters, topk, "mcand", "mcode")}"""
  }

  /** Oracle for `x_ann_recall_maintained`: recall@topk of the
    * merged-minus-tombstones ADC read (the maintained index) against the
    * exact brute-force cosine top-k over the LIVE vector set — the
    * quality number a deployment watches after a delete wave, because a
    * tombstoned true-neighbor silently shifts the ground truth. Both
    * sides and the intersection are deterministic, so the whole
    * comparison replays bit-exactly. `tombWhere` must reference the bare
    * `vec_id` column. */
  def maintainedRecallSql(k: Int, nprobe: Int, m: Int, sub: Int, kpq: Int,
      iters: Int, topk: Int, nq: Int, tombWhere: String): String = s"""
      WITH approx AS (SELECT q_id, vec_id FROM (
        ${mergedSql(k, nprobe, m, sub, kpq, iters, topk, nq, tombWhere)})),
      ${AnnOracleCommon.erawCte},
      bscored AS (SELECT q.vec_id AS q_id, e.vec_id,
        ${AnnOracleCommon.cos("q.emb", "e.emb")} AS cos
        FROM eraw q
        JOIN (SELECT * FROM eraw WHERE NOT ($tombWhere)) e
          ON e.vec_id <> q.vec_id
        WHERE q.vec_id < $nq),
      branked AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos DESC, vec_id) AS rk
                  FROM bscored),
      brute3 AS (SELECT q_id, vec_id FROM branked WHERE rk <= $topk)
      SELECT b.q_id, CAST(count(*) AS BIGINT) AS n_true,
             CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits,
             CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS recall_at_3
      FROM brute3 b LEFT JOIN approx a
        ON a.q_id = b.q_id AND a.vec_id = b.vec_id
      GROUP BY b.q_id ORDER BY b.q_id"""

  def ingestSql(k: Int, m: Int, sub: Int, kpq: Int, iters: Int): String = {
    s"""
      WITH ${IvfOracleSql.coreCtes(k, 4, iters, 10, "vec_id % 8 <> 0")},
      ${PqOracleSql.coreCtes(m, sub, kpq, iters, 10, "vec_id % 8 <> 0")},
      ${batchEncodeCtes(m, sub, iters)},
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
