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
  *    cosine with ties to the LARGER cid (Spark's fold's `>=` replacement
  *    in ascending cid order, formerly max(struct(ccos, cid)));
  *  - probes: top-nprobe centroids per query, ties to the SMALLER cid
  *    (row_number ordered by qcos desc, cid);
  *  - candidates from the final assignment, then exact cosine top-k.
  *
  * All cosines are list_reduce ordered folds in ascending dim order — the
  * IEEE operation order of `VectorKernels.cosine` (dot, normA, normB each
  * its own accumulation chain). Coarse-stage CTEs carry a `k` prefix
  * (ka0, kc1v, kcand, …) so IvfPqOracleSql can compose this chain with
  * the product-quantizer chain in one WITH.
  */
private[operators] object IvfOracleSql {
  import AnnOracleCommon.cos

  /** Centroid CTE pair kcNs/kcNv over assignment CTE `from`. */
  private def centroids(n: Int, from: String): String = s"""
      kc${n}s AS (SELECT a.cid, d.i, sum(ev.emb[d.i]) AS s, count(*) AS cnt
                 FROM $from a JOIN eraw ev USING (vec_id)
                 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
                 GROUP BY a.cid, d.i),
      kc${n}v AS (SELECT cid,
                   list(CAST(CAST(s / cnt AS FLOAT) AS DOUBLE) ORDER BY i)
                     AS cen
                 FROM kc${n}s GROUP BY cid)"""

  /** Reassignment CTE kaN: argmax cosine vs centroids kcMv, ties → larger
    * cid (mirrors the Spark fold's `>=` replacement in cid order). */
  private def reassign(n: Int, centsCte: String,
      where: String): String = s"""
      ka${n}s AS (SELECT ev.vec_id, c.cid,
${cos("ev.emb", "c.cen")} AS ccos
                 FROM eraw ev CROSS JOIN $centsCte c $where),
      ka$n AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY ccos DESC, cid DESC) AS rk
                FROM ka${n}s) WHERE rk = 1)"""

  /** The coarse-quantizer chain: eraw + fp + init + `iters` Lloyd
    * iterations + final centroids kc{iters+1}v + probes kprb + candidate
    * pairs kcand(q_id, vec_id). Embeddable after WITH. `trainWhere`
    * optionally restricts the TRAINED corpus (a bare-vec_id predicate) —
    * the frozen-index ingest oracle trains on a subset and encodes the
    * rest against the fixed artifacts. */
  def coreCtes(k: Int, nprobe: Int, iters: Int, nq: Int,
      trainWhere: String = ""): String = {
    val where = if (trainWhere.isEmpty) "" else s"WHERE $trainWhere"
    val iterCtes = (1 to iters).map { it =>
      centroids(it, s"ka${it - 1}") + "," + reassign(it, s"kc${it}v", where)
    }.mkString(",")
    val finalCents = centroids(iters + 1, s"ka$iters")
    s"""${AnnOracleCommon.erawCte},
      ${AnnOracleCommon.fpCte},
      ka0 AS (SELECT vec_id,
               CAST((((CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
                                 THEN acc - 18446744073709551616::HUGEINT
                                 ELSE acc END AS BIGINT) % $k) + $k) % $k)
                    AS INTEGER) AS cid
             FROM fp $where),$iterCtes,$finalCents,
      kprb AS (SELECT q_id, cid FROM (
                SELECT q.vec_id AS q_id, c.cid,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY
${cos("q.emb", "c.cen")} DESC, c.cid) AS rk
                FROM eraw q CROSS JOIN kc${iters + 1}v c
                WHERE q.vec_id < $nq) WHERE rk <= $nprobe),
      kcand AS (SELECT DISTINCT p.q_id, a.vec_id
               FROM ka$iters a JOIN kprb p USING (cid)
               WHERE a.vec_id <> p.q_id)"""
  }

  def sql(k: Int, nprobe: Int, iters: Int, topk: Int, nq: Int): String = s"""
      WITH ${coreCtes(k, nprobe, iters, nq)},
      scored AS (SELECT c.q_id, c.vec_id,
${cos("eq.emb", "ev.emb")} AS cos
                 FROM kcand c
                 JOIN eraw eq ON eq.vec_id = c.q_id
                 JOIN eraw ev ON ev.vec_id = c.vec_id),
      ranked AS (SELECT q_id, vec_id, cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, vec_id) AS rk
                 FROM scored)
      SELECT q_id, rk, vec_id, cos FROM ranked WHERE rk <= $topk
      ORDER BY q_id, rk"""

  /** Oracle for `x_ann_nprobe_sweep`: probes ranked once to `maxProbe`,
    * each sweep level filters the rank, top-k per (np, query), average
    * recall vs the brute-force top-k per level. */
  def sweepSql(k: Int, maxProbe: Int, iters: Int, topk: Int,
      nq: Int): String = s"""
      WITH ${coreCtes(k, maxProbe, iters, nq)},
      kprbr AS (SELECT q_id, cid, rk AS prk FROM (
                SELECT q.vec_id AS q_id, c.cid,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY
${cos("q.emb", "c.cen")} DESC, c.cid) AS rk
                FROM eraw q CROSS JOIN kc${iters + 1}v c
                WHERE q.vec_id < $nq) WHERE rk <= $maxProbe),
      cands AS (SELECT DISTINCT n.np, p.q_id, a.vec_id
               FROM ka$iters a JOIN kprbr p USING (cid)
               CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS np) n
               WHERE p.prk <= n.np AND a.vec_id <> p.q_id),
      scored AS (SELECT c.np, c.q_id, c.vec_id,
${cos("eq.emb", "ev.emb")} AS cos
                 FROM cands c
                 JOIN eraw eq ON eq.vec_id = c.q_id
                 JOIN eraw ev ON ev.vec_id = c.vec_id),
      ranked AS (SELECT np, q_id, vec_id,
                   row_number() OVER (PARTITION BY np, q_id
                                      ORDER BY cos DESC, vec_id) AS rk
                 FROM scored),
      ivf3 AS (SELECT np, q_id, vec_id FROM ranked WHERE rk <= $topk),
      bscored AS (SELECT q.vec_id AS q_id, e.vec_id,
${cos("q.emb", "e.emb")} AS cos
                  FROM eraw q JOIN eraw e ON e.vec_id <> q.vec_id
                  WHERE q.vec_id < $nq),
      branked AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos DESC, vec_id) AS rk
                  FROM bscored),
      brute3 AS (SELECT q_id, vec_id FROM branked WHERE rk <= $topk),
      swept AS (SELECT n.np, b.q_id, b.vec_id,
                  CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
                FROM brute3 b
                CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS np) n
                LEFT JOIN ivf3 i
                  ON i.np = n.np AND i.q_id = b.q_id
                 AND i.vec_id = b.vec_id)
      SELECT np, CAST(count(DISTINCT q_id) AS BIGINT) AS n_queries,
             round(CAST(sum(hit) AS DOUBLE) / count(*), 4) AS avg_recall
      FROM swept GROUP BY np ORDER BY np"""

  /** Oracle for `x_ann_recall_ivf`: the IVF chain's top-k next to the
    * exact brute-force top-k, recall = |∩| / k per query. */
  def recallSql(k: Int, nprobe: Int, iters: Int, topk: Int,
      nq: Int): String = s"""
      WITH ${coreCtes(k, nprobe, iters, nq)},
      scored AS (SELECT c.q_id, c.vec_id,
${cos("eq.emb", "ev.emb")} AS cos
                 FROM kcand c
                 JOIN eraw eq ON eq.vec_id = c.q_id
                 JOIN eraw ev ON ev.vec_id = c.vec_id),
      ranked AS (SELECT q_id, vec_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, vec_id) AS rk
                 FROM scored),
      ivf3 AS (SELECT q_id, vec_id FROM ranked WHERE rk <= $topk),
      bscored AS (SELECT q.vec_id AS q_id, e.vec_id,
${cos("q.emb", "e.emb")} AS cos
                  FROM eraw q JOIN eraw e ON e.vec_id <> q.vec_id
                  WHERE q.vec_id < $nq),
      branked AS (SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos DESC, vec_id) AS rk
                  FROM bscored),
      brute3 AS (SELECT q_id, vec_id FROM branked WHERE rk <= $topk)
      SELECT b.q_id, CAST(count(*) AS BIGINT) AS n_true,
             CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits,
             CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS recall_at_3
      FROM brute3 b LEFT JOIN ivf3 i
        ON i.q_id = b.q_id AND i.vec_id = b.vec_id
      GROUP BY b.q_id ORDER BY b.q_id"""
}
