package graft.operators

/** DuckDB-oracle SQL builder for `x_ann_pq_residual_topk` — the
  * residual-encoding IVF+PQ composition (FAISS's IVFPQ default): the
  * product quantizer trains on RESIDUALS r = nemb − ncen(assigned
  * cluster) instead of raw normalized vectors, and the query side builds
  * one ADC distance table PER PROBED CLUSTER from the query's residual
  * against that cluster's centroid. Residuals concentrate near the
  * origin, so the same k codewords cover them far more densely than they
  * cover the raw sphere — the standard accuracy win of residual PQ.
  *
  * Replays bit-exactly by construction:
  *  - the coarse chain comes verbatim from IvfOracleSql.coreCtes (eraw,
  *    fp, ka{iters} final assignment, kc{iters+1}v centroids, kprb
  *    probes, kcand candidates);
  *  - centroid/vector normalization and the residual subtraction are
  *    ordered folds over identical doubles in both engines;
  *  - the PQ chain (rcN/raN CTEs) mirrors PqOracleSql exactly — same
  *    fingerprint init, FLOAT-rounded codebooks (absorbing partial-agg
  *    summation-order noise), argmin ties to the smaller cid;
  *  - the ADC tail sums the m per-subspace entries in fixed order.
  */
private[operators] object ResidualPqOracleSql {
  import AnnOracleCommon.cos

  private def l2sq(a: String, b: String, sub: Int): String = s"""
        list_reduce(list_transform(range(1, ${sub + 1}),
            i -> ($a[i] - $b[i]) * ($a[i] - $b[i])),
          (x, y) -> x + y)"""

  /** Residual codebook CTE pair rc{n}s/rc{n}v over assignment `from`. */
  private def codebook(n: Int, from: String, sub: Int): String = s"""
      rc${n}s AS (SELECT a.ss, a.cid, d.i, sum(sv.svec[d.i]) AS s,
                        count(*) AS cnt
                 FROM $from a JOIN ress sv USING (vec_id, ss)
                 CROSS JOIN (SELECT unnest(range(1, ${sub + 1})) AS i) d
                 GROUP BY a.ss, a.cid, d.i),
      rc${n}v AS (SELECT ss, cid,
                   list(CAST(CAST(s / cnt AS FLOAT) AS DOUBLE) ORDER BY i)
                     AS cen
                 FROM rc${n}s GROUP BY ss, cid)"""

  /** Residual reassignment CTE ra{n}: argmin squared-L2 vs rc{n}v,
    * ties → smaller cid. */
  private def reassign(n: Int, centsCte: String, sub: Int): String = s"""
      ra${n}s AS (SELECT sv.vec_id, sv.ss, c.cid,
${l2sq("sv.svec", "c.cen", sub)} AS dd
                 FROM ress sv JOIN $centsCte c USING (ss)),
      ra$n AS (SELECT vec_id, ss, cid FROM (
                SELECT vec_id, ss, cid,
                       row_number() OVER (PARTITION BY vec_id, ss
                                          ORDER BY dd ASC, cid ASC) AS rk
                FROM ra${n}s) WHERE rk = 1)"""

  def sql(k: Int, nprobe: Int, m: Int, sub: Int, kpq: Int, iters: Int,
      topk: Int, nq: Int): String = {
    val iterCtes = (1 to iters).map { it =>
      codebook(it, s"ra${it - 1}", sub) + "," +
        reassign(it, s"rc${it}v", sub)
    }.mkString(",")
    val finalBook = codebook(iters + 1, s"ra$iters", sub)
    val dSum = (0 until m).map(j => s"d$j").mkString(" + ")
    val dCases = (0 until m).map(j =>
      s"sum(CASE WHEN t.ss = $j THEN t.dd ELSE 0 END) AS d$j").mkString(", ")
    s"""
      WITH ${IvfOracleSql.coreCtes(k, nprobe, iters, nq)},
      ncen AS (SELECT cid,
                 list_transform(cen, x -> x /
                   sqrt(list_reduce(list_transform(cen, v -> v * v),
                     (x, y) -> x + y))) AS ncen
               FROM kc${iters + 1}v),
      en AS (SELECT vec_id,
               list_transform(emb, x -> x /
                 sqrt(list_reduce(list_transform(emb, v -> v * v),
                   (x, y) -> x + y))) AS nemb
             FROM eraw),
      rres AS (SELECT en.vec_id,
                 list_transform(range(1, 65),
                   i -> en.nemb[i] - nc.ncen[i]) AS rvec
               FROM en JOIN ka$iters a USING (vec_id)
                       JOIN ncen nc ON nc.cid = a.cid),
      ress AS (SELECT vec_id, ss.ss,
                 rvec[ss.ss * $sub + 1 : ss.ss * $sub + $sub] AS svec
               FROM rres CROSS JOIN
                 (SELECT unnest(range(0, $m)) AS ss) ss),
      ra0 AS (SELECT fp.vec_id, ss.ss,
               CAST((((CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
                                 THEN acc - 18446744073709551616::HUGEINT
                                 ELSE acc END AS BIGINT) % $kpq) + $kpq)
                     % $kpq) AS INTEGER) AS cid
             FROM fp CROSS JOIN (SELECT unnest(range(0, $m)) AS ss) ss),
      $iterCtes,$finalBook,
      qr AS (SELECT en.vec_id AS q_id, p.cid AS pcid,
               list_transform(range(1, 65),
                 i -> en.nemb[i] - nc.ncen[i]) AS rq
             FROM en JOIN kprb p ON p.q_id = en.vec_id
                     JOIN ncen nc ON nc.cid = p.cid),
      qrs AS (SELECT q_id, pcid, ss.ss,
                rq[ss.ss * $sub + 1 : ss.ss * $sub + $sub] AS svec
              FROM qr CROSS JOIN
                (SELECT unnest(range(0, $m)) AS ss) ss),
      rdtab AS (SELECT q.q_id, q.pcid, c.ss, c.cid,
${l2sq("q.svec", "c.cen", sub)} AS dd
                FROM qrs q JOIN rc${iters + 1}v c USING (ss)),
      cpairs AS (SELECT c.q_id, c.vec_id, a.cid AS pcid
                 FROM kcand c JOIN ka$iters a USING (vec_id)),
      joined AS (SELECT cp.q_id, cp.vec_id, t.ss, t.dd
                 FROM cpairs cp
                 JOIN ra$iters rc ON rc.vec_id = cp.vec_id
                 JOIN rdtab t ON t.q_id = cp.q_id AND t.pcid = cp.pcid
                             AND t.ss = rc.ss AND t.cid = rc.cid),
      approx0 AS (SELECT t.q_id, t.vec_id, $dCases
                  FROM joined t GROUP BY t.q_id, t.vec_id),
      approx AS (SELECT q_id, vec_id, $dSum AS approx_dist FROM approx0),
      ranked AS (SELECT q_id, vec_id, approx_dist,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY approx_dist ASC, vec_id)
                     AS rk
                 FROM approx),
      hits AS (SELECT q_id, rk, vec_id, approx_dist FROM ranked
               WHERE rk <= $topk)
      SELECT h.q_id, CAST(h.rk AS INT) AS rk, h.vec_id, h.approx_dist,
${cos("eq.emb", "ev.emb")} AS cos
      FROM hits h
      JOIN eraw eq ON eq.vec_id = h.q_id
      JOIN eraw ev ON ev.vec_id = h.vec_id
      ORDER BY h.q_id, h.rk"""
  }
}
