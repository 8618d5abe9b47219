package graft.operators

/** DuckDB-oracle SQL builder that replays `VectorQueries.pqTopK`'s product
  * quantizer bit-exactly:
  *
  *  - vectors L2-normalize (so squared-L2 = 2 − 2·cos on unit vectors),
  *    then the 64 dims split into m subspaces of `sub` dims; every
  *    subspace runs its own k-means over the subvectors;
  *  - init assignment = the same Karp-Rabin fingerprint of the decimal
  *    vec_id as the coarse quantizer (one shared init across subspaces —
  *    they diverge after the first Lloyd step);
  *  - each Lloyd iteration: per-(subspace, cid, dim) double sums / count,
  *    rounded through FLOAT exactly like the Spark side's `array<float>`
  *    codebook cast, then argmin squared-L2 with ties to the SMALLER cid
  *    (Spark's fold keeps the first minimum in ascending cid order);
  *  - ADC scoring: the query's per-subspace distance table joins the
  *    corpus codes; the approximate distance sums the m table entries in
  *    fixed subspace order, never through an order-sensitive aggregate;
  *  - final ranking by (approx ASC, vec_id), with the exact cosine of each
  *    hit emitted alongside.
  *
  * All folds are list_reduce in ascending dim order — the IEEE operation
  * order of the Spark side's zip_with/aggregate chain. The PQ chain's CTE
  * names (e, esub, a0, c1v, dtab, …) are disjoint from the coarse chain's
  * k-prefixed names so IvfPqOracleSql can compose both in one WITH.
  */
private[operators] object PqOracleSql {
  import AnnOracleCommon.cos

  /** Ordered-fold squared L2 between two DOUBLE[] columns of `sub` dims. */
  private def l2sq(a: String, b: String, sub: Int): String = s"""
        list_reduce(list_transform(range(1, ${sub + 1}),
            i -> ($a[i] - $b[i]) * ($a[i] - $b[i])),
          (x, y) -> x + y)"""

  /** Codebook CTE pair cNs/cNv over assignment CTE `from`. */
  private def codebook(n: Int, from: String, sub: Int): String = s"""
      c${n}s AS (SELECT a.ss, a.cid, d.i, sum(sv.svec[d.i]) AS s,
                        count(*) AS cnt
                 FROM $from a JOIN esub sv USING (vec_id, ss)
                 CROSS JOIN (SELECT unnest(range(1, ${sub + 1})) AS i) d
                 GROUP BY a.ss, a.cid, d.i),
      c${n}v AS (SELECT ss, cid,
                   list(CAST(CAST(s / cnt AS FLOAT) AS DOUBLE) ORDER BY i)
                     AS cen
                 FROM c${n}s GROUP BY ss, cid)"""

  /** Reassignment CTE aN: argmin squared-L2 vs codebook cNv, ties →
    * smaller cid (mirrors the Spark fold keeping the first minimum). */
  private def reassign(n: Int, centsCte: String, sub: Int,
      where: String): String = s"""
      a${n}s AS (SELECT sv.vec_id, sv.ss, c.cid,
${l2sq("sv.svec", "c.cen", sub)} AS dd
                 FROM esub sv JOIN $centsCte c USING (ss) $where),
      a$n AS (SELECT vec_id, ss, cid FROM (
                SELECT vec_id, ss, cid,
                       row_number() OVER (PARTITION BY vec_id, ss
                                          ORDER BY dd ASC, cid ASC) AS rk
                FROM a${n}s) WHERE rk = 1)"""

  /** The product-quantizer chain: normalized e + esub + init + `iters`
    * Lloyd iterations + final codebook c{iters+1}v + the query distance
    * table dtab(q_id, ss, cid, dd). Assumes `eraw` and `fp` are already
    * defined (AnnOracleCommon). Embeddable after those. `trainWhere`
    * optionally restricts the TRAINED corpus (bare-vec_id predicate) for
    * the frozen-index ingest oracle. */
  def coreCtes(m: Int, sub: Int, k: Int, iters: Int, nq: Int,
      trainWhere: String = ""): String = {
    val where = if (trainWhere.isEmpty) "" else s"WHERE $trainWhere"
    val iterCtes = (1 to iters).map { it =>
      codebook(it, s"a${it - 1}", sub) + "," +
        reassign(it, s"c${it}v", sub, where)
    }.mkString(",")
    val finalBook = codebook(iters + 1, s"a$iters", sub)
    s"""e AS (SELECT vec_id,
              list_transform(emb, x -> x /
                sqrt(list_reduce(list_transform(emb, v -> v * v),
                  (x, y) -> x + y))) AS emb
            FROM eraw),
      esub AS (SELECT vec_id, ss.ss,
                 e.emb[ss.ss * $sub + 1 : ss.ss * $sub + $sub] AS svec
               FROM e CROSS JOIN
                 (SELECT unnest(range(0, $m)) AS ss) ss),
      a0 AS (SELECT fp.vec_id, ss.ss,
               CAST((((CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
                                 THEN acc - 18446744073709551616::HUGEINT
                                 ELSE acc END AS BIGINT) % $k) + $k) % $k)
                    AS INTEGER) AS cid
             FROM fp CROSS JOIN (SELECT unnest(range(0, $m)) AS ss) ss
             $where),
      $iterCtes,$finalBook,
      dtab AS (SELECT q.vec_id AS q_id, c.ss, c.cid,
${l2sq("q.svec", "c.cen", sub)} AS dd
               FROM esub q JOIN c${iters + 1}v c USING (ss)
               WHERE q.vec_id < $nq)"""
  }

  /** The ADC tail over a candidate relation `candCte(q_id, vec_id)`:
    * per-(q, vec) fixed-order distance sum, rank ascending, top-k with
    * the exact cosine emitted alongside. */
  def adcTail(m: Int, iters: Int, topk: Int, candCte: String,
      codesCte: String = ""): String = {
    val codes = if (codesCte.isEmpty) s"a$iters" else codesCte
    val dSum = (0 until m).map(j => s"d$j").mkString(" + ")
    val dCases = (0 until m).map(j =>
      s"sum(CASE WHEN t.ss = $j THEN t.dd ELSE 0 END) AS d$j").mkString(", ")
    s"""joined AS (SELECT t.q_id, a.vec_id, t.ss, t.dd
                 FROM $candCte cn
                 JOIN $codes a ON a.vec_id = cn.vec_id
                 JOIN dtab t ON t.q_id = cn.q_id AND t.ss = a.ss
                            AND t.cid = a.cid),
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

  def sql(m: Int, sub: Int, k: Int, iters: Int, topk: Int,
      nq: Int): String = s"""
      WITH ${AnnOracleCommon.erawCte},
      ${AnnOracleCommon.fpCte},
      ${coreCtes(m, sub, k, iters, nq)},
      pcand AS (SELECT DISTINCT t.q_id, a.vec_id
                FROM a$iters a CROSS JOIN (SELECT DISTINCT q_id FROM dtab) t
                WHERE a.vec_id <> t.q_id),
      ${adcTail(m, iters, topk, "pcand")}"""
}
