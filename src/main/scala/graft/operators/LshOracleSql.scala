package graft.operators

/** Shared DuckDB-oracle SQL fragment that rebuilds the random-hyperplane
  * machinery of `graft.functions.VectorKernels` bit-exactly: plane weights
  * = murmur-mixed FNV of the (plane, dim) bytes over seed 42+table scaled
  * by Long.MaxValue, per-vector dot products via list_reduce ordered folds
  * (the Scala kernel's IEEE operation order), and sign-bit bucket packing.
  *
  * Kept in ONE place because two oracles consume it with different plane
  * counts (x_ann_lsh_topk at 8, x_dedup_embedding at 16) — a weight-
  * derivation fix must reach both or one silently diverges from the
  * kernel (the round-3 avalanche fix is exactly that kind of change).
  */
private[operators] object LshOracleSql {

  /** CTE chain `e, pit, wf, wx0, wm1, wx1, wm2, w, wl, dots, buckets`:
    * per (vec_id, table) the integer LSH bucket over 64-dim embeddings. */
  def weightsAndBuckets(tables: Int, planes: Int): String = s"""
      WITH e AS (SELECT vec_id, embedding FROM embeddings),
      pit AS (SELECT t, p, i
              FROM (SELECT unnest(range(0, $tables)) AS t) ts,
                   (SELECT unnest(range(0, $planes)) AS p) ps,
                   (SELECT unnest(range(0, 64)) AS i) dims),
      wf AS (SELECT t, p, i,
               list_reduce(list_prepend(
                   xor(CAST(14695981039346656037 AS UBIGINT),
                       CAST(42 + t AS UBIGINT))::HUGEINT,
                   [CAST(p % 256 AS HUGEINT), CAST(p // 256 AS HUGEINT),
                    CAST(i % 256 AS HUGEINT), CAST(i // 256 AS HUGEINT)]),
                 (h, c) -> (xor(CAST(h AS UBIGINT), CAST(c AS UBIGINT))::HUGEINT
                            * 1099511628211) % 18446744073709551616) AS z
             FROM pit),
      wx0 AS (SELECT t, p, i,
                xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM wf),
      wm1 AS (SELECT t, p, i,
                ((z % 4294967296) * CAST(18397679294719823053 AS HUGEINT)
                 + ((z // 4294967296) * 3981806797 % 4294967296) * 4294967296)
                % 18446744073709551616 AS z FROM wx0),
      wx1 AS (SELECT t, p, i,
                xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM wm1),
      wm2 AS (SELECT t, p, i,
                ((z % 4294967296) * CAST(14181476777654086739 AS HUGEINT)
                 + ((z // 4294967296) * 444984403 % 4294967296) * 4294967296)
                % 18446744073709551616 AS z FROM wx1),
      w AS (SELECT t, p, i,
              CAST(CASE WHEN xor(z::UBIGINT, z::UBIGINT >> 33)
                             >= 9223372036854775808
                        THEN xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT
                             - 18446744073709551616
                        ELSE xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT
                   END AS BIGINT)::DOUBLE / 9223372036854775807 AS w
            FROM wm2),
      wl AS (SELECT t, p, list(w ORDER BY i) AS wv FROM w GROUP BY t, p),
      dots AS (SELECT vec_id, t, p,
                 list_reduce(list_transform(range(1, 65),
                   i -> CAST(embedding[i] AS DOUBLE) * wv[i]),
                   (a, b) -> a + b) AS s
               FROM e CROSS JOIN wl),
      buckets AS (SELECT vec_id, t,
                    CAST(sum(CASE WHEN s > 0 THEN (1 << p) ELSE 0 END)
                         AS INTEGER) AS bucket
                  FROM dots GROUP BY vec_id, t)"""

  /** The Scala kernel's cosine, replayed with the same fold order; the
    * caller must join CTE `e` twice under aliases `ea` and `eb`. */
  def cosineExpr: String = """
                  list_reduce(list_transform(range(1, 65),
                    i -> CAST(ea.embedding[i] AS DOUBLE)
                         * CAST(eb.embedding[i] AS DOUBLE)),
                    (x, y) -> x + y)
                  / (sqrt(list_reduce(list_transform(range(1, 65),
                       i -> CAST(ea.embedding[i] AS DOUBLE)
                            * CAST(ea.embedding[i] AS DOUBLE)),
                       (x, y) -> x + y))
                     * sqrt(list_reduce(list_transform(range(1, 65),
                         i -> CAST(eb.embedding[i] AS DOUBLE)
                              * CAST(eb.embedding[i] AS DOUBLE)),
                         (x, y) -> x + y)))"""
}
