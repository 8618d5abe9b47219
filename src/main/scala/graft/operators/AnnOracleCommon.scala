package graft.operators

/** SQL fragments shared by the ANN oracle builders (IVF, PQ, IVF+PQ):
  * the raw-double embedding view, the Karp-Rabin vec_id fingerprint used
  * for deterministic k-means init, and the ordered-fold cosine that
  * mirrors VectorKernels.cosine's three separate accumulation chains.
  * Keeping them here lets IvfPqOracleSql compose the coarse-quantizer and
  * product-quantizer CTE chains in one WITH without name collisions. */
private[operators] object AnnOracleCommon {

  /** eraw: embeddings as DOUBLE[] (exact float widening). */
  val erawCte: String = """eraw AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE))
                        AS emb
                    FROM embeddings)"""

  /** fp: Karp-Rabin FNV-style polynomial fingerprint of the decimal
    * vec_id string (the Scala side's fingerprint64, 2^64 wrap rebuilt
    * with HUGEINT modular arithmetic). */
  val fpCte: String = """fp AS (SELECT vec_id,
               list_reduce(list_prepend(0::HUGEINT,
                 list_transform(
                   range(1, length(CAST(vec_id AS VARCHAR)) + 1),
                   i -> CAST(ascii(substr(CAST(vec_id AS VARCHAR), i, 1))
                             AS HUGEINT))),
                 (acc, b) -> (acc * 1000003::HUGEINT + b)
                             % 18446744073709551616::HUGEINT) AS acc
             FROM eraw)"""

  /** Ordered-fold cosine between two DOUBLE[] columns (64 dims). */
  def cos(a: String, b: String): String = s"""
        list_reduce(list_transform(range(1, 65), i -> $a[i] * $b[i]),
          (x, y) -> x + y)
        / (sqrt(list_reduce(list_transform(range(1, 65), i -> $a[i] * $a[i]),
             (x, y) -> x + y))
           * sqrt(list_reduce(list_transform(range(1, 65), i -> $b[i] * $b[i]),
               (x, y) -> x + y)))"""
}
