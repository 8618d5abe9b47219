package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join parity (SURVEY §2.3).
  *
  * The reference has exactly one physical join: hash join
  * (reference: dbcon/joblist/tuplehashjoin.h:42, utils/joiner/tuplejoiner.h:91)
  * with join types INNER / LARGEOUTER / SMALLOUTER / SEMI / ANTI / SCALAR /
  * MATCHNULLS (joblisttypes.h:85-95). Small sides under 64 MB broadcast to
  * PMs (Calpont.xml:483); larger sides hash-join on the UM and spill via
  * DiskJoinStep. Spark covers all of it: broadcast-hash / shuffled-hash /
  * sort-merge picked by Catalyst+AQE, spill built into the shuffle.
  *
  * Scale: the fact⋈fact joins below shuffle on their join key — at 100 TB
  * that is the correct plan (co-partitioned exchange), and AQE re-splits
  * skewed partitions. Dim joins stay broadcast at any fact size.
  */
object JoinQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Large⋈large equi join: lineitem⋈orders on orderkey (shuffle join). */
  val innerShuffle: QueryDef = QueryDef(
    "j_inner_large",
    (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("o_orderstatus")),
    oracle = Some("""
      SELECT o_orderstatus, count(*) AS n, sum(l_extendedprice) AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  )

  /** Broadcast dim join — the reference's PM-side small-side join
    * (batchprimitiveprocessor.cpp:205 doJoin). */
  val broadcastDim: QueryDef = QueryDef(
    "j_broadcast_dim",
    (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          avg(col("c_acctbal")).as("avg_bal"))
        .orderBy(col("r_name")),
    oracle = Some("""
      SELECT r_name, count(*) AS n_customers, avg(c_acctbal) AS avg_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""")
  )

  /** LEFT OUTER (reference LARGEOUTER) with an ON-clause filter on the
    * right side (outerjoinonfilter.h) — nulls must survive. */
  val leftOuter: QueryDef = QueryDef(
    "j_left_outer",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val bigOrders = t(s, dir, "orders")
        .filter(col("o_totalprice") > 400000)
      cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_matched"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_unmatched"))
        .orderBy(col("c_mktsegment"))
    },
    oracle = Some("""
      SELECT c_mktsegment, count(*) AS n_rows,
             count(o_orderkey) AS n_matched,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_totalprice > 400000
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  )

  /** RIGHT OUTER (reference SMALLOUTER). */
  val rightOuter: QueryDef = QueryDef(
    "j_right_outer",
    (s, dir) => {
      val ord = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
      ord.join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "right_outer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_matched"))
        .orderBy(col("c_nationkey"))
    },
    oracle = Some("""
      SELECT c_nationkey, count(*) AS n_rows, count(o_orderkey) AS n_matched
      FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
           RIGHT OUTER JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey ORDER BY c_nationkey""")
  )

  /** FULL OUTER — parity-plus: the reference's MySQL surface has no FULL
    * JOIN (SURVEY §2.3); Spark gives it free, so we expose it. */
  val fullOuter: QueryDef = QueryDef(
    "j_full_outer",
    (s, dir) => {
      val left = t(s, dir, "customer").filter(col("c_custkey") < 700)
        .select(col("c_custkey").as("k"), col("c_acctbal"))
      val right = t(s, dir, "customer").filter(col("c_custkey") >= 300)
        .select(col("c_custkey").as("k2"), col("c_name"))
      left.join(right, col("k") === col("k2"), "full_outer")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("k").isNull, 1).otherwise(0)).as("n_left_null"),
          sum(when(col("k2").isNull, 1).otherwise(0)).as("n_right_null"),
          sum(when(col("k").isNotNull && col("k2").isNotNull, 1).otherwise(0))
            .as("n_both"))
    },
    oracle = Some("""
      SELECT count(*) AS n_rows,
             CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_left_null,
             CAST(sum(CASE WHEN k2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_right_null,
             CAST(sum(CASE WHEN k IS NOT NULL AND k2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both
      FROM (SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_custkey < 700) l
           FULL OUTER JOIN
           (SELECT c_custkey AS k2, c_name FROM customer WHERE c_custkey >= 300) r
        ON k = k2""")
  )

  /** SEMI join (reference SEMI, IN/EXISTS rewrite ha_in_sub.cpp:94). */
  val semi: QueryDef = QueryDef(
    "j_semi",
    (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment")),
    oracle = Some("""
      SELECT c_mktsegment, count(*) AS n
      FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  )

  /** ANTI join (reference ANTI). */
  val anti: QueryDef = QueryDef(
    "j_anti",
    (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_no_orders"))
        .orderBy(col("c_nationkey")),
    oracle = Some("""
      SELECT c_nationkey, count(*) AS n_no_orders
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_nationkey ORDER BY c_nationkey""")
  )

  /** Null-aware NOT IN (reference MATCHNULLS anti join, ha_in_sub.cpp:238):
    * when the subquery emits a NULL, NOT IN must reject every row. Expressed
    * through our SQL surface so Catalyst's RewritePredicateSubquery plans the
    * null-aware anti join. */
  val antiNullAware: QueryDef = QueryDef(
    "j_anti_null_aware",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT
          (SELECT count(*) FROM customer
           WHERE c_nationkey NOT IN
             (SELECT nullif(n_nationkey, 99) FROM nation)) AS n_without_nulls,
          (SELECT count(*) FROM customer
           WHERE c_nationkey NOT IN
             (SELECT nullif(n_nationkey, 3) FROM nation)) AS n_with_nulls,
          (SELECT count(*) FROM customer
           WHERE c_nationkey NOT IN
             (SELECT n_nationkey FROM nation WHERE n_nationkey > 20)) AS n_plain
      """)
    },
    oracle = Some("""
      SELECT
        (SELECT count(*) FROM customer
         WHERE c_nationkey NOT IN
           (SELECT nullif(n_nationkey, 99) FROM nation)) AS n_without_nulls,
        (SELECT count(*) FROM customer
         WHERE c_nationkey NOT IN
           (SELECT nullif(n_nationkey, 3) FROM nation)) AS n_with_nulls,
        (SELECT count(*) FROM customer
         WHERE c_nationkey NOT IN
           (SELECT n_nationkey FROM nation WHERE n_nationkey > 20)) AS n_plain""")
  )

  /** SCALAR join (reference SCALAR, errors if >1 row; Catalyst enforces the
    * same): uncorrelated scalar subquery as a join input. */
  val scalarSubquery: QueryDef = QueryDef(
    "j_scalar_subquery",
    (s, dir) => {
      val ord = t(s, dir, "orders")
      val avgPrice = ord.agg(avg(col("o_totalprice")).as("avg_price"))
      ord.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("avg_price"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_above_avg"))
        .orderBy(col("o_orderstatus"))
    },
    oracle = Some("""
      SELECT o_orderstatus, count(*) AS n_above_avg
      FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  )

  /** Cross join (small×small). */
  val cross: QueryDef = QueryDef(
    "j_cross",
    (s, dir) =>
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_regionkey"), col("n_nationkey"),
          (col("r_regionkey") === col("n_regionkey")).as("is_home"))
        .orderBy(col("r_regionkey"), col("n_nationkey")),
    oracle = Some("""
      SELECT r_regionkey, n_nationkey,
             (r_regionkey = n_regionkey) AS is_home
      FROM region CROSS JOIN nation
      ORDER BY r_regionkey, n_nationkey""")
  )

  /** Non-equi self join — the reference has no nested-loop operator; theta
    * conditions ride as post-filters on a hash join over the equi prefix
    * (jlf_execplantojoblist.cpp:1292 expressionToFuncJoin). Same here: the
    * equi key (l_orderkey) drives the hash join, the < rides on top. */
  val nonEquiSelf: QueryDef = QueryDef(
    "j_non_equi_self",
    (s, dir) => {
      val a = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").as("ln_a"),
          col("l_quantity").as("qty_a"))
      val b = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok_b"), col("l_linenumber").as("ln_b"),
          col("l_quantity").as("qty_b"))
      a.join(b, col("l_orderkey") === col("ok_b") &&
          col("ln_a") < col("ln_b"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("qty_a") > col("qty_b"), 1).otherwise(0))
            .as("n_decreasing"))
    },
    oracle = Some("""
      SELECT count(*) AS n_pairs,
             CAST(sum(CASE WHEN a.l_quantity > b.l_quantity THEN 1 ELSE 0 END)
               AS BIGINT) AS n_decreasing
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey
       AND a.l_linenumber < b.l_linenumber""")
  )

  /** Function join: equi key is an expression of columns
    * (reference: WITHFCNEXP / expressionToFuncJoin). */
  val functionJoin: QueryDef = QueryDef(
    "j_function_join",
    (s, dir) => {
      val cust = t(s, dir, "customer")
        .select((col("c_custkey") % 100).as("bucket"), col("c_acctbal"))
      val sup = t(s, dir, "supplier")
        .select((col("s_suppkey") % 100).as("sbucket"), col("s_acctbal"))
      cust.join(sup, col("bucket") === col("sbucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal") + col("s_acctbal")).as("sum_bal"))
        .orderBy(col("bucket"))
    },
    oracle = Some("""
      SELECT c_custkey % 100 AS bucket, count(*) AS n,
             sum(c_acctbal + s_acctbal) AS sum_bal
      FROM customer JOIN supplier ON c_custkey % 100 = s_suppkey % 100
      GROUP BY c_custkey % 100 ORDER BY bucket""")
  )

  /** Salted skew join: 10% of fact rows share one hot key; the dim side is
    * replicated ×8 and the fact key salted, so the hot key spreads over 8
    * tasks instead of one straggler. (AQE skew-join handles this
    * automatically post-shuffle; salting is the plan-level variant that
    * also works pre-AQE and for aggregations.) Results must equal the
    * unsalted join. */
  val skewSalted: QueryDef = QueryDef(
    "j_skew_salted",
    (s, dir) => {
      val salts = 8
      val fact = t(s, dir, "lineitem")
        .withColumn("key",
          when(col("l_orderkey") % 10 === 0, 0L)
            .otherwise(col("l_orderkey") % 1000))
        .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")),
          lit(salts)))
      val dim = t(s, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select((col("o_orderkey") % 1000).as("dkey"),
          col("o_totalprice"))
        .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
      fact
        .join(dim, col("key") === col("dkey") && fact("salt") === dim("salt"))
        .agg(count(lit(1)).as("n_joined"),
          // sum in exact decimal (2-dec prices) so partial-agg order cannot
          // perturb the double checksum the byte-exact gate hashes
          sum((col("l_extendedprice") + col("o_totalprice"))
            .cast("decimal(18,2)")).cast("double").as("checksum"),
          countDistinct(col("key")).as("n_keys"))
    },
    oracle = Some("""
      WITH fact AS (SELECT CASE WHEN l_orderkey % 10 = 0 THEN 0
                                ELSE l_orderkey % 1000 END AS key,
                           l_extendedprice
                    FROM lineitem),
           dim AS (SELECT o_orderkey % 1000 AS dkey, o_totalprice
                   FROM orders WHERE o_orderkey < 1000)
      SELECT count(*) AS n_joined,
             CAST(sum(CAST(l_extendedprice + o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE) AS checksum,
             count(DISTINCT key) AS n_keys
      FROM fact JOIN dim ON key = dkey""")
  )

  /** DuckDB replay of the FNV-1a + murmur-mix hash family over
    * CAST(k AS VARCHAR) for j = 0..3, down to bloom bit positions in
    * [0, 65536). Same HUGEINT chain as the minhash/CMS oracles; `p`
    * prefixes the CTE names so the chain can be instantiated for both
    * join sides in one query. */
  private def bloomChainSql(p: String, src: String): String = s"""
      ${p}fh AS (SELECT k,
           list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
             list_transform(
               range(1, octet_length(encode(CAST(k AS VARCHAR))) + 1),
               i -> CAST((strpos('0123456789ABCDEF',
                        substr(hex(encode(CAST(k AS VARCHAR))), i*2-1, 1)) - 1)
                        * 16
                  + (strpos('0123456789ABCDEF',
                        substr(hex(encode(CAST(k AS VARCHAR))), i*2, 1)) - 1)
                  AS HUGEINT))),
             (h, c) -> (xor(CAST(h AS UBIGINT), CAST(c AS UBIGINT))::HUGEINT
                        * 1099511628211) % 18446744073709551616) AS fh
         FROM $src),
      ${p}z0 AS (SELECT k, j,
                   (fh + (j+1) * CAST(11400714819323198485 AS HUGEINT))
                     % 18446744073709551616 AS z
                 FROM ${p}fh
                 CROSS JOIN (SELECT unnest(range(0, 4)) AS j) ${p}js),
      ${p}x0 AS (SELECT k, j,
                   xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM ${p}z0),
      ${p}m1 AS (SELECT k, j,
                   ((z % 4294967296) * CAST(18397679294719823053 AS HUGEINT)
                    + ((z // 4294967296) * 3981806797 % 4294967296)
                      * 4294967296) % 18446744073709551616 AS z FROM ${p}x0),
      ${p}x1 AS (SELECT k, j,
                   xor(z::UBIGINT, z::UBIGINT >> 33)::HUGEINT AS z FROM ${p}m1),
      ${p}m2 AS (SELECT k, j,
                   ((z % 4294967296) * CAST(14181476777654086739 AS HUGEINT)
                    + ((z // 4294967296) * 444984403 % 4294967296)
                      * 4294967296) % 18446744073709551616 AS z FROM ${p}x1),
      ${p}x2 AS (SELECT k, j,
                   xor(z::UBIGINT, z::UBIGINT >> 33) AS u FROM ${p}m2),
      ${p}b AS (SELECT k, j,
                  ((CAST(CASE WHEN u >= 9223372036854775808
                        THEN u::HUGEINT - 18446744073709551616
                        ELSE u::HUGEINT END AS BIGINT) % 65536) + 65536)
                  % 65536 AS b
                FROM ${p}x2)"""

  /** Bloom-filter join pruning — the explicit form of the runtime filter
    * a 100 TB fact⋈dim join wants: hash the (small) filtered dim-key set
    * into a k=4, m=65536 bloom bit set, broadcast it as ONE row, and
    * check every distinct fact key per-row in whole-stage codegen
    * (forall over the 4 hashes, each an O(1) packed-word bit test) —
    * the fact side is never shuffled or exploded. The DuckDB replay
    * models the same bit set as distinct set-bit positions (identical
    * membership semantics, portable arithmetic — no signed-shift
    * overflow). Output pins the bloom contract: zero
    * false negatives, and the measured false-positive rate vs the exact
    * semi join. Reference: the reference prunes fact scans with
    * casual-partition min/max instead (primitives/blockrequest API);
    * bloom pruning is the hash-space analog Spark's runtime filters use. */
  val bloomPrefilter: QueryDef = QueryDef(
    "j_bloom_prefilter",
    (s, dir) => {
      import graft.functions.HashFunctions.minhashSig
      val dimKeys = t(s, dir, "orders")
        .filter(col("o_orderdate") < "1995-03-01")
        .select(col("o_orderkey")).distinct()
      // pack the 65536 bits into 1024 longs so the per-hash membership
      // test is an O(1) word-index + bit-shift, not an O(m) array scan
      // (the array_contains form was 60× slower at sf0.1 — a linear
      // probe over the bit list is exactly what dies at scale)
      val bloom = dimKeys
        .select(posexplode(
          minhashSig(array(col("o_orderkey").cast("string")), 4)))
        .select(pmod(col("col"), lit(65536L)).as("b")).distinct()
        .select(expr("b div 64").as("w"),
          expr("shiftleft(1L, cast(b % 64 as int))").as("v"))
        .groupBy(col("w")).agg(expr("bit_or(v)").as("word"))
        .agg(map_from_entries(collect_list(struct(col("w"), col("word"))))
          .as("m"))
        .select(expr(
          "transform(sequence(0, 1023), i -> coalesce(m[cast(i as bigint)], 0L))")
          .as("bloom"))
      val facts = t(s, dir, "lineitem")
        .select(col("l_orderkey")).distinct()
        .withColumn("hs",
          minhashSig(array(col("l_orderkey").cast("string")), 4))
      facts.crossJoin(broadcast(bloom))
        .withColumn("pass", expr(
          """forall(hs, h -> (shiftright(
               bloom[cast(pmod(h, 65536L) div 64 as int)],
               cast(pmod(h, 65536L) % 64 as int)) & 1) = 1)"""))
        .join(dimKeys.withColumn("is_member", lit(true)),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(
          count(lit(1)).as("n_keys"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass_bloom"),
          sum(when(col("is_member").isNotNull, 1L).otherwise(0L))
            .as("n_members"),
          sum(when(col("pass") && col("is_member").isNull, 1L).otherwise(0L))
            .as("n_false_pos"))
        .withColumn("fp_rate", col("n_false_pos").cast("double")
          / (col("n_keys") - col("n_members")))
        .select(col("n_keys"), col("n_pass_bloom"), col("n_members"),
          col("n_false_pos"), col("fp_rate"))
    },
    oracle = Some(s"""
      WITH dk AS (SELECT DISTINCT o_orderkey AS k FROM orders
                  WHERE o_orderdate < TIMESTAMP '1995-03-01 00:00:00'),
      ${bloomChainSql("d", "dk")},
      bits AS (SELECT DISTINCT b FROM db),
      fk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
      ${bloomChainSql("f", "fk")},
      pass AS (SELECT k, bool_and(b IN (SELECT b FROM bits)) AS pass
               FROM fb GROUP BY k),
      agg AS (SELECT
                CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_pass_bloom,
                CAST(sum(CASE WHEN dk.k IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_members,
                CAST(sum(CASE WHEN pass AND dk.k IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_false_pos
              FROM pass LEFT JOIN dk ON dk.k = pass.k)
      SELECT n_keys, n_pass_bloom, n_members, n_false_pos,
             CAST(n_false_pos AS DOUBLE) / (n_keys - n_members) AS fp_rate
      FROM agg""")
  )

  /** Fuzzy similarity join (edit distance ≤ 1) via the deletion
    * neighborhood: each name emits itself plus its |name| one-char
    * deletions as join keys; two strings within one edit ALWAYS share a
    * key (equal → the full string; one substitution → the deletion of
    * the differing char from each; one insert/delete → the shorter IS a
    * deletion variant of the longer), so candidates come from an
    * EQUI-join on the variant column — never an all-pairs cross — and a
    * cheap `levenshtein` verify kills the false candidates the
    * neighborhood admits (e.g. transpositions share keys at distance 2).
    * At 100 TB: key volume is rows×(len+1), bucket sizes are bounded by
    * real near-match density, and the verify runs only on candidates —
    * the same generate→verify shape as the minhash-LSH dedup. The
    * reference reaches fuzzy matching through its MySQL function joins
    * (SOUNDEX et al. routed to the UM expression step,
    * dbcon/mysql/ha_scalar_fn.cpp); the deletion-neighborhood form is
    * the scale-right Spark expression of the same capability. */
  val fuzzyEditJoin: QueryDef = QueryDef(
    "j_fuzzy_edit_join",
    (s, dir) => {
      val names = t(s, dir, "supplier")
        .select(col("s_name").as("name")).distinct()
      val keyed = names.withColumn("v", explode(expr(
        """concat(array(name),
           transform(sequence(1, length(name)),
             i -> concat(substring(name, 1, i - 1),
                         substring(name, i + 1, length(name)))))""")))
      keyed.as("a")
        .join(keyed.as("b"),
          col("a.v") === col("b.v") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
        .distinct()
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 1)
        .orderBy(col("name_a"), col("name_b"))
    },
    oracle = Some("""
      WITH names AS (SELECT DISTINCT s_name AS name FROM supplier),
      keyed AS (SELECT name, unnest(list_prepend(name,
                  list_transform(range(1, length(name) + 1),
                    i -> substr(name, 1, i - 1) || substr(name, i + 1)))) AS v
                FROM names),
      cands AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
                FROM keyed a JOIN keyed b
                  ON a.v = b.v AND a.name < b.name)
      SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist
      FROM cands WHERE levenshtein(name_a, name_b) <= 1
      ORDER BY name_a, name_b""")
  )

  /** Skyline (Pareto frontier) over part on (minimize p_retailprice,
    * minimize p_size): a part survives iff no other part is ≤ on both
    * dimensions and < on at least one. The naive formulation is a
    * quadratic NOT EXISTS self-join — the DuckDB oracle deliberately
    * computes it that way as an independent derivation — but the engine
    * plan is the sort-based 2-D sweep: per-price minimum size, then a
    * running minimum over strictly-lower price groups; a row is dominated
    * iff that prefix minimum ≤ its size (strictly-cheaper dominator) or
    * its own price group holds a strictly smaller size (equal-price
    * dominator). O(n log n) by sort instead of O(n²) by join.
    *
    * Scale shape: the grouped min collapses the sweep input to one row
    * per DISTINCT price, and the running minimum over that domain is a
    * range-partitioned prefix-scan ([[graft.functions.Prefix]]): each
    * price range computes its local running min in parallel and the
    * per-range minima merge through a broadcast — associative, so no
    * single-partition window exists even with an unbounded price
    * domain. */
  val skyline: QueryDef = QueryDef(
    "j_skyline_dominance",
    (s, dir) => {
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      val g = p.groupBy(col("p_retailprice"))
        .agg(min(col("p_size")).as("gmin"))
      // range-partitioned prefix minimum over the price domain: the
      // sweep's running min is associative, so Prefix.over merges
      // per-range minima with a broadcast of |partitions| partials —
      // no single-partition window even when the price domain is large
      val g2 = graft.functions.Prefix.over(g, Seq(col("p_retailprice")),
        Seq(graft.functions.Prefix.minOf(col("gmin"), "prevmin",
          inclusive = false)))
      p.join(g2, Seq("p_retailprice"))
        .filter(!(coalesce(col("prevmin") <= col("p_size"), lit(false)) ||
          col("gmin") < col("p_size")))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy(col("p_partkey"))
    },
    oracle = Some("""
      SELECT p_partkey, p_retailprice, p_size
      FROM part p
      WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size <= p.p_size
          AND (q.p_retailprice < p.p_retailprice
            OR q.p_size < p.p_size))
      ORDER BY p_partkey""")
  )

  /** Correlated LATERAL join (top-N-per-outer-row, the classic lateral
    * shape): each nation pulls its own top-2 customers by balance from a
    * correlated ordered-and-limited subquery. Catalyst decorrelates this
    * into a ranked window over one customer shuffle — no per-row
    * re-execution, which is what makes the construct usable when the
    * outer side is millions of rows. (Parity-plus: the reference's MySQL
    * dialect predates LATERAL.) */
  val lateralTopN: QueryDef = QueryDef(
    "j_lateral_topn",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n
        JOIN LATERAL (
          SELECT c_name, c_acctbal
          FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name
          LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
    },
    oracle = Some("""
      SELECT n.n_name, t.c_name, t.c_acctbal
      FROM nation n
      JOIN LATERAL (
        SELECT c_name, c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name
        LIMIT 2) t ON true
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
  )

  /** SQL join-strategy HINT surface — the user-facing override the
    * reference exposes through its session tuning (INFINIDB_* join
    * variables / Calpont.xml thresholds): `/*+ BROADCAST(t) +*/` forces
    * the small side to broadcast regardless of statistics. One SQL text
    * runs on both engines — DuckDB parses the hint as a plain block
    * comment (semantics unchanged, which is exactly the hint contract:
    * hints may change the PLAN, never the RESULT). The broadcast
    * actually taking effect is pinned in PlanSpec. */
  val hintBroadcast: QueryDef = {
    val q = """
      SELECT /*+ BROADCAST(customer) */ c_mktsegment,
             count(*) AS n_orders, sum(o_totalprice) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""
    QueryDef("j_hint_broadcast",
      (s, dir) => { Tables.registerAll(s, dir); s.sql(q) },
      oracle = Some(q))
  }

  /** Large-side OVERRIDE hint — the INFINIDB_ORDERED analog (reference:
    * dbcon/joblist/jlf_tuplejoblist.cpp:1893 — the hint pins the FIRST
    * FROM table as the large side by setting its size estimate to max,
    * overriding cardinality-based side selection). Spark's equivalents
    * are the SHUFFLE_HASH hint (the hinted relation becomes the BUILD
    * side — so hinting the dimension keeps the fact side streaming, the
    * exact large-side pin ORDERED provides) and SHUFFLE_MERGE (forces a
    * sort-merge even where the planner would hash). One SQL text on both
    * engines; DuckDB reads the hints as block comments. Both overrides
    * taking effect is pinned in PlanSpec: same results, different plan —
    * the hint contract. */
  val hintOrdered: QueryDef = {
    val q = """
      SELECT /*+ SHUFFLE_HASH(supplier), SHUFFLE_MERGE(orders) */
             s_nationkey,
             count(*) AS n_lines,
             count(DISTINCT o_orderpriority) AS n_prios
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      GROUP BY s_nationkey ORDER BY s_nationkey"""
    QueryDef("j_hint_ordered",
      (s, dir) => { Tables.registerAll(s, dir); s.sql(q) },
      oracle = Some(q))
  }

  def defs: Seq[QueryDef] = Seq(innerShuffle, broadcastDim, leftOuter,
    rightOuter, fullOuter, semi, anti, antiNullAware, scalarSubquery, cross,
    nonEquiSelf, functionJoin, skewSalted, bloomPrefilter, fuzzyEditJoin,
    skyline, lateralTopN, hintBroadcast, hintOrdered)
}
