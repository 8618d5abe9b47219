package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Predicate / projection / cast parity (SURVEY §2.2).
  *
  * The reference evaluates col⊙const predicates in block primitives
  * (COMPARE_{EQ,NE,LT,LE,GT,GE,LIKE,NLIKE} + BOP_{AND,OR,XOR},
  * reference: dbcon/joblist/primitivemsg.h:49-73,
  * primitives/linux-port/column.cpp:1233 p_Col) and OR-chains on one column
  * as ConstantFilter (dbcon/execplan/constantfilter.h). In Spark the same
  * predicates are Catalyst filters pushed into the parquet scan.
  */
object FilterQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Every comparison operator + AND/OR/XOR combinators in one pass. */
  val predicateMatrix: QueryDef = QueryDef(
    "f_predicate_matrix",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.agg(
        sum(when(col("l_linenumber") === 3, 1).otherwise(0)).as("n_eq"),
        sum(when(col("l_linenumber") =!= 3, 1).otherwise(0)).as("n_ne"),
        sum(when(col("l_quantity") < 10, 1).otherwise(0)).as("n_lt"),
        sum(when(col("l_quantity") <= 10, 1).otherwise(0)).as("n_le"),
        sum(when(col("l_quantity") > 40, 1).otherwise(0)).as("n_gt"),
        sum(when(col("l_quantity") >= 40, 1).otherwise(0)).as("n_ge"),
        sum(when(col("l_quantity").between(20, 30), 1).otherwise(0))
          .as("n_between"),
        sum(when(col("l_returnflag").isin("A", "N"), 1).otherwise(0))
          .as("n_in"),
        sum(when(col("l_returnflag") === "R" && col("l_linestatus") === "O", 1)
          .otherwise(0)).as("n_and"),
        sum(when(col("l_returnflag") === "R" || col("l_linestatus") === "O", 1)
          .otherwise(0)).as("n_or"),
        sum(when((col("l_returnflag") === "R") =!= (col("l_linestatus") === "O"),
          1).otherwise(0)).as("n_xor"),
        sum(when(!(col("l_quantity") < 10), 1).otherwise(0)).as("n_not"))
    },
    // DuckDB sum(int) yields HUGEINT (float64 once in pandas); cast to
    // BIGINT so the byte-exact gate sees the same integer type as Spark.
    oracle = Some("""
      SELECT
        CAST(sum(CASE WHEN l_linenumber = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_eq,
        CAST(sum(CASE WHEN l_linenumber <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_ne,
        CAST(sum(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_lt,
        CAST(sum(CASE WHEN l_quantity <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_le,
        CAST(sum(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_gt,
        CAST(sum(CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
        CAST(sum(CASE WHEN l_quantity BETWEEN 20 AND 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_between,
        CAST(sum(CASE WHEN l_returnflag IN ('A', 'N') THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
        CAST(sum(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_and,
        CAST(sum(CASE WHEN l_returnflag = 'R' OR l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_or,
        CAST(sum(CASE WHEN (l_returnflag = 'R') <> (l_linestatus = 'O') THEN 1 ELSE 0 END) AS BIGINT) AS n_xor,
        CAST(sum(CASE WHEN NOT (l_quantity < 10) THEN 1 ELSE 0 END) AS BIGINT) AS n_not
      FROM lineitem""")
  )

  /** LIKE / NOT LIKE on plain and dictionary-shaped strings
    * (reference: p_Dictionary token scan, primitives/linux-port/dictionary.cpp). */
  val likePatterns: QueryDef = QueryDef(
    "f_like_patterns",
    (s, dir) =>
      t(s, dir, "part")
        .agg(
          sum(when(col("p_name").like("%widget%"), 1).otherwise(0))
            .as("n_contains"),
          sum(when(col("p_name").like("red%"), 1).otherwise(0)).as("n_prefix"),
          sum(when(col("p_name").like("%bolt"), 1).otherwise(0)).as("n_suffix"),
          sum(when(col("p_name").like("_ot%"), 1).otherwise(0))
            .as("n_underscore"),
          sum(when(!col("p_name").like("%e%"), 1).otherwise(0)).as("n_nlike"),
          sum(when(col("p_name").rlike("^(red|blue) (bolt|gear)$"), 1)
            .otherwise(0)).as("n_regexp")),
    oracle = Some("""
      SELECT
        CAST(sum(CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END) AS BIGINT) AS n_contains,
        CAST(sum(CASE WHEN p_name LIKE 'red%' THEN 1 ELSE 0 END) AS BIGINT) AS n_prefix,
        CAST(sum(CASE WHEN p_name LIKE '%bolt' THEN 1 ELSE 0 END) AS BIGINT) AS n_suffix,
        CAST(sum(CASE WHEN p_name LIKE '_ot%' THEN 1 ELSE 0 END) AS BIGINT) AS n_underscore,
        CAST(sum(CASE WHEN p_name NOT LIKE '%e%' THEN 1 ELSE 0 END) AS BIGINT) AS n_nlike,
        CAST(sum(CASE WHEN regexp_matches(p_name, '^(red|blue) (bolt|gear)$')
            THEN 1 ELSE 0 END) AS BIGINT) AS n_regexp
      FROM part""")
  )

  /** OR-chain on a single column — the reference's ConstantFilter
    * (dbcon/execplan/constantfilter.h) → Catalyst turns isin into InSet. */
  val constantFilterOrChain: QueryDef = QueryDef(
    "f_constant_or_chain",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1 || col("l_linenumber") === 3 ||
          col("l_linenumber") === 5 || col("l_linenumber") === 7)
        .groupBy(col("l_linenumber"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_linenumber")),
    oracle = Some("""
      SELECT l_linenumber, count(*) AS n
      FROM lineitem
      WHERE l_linenumber = 1 OR l_linenumber = 3 OR l_linenumber = 5
         OR l_linenumber = 7
      GROUP BY l_linenumber ORDER BY l_linenumber""")
  )

  /** IS NULL / IS NOT NULL / null-propagation. Testdata has no NULLs, so
    * nulls are injected with nullif — the reference stores NULL as per-type
    * magic values (joblist/joblisttypes.h) and needs explicit null checks in
    * every primitive; Spark gets three-valued logic natively. */
  val nullSemantics: QueryDef = QueryDef(
    "f_null_semantics",
    (s, dir) =>
      t(s, dir, "lineitem")
        .withColumn("qty_n", nullif(col("l_quantity"), lit(1.0)))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("qty_n").isNull, 1).otherwise(0)).as("n_null"),
          sum(when(col("qty_n").isNotNull, 1).otherwise(0)).as("n_notnull"),
          count(col("qty_n")).as("cnt_skips_null"),
          sum(col("qty_n")).as("sum_skips_null"),
          sum(coalesce(col("qty_n"), lit(0.0)) + lit(0) * col("qty_n"))
            .as("sum_null_prop"))
        .orderBy(col("l_returnflag")),
    oracle = Some("""
      SELECT l_returnflag,
        CAST(sum(CASE WHEN nullif(l_quantity, 1.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        CAST(sum(CASE WHEN nullif(l_quantity, 1.0) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_notnull,
        count(nullif(l_quantity, 1.0)) AS cnt_skips_null,
        sum(nullif(l_quantity, 1.0)) AS sum_skips_null,
        sum(coalesce(nullif(l_quantity, 1.0), 0.0)
            + 0 * nullif(l_quantity, 1.0)) AS sum_null_prop
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** WHERE FALSE short-circuit (reference: TupleConstantBooleanStep,
    * dbcon/joblist/tupleconstantstep.h:137) — Catalyst folds to LocalRelation,
    * no scan is issued at all. */
  val whereFalse: QueryDef = QueryDef(
    "f_where_false",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(lit(1) === lit(0))
        .agg(count(lit(1)).as("n")),
    oracle = Some("SELECT count(*) AS n FROM lineitem WHERE 1 = 0")
  )

  /** Constant-only projection (reference: TupleConstantStep fills constant
    * output columns, tupleconstantstep.h:32). */
  val constantProjection: QueryDef = QueryDef(
    "f_constant_projection",
    (s, dir) =>
      t(s, dir, "region")
        .select(col("r_regionkey"), lit(42L).as("c_int"),
          lit("x").as("c_str"), lit(2.5).as("c_dbl"),
          (col("r_regionkey") + lit(100)).as("c_expr"))
        .orderBy(col("r_regionkey")),
    oracle = Some("""
      SELECT r_regionkey, 42 AS c_int, 'x' AS c_str, 2.5 AS c_dbl,
             r_regionkey + 100 AS c_expr
      FROM region ORDER BY r_regionkey""")
  )

  /** Cast lattice (reference: func_cast.cpp cast_as_char/date/datetime/
    * signed/unsigned/decimal). */
  val casts: QueryDef = QueryDef(
    "f_casts",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_quantity").cast("bigint").as("qty_bigint"),
          // decimal and date round-trip through double/string so both engines
          // surface the identical wire value to the byte-exact gate
          col("l_extendedprice").cast("decimal(18,2)").cast("double")
            .as("price_dec"),
          col("l_linenumber").cast("double").as("ln_dbl"),
          col("l_orderkey").cast("string").as("ok_str"),
          col("l_shipdate").cast("date").cast("string").as("ship_date"),
          concat(lit(""), col("l_linenumber")).cast("bigint").as("str_to_int"),
          col("l_linenumber").cast("smallint").as("ln_small"),
          col("l_linenumber").cast("tinyint").as("ln_tiny"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    oracle = Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS INTEGER) AS qty_int,
             CAST(l_quantity AS BIGINT) AS qty_bigint,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
             CAST(l_linenumber AS DOUBLE) AS ln_dbl,
             CAST(l_orderkey AS VARCHAR) AS ok_str,
             CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
             CAST(CAST(l_linenumber AS VARCHAR) AS BIGINT) AS str_to_int,
             CAST(l_linenumber AS SMALLINT) AS ln_small,
             CAST(l_linenumber AS TINYINT) AS ln_tiny
      FROM lineitem WHERE l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber""")
  )

  /** Column pruning + projection reuse (reference: pColStep project after
    * filter + PassThruStep, primitivestep.h:128,1269): a 2-column projection
    * of a wide table must read only those columns (asserted in PlanSpec). */
  val pruneProject: QueryDef = QueryDef(
    "f_prune_project",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
        .filter(col("l_orderkey") % 1000 === 0)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_orderkey")),
    oracle = Some("""
      SELECT l_orderkey, sum(l_extendedprice) AS sum_price
      FROM lineitem WHERE l_orderkey % 1000 = 0
      GROUP BY l_orderkey ORDER BY l_orderkey""")
  )

  /** Unsigned BIGINT boundary: the reference's UBIGINT maps to
    * DECIMAL(20,0) (SURVEY §1.3, reference:
    * dbcon/execplan/calpontsystemcatalog.h:129-158 UBIGINT) — exercise
    * values ABOVE Long.MaxValue end to end: construction, comparison
    * filtering, min/max/sum aggregation, all in exact decimal space. */
  val unsignedBigint: QueryDef = QueryDef(
    "f_unsigned_bigint",
    (s, dir) => {
      val longMax = new java.math.BigDecimal("9223372036854775807")
      val ubig = (col("o_orderkey").cast("decimal(20,0)") +
        lit(longMax).cast("decimal(20,0)")).cast("decimal(20,0)")
      t(s, dir, "orders")
        .select(ubig.as("ubig"))
        // predicate strictly above the int64 range: proves comparisons
        // don't round-trip through Long anywhere
        .filter(col("ubig") > lit(new java.math.BigDecimal(
          "9223372036854775900")).cast("decimal(20,0)"))
        // results rendered as decimal strings: exact above-int64 values
        // survive the comparison layer byte-for-byte (DuckDB's pandas
        // bridge degrades >18-digit decimals to float64)
        .agg(count(lit(1)).as("n"),
          min(col("ubig")).cast("decimal(20,0)").cast("string").as("min_ubig"),
          max(col("ubig")).cast("decimal(20,0)").cast("string").as("max_ubig"),
          sum(col("ubig")).cast("decimal(38,0)").cast("string").as("sum_ubig"))
    },
    oracle = Some("""
      WITH u AS (SELECT CAST(CAST(o_orderkey AS DECIMAL(20,0)) +
                             CAST(9223372036854775807 AS DECIMAL(20,0))
                        AS DECIMAL(20,0)) AS ubig
                 FROM orders)
      SELECT count(*) AS n,
             CAST(CAST(min(ubig) AS DECIMAL(20,0)) AS VARCHAR) AS min_ubig,
             CAST(CAST(max(ubig) AS DECIMAL(20,0)) AS VARCHAR) AS max_ubig,
             CAST(CAST(sum(ubig) AS DECIMAL(38,0)) AS VARCHAR) AS sum_ubig
      FROM u WHERE ubig > CAST(9223372036854775900 AS DECIMAL(20,0))""")
  )

  /** Collation-aware string comparison — the reference compares CHAR/
    * VARCHAR under its session collation, not binary: the dictionary scan
    * kernels call idb_strcoll (reference: primitives/linux-port/
    * dictionary.cpp:193,505) and MySQL's default latin1_swedish_ci makes
    * `WHERE seg = 'acme'` match 'ACME' and ORDER BY case-fold. Spark 4's
    * native collation surface models this: UTF8_LCASE is the ci analog
    * (exact for the ASCII corpus; latin1's non-ASCII tailoring is out of
    * scope — see COVERAGE.md). The query exercises the full ci surface
    * over a deterministically case-mixed segment column: ci equality
    * filter, ci GROUP BY (binary case variants counted inside each ci
    * class), ci-consistent ordering, plus the registered mysql_strcoll
    * shim. DuckDB oracles the filter via COLLATE NOCASE and the grouping
    * via the equivalent lower() fold. */
  val collationCi: QueryDef = QueryDef(
    "f_collation_ci",
    (s, dir) => {
      val m = t(s, dir, "customer").select(
        when(pmod(col("c_custkey"), lit(2)) === 0,
          upper(col("c_mktsegment")))
          .otherwise(lower(col("c_mktsegment"))).as("seg"))
      m.filter(collate(col("seg"), "UTF8_LCASE") =!= lit("machinery"))
        .groupBy(collate(col("seg"), "UTF8_LCASE"))
        .agg(min(col("seg")).as("seg_rep"),
          count(lit(1)).as("n"),
          countDistinct(col("seg")).as("n_case_variants"),
          max(col("seg")).as("seg_max"))
        .select(col("seg_rep"), col("n"), col("n_case_variants"),
          col("seg_max"),
          expr("mysql_strcoll(seg_rep, 'FURNITURE')")
            .as("cmp_vs_furniture"))
        .orderBy(col("seg_rep"))
    },
    oracle = Some("""
      WITH m AS (SELECT CASE WHEN c_custkey % 2 = 0
                             THEN upper(c_mktsegment)
                             ELSE lower(c_mktsegment) END AS seg
                 FROM customer),
      f AS (SELECT seg FROM m
            WHERE NOT (seg COLLATE NOCASE = 'machinery')),
      g AS (SELECT min(seg) AS seg_rep, count(*) AS n,
                   count(DISTINCT seg) AS n_case_variants,
                   max(seg) AS seg_max
            FROM f GROUP BY lower(seg))
      SELECT seg_rep, n, n_case_variants, seg_max,
             CASE WHEN lower(seg_rep) < lower('FURNITURE') THEN -1
                  WHEN lower(seg_rep) > lower('FURNITURE') THEN 1
                  ELSE 0 END AS cmp_vs_furniture
      FROM g ORDER BY seg_rep""")
  )

  /** Non-ASCII latin1_swedish_ci tailoring — the reference's DEFAULT
    * collation orders å/ä/ö as distinct letters AFTER z (the Swedish
    * alphabet tail), case-insensitively (reference:
    * primitives/linux-port/dictionary.cpp:193 idb_strcoll over the
    * latin1_swedish_ci weight table). Engine side uses Spark 4's native
    * ICU collation `sv_CI` (CLDR standard Swedish = the same å ä ö
    * tail): a collated filter, a collated GROUP BY folding case
    * variants, and the alphabet RANK materialized as a value via the
    * range-partitioned prefix-scan ORDERED BY THE COLLATED KEY — so the
    * Swedish order is checked by the oracle's values, not just row
    * order.
    *
    * The DuckDB oracle deliberately does NOT use DuckDB's `sv` ICU
    * collation (its bundled CLDR predates the 2022 change that made
    * standard Swedish the default tailoring, so it still orders ä
    * BEFORE å — the deprecated "reformed" ordering); instead it encodes
    * the latin1_swedish_ci order independently:
    * translate(lower(w), 'åäö', ...) maps the three letters to the three
    * ASCII codepoints just after 'z'. Scale shape: per-row map + |words|
    * domain aggregation; the prefix-scan runs on the 8-word domain. */
  val collationLatin1: QueryDef = QueryDef(
    "f_collation_latin1",
    (s, dir) => {
      val words = Seq("zebra", "åsna", "Ärlig", "ässja", "örn", "Öland",
        "apple", "Zebra", "ÅSNA", "banan")
      val base = t(s, dir, "nation").select(
        element_at(array(words.map(lit): _*),
          (pmod(col("n_nationkey"), lit(10)) + 1).cast("int")).as("w"))
      val cw = collate(col("w"), "sv_CI")
      val g = base
        .filter(cw =!= lit("banan")) // collated ci filter
        .groupBy(cw.as("k"))
        .agg(min(col("w")).as("word_rep"), count(lit(1)).as("n"),
          countDistinct(col("w")).as("n_case_variants"))
      graft.functions.Prefix.over(g, Seq(col("k")),
          Seq(graft.functions.Prefix.rowNumber("sw_rank")), numParts = 4)
        .select(col("word_rep"), col("n"), col("n_case_variants"),
          col("sw_rank"))
        .orderBy(col("sw_rank"))
    },
    oracle = Some("""
      WITH base AS (
        SELECT ['zebra','åsna','Ärlig','ässja','örn','Öland',
                'apple','Zebra','ÅSNA','banan'][(n_nationkey % 10) + 1]
          AS w
        FROM nation),
      g AS (SELECT translate(lower(w), 'åäö', '{|}') AS k,
              min(w) AS word_rep, count(*) AS n,
              count(DISTINCT w) AS n_case_variants
            FROM base
            WHERE translate(lower(w), 'åäö', '{|}') <> 'banan'
            GROUP BY 1)
      SELECT word_rep, n, n_case_variants,
             CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS sw_rank
      FROM g ORDER BY sw_rank""")
  )

  /** latin1_swedish_ci ACCENT folds — the last documented collation
    * residual (MIGRATION.md listed "é=e/ü=y accent folds" as not yet
    * modeled). The reference's default collation weights Latin-1
    * accented letters onto their base letters (reference:
    * primitives/linux-port/dictionary.cpp:193 idb_strcoll over the
    * latin1_swedish_ci weight table; the table itself is MySQL's
    * strings/ctype-latin1.c sort order, public knowledge): à á â ã→a,
    * ç→c, è é ê ë→e, ì í î ï→i, ñ→n, ò ó ô õ→o, ù ú û→u — while the
    * Swedish letters keep their post-z tail (å ä ö distinct), æ weighs
    * as ä, ø as ö, and the famous quirks é=e and ü=y hold ("müller"
    * groups with "myller", NOT with "muller"). The fold is one
    * codegen'd translate chain (`latin1SwedishCiKey`), usable as a
    * filter/group/sort key anywhere; this query exercises equality
    * folding, case+accent variant grouping, and the alphabet rank via
    * the partitioned prefix-scan. The oracle encodes the same weight
    * table explicitly (as with f_collation_latin1, DuckDB's bundled ICU
    * cannot express latin1_swedish_ci).
    *
    * Scale shape: per-row map + |distinct words| aggregation domain;
    * the rank prefix-scan runs on the folded-key domain. */
  def latin1SwedishCiKey(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    translate(translate(lower(c),
      "àáâãçèéêëìíîïñòóôõùúû", "aaaaceeeeiiiinoooouuu"),
      "üýÿåäöæø", "yyy{|}|}")

  val collationAccentFolds: QueryDef = QueryDef(
    "f_collation_accent_folds",
    (s, dir) => {
      val words = Seq("resume", "résumé", "RÉSUMÉ", "naïve", "naive",
        "müller", "MYLLER", "muller", "ærlig", "Ärlig", "smörgås",
        "ØRN", "örn")
      val base = t(s, dir, "customer").select(
        element_at(array(words.map(lit): _*),
          (pmod(col("c_custkey"), lit(words.size)) + 1).cast("int"))
          .as("w"))
      val k = latin1SwedishCiKey(col("w"))
      // ci+accent-fold equality filter: drops 'resume' AND its accent
      // variants, exactly as a latin1_swedish_ci WHERE w <> 'resume'
      val g = base.filter(k =!= lit("resume"))
        .groupBy(k.as("k"))
        .agg(min(col("w")).as("word_rep"), count(lit(1)).as("n"),
          countDistinct(col("w")).as("n_variants"))
      graft.functions.Prefix.over(g, Seq(col("k")),
          Seq(graft.functions.Prefix.rowNumber("sw_rank")), numParts = 4)
        .select(col("word_rep"), col("n"), col("n_variants"),
          col("sw_rank"))
        .orderBy(col("sw_rank"))
    },
    oracle = Some("""
      WITH base AS (
        SELECT ['resume','résumé','RÉSUMÉ','naïve','naive',
                'müller','MYLLER','muller','ærlig','Ärlig','smörgås',
                'ØRN','örn'][(c_custkey % 13) + 1] AS w
        FROM customer),
      f AS (SELECT w,
              translate(translate(lower(w),
                'àáâãçèéêëìíîïñòóôõùúû', 'aaaaceeeeiiiinoooouuu'),
                'üýÿåäöæø', 'yyy{|}|}') AS k
            FROM base),
      g AS (SELECT k, min(w) AS word_rep, count(*) AS n,
                   count(DISTINCT w) AS n_variants
            FROM f WHERE k <> 'resume' GROUP BY k)
      SELECT word_rep, n, n_variants,
             CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS sw_rank
      FROM g ORDER BY sw_rank""")
  )

  /** VARBINARY as a queryable table column (reference:
    * dbcon/execplan/calpontsystemcatalog.h:139 VARBINARY type; the
    * reference stores, compares, and filters binary columns). A staged
    * parquet table carries two BinaryType columns (a 16-byte digest and
    * its 1-byte prefix); the query then exercises the full surface on
    * the read-back table: byte-length predicate, binary RANGE comparison
    * against a literal blob (lexicographic unsigned — Spark BinaryType
    * and DuckDB BLOB agree), GROUP BY a binary key, and min/max over the
    * hex round-trip. Output is hex-encoded so the driver hash compares
    * strings, not engine-specific bytes reprs.
    *
    * Scale shape: per-row digest map at write, pushed length/range
    * filter at scan, |prefix| (≤ 64-row) aggregation domain. */
  val varbinary: QueryDef = QueryDef(
    "f_varbinary",
    (s, dir) => {
      val tmp = DdlDmlQueries.scratch("varbinary")
      t(s, dir, "part").select(col("p_partkey"),
          unhex(md5(col("p_name"))).as("bin"),
          unhex(substring(md5(col("p_name")), 1, 2)).as("pfx"))
        .write.mode("overwrite").parquet(s"$tmp/bt")
      val bt = s.read.parquet(s"$tmp/bt")
      bt.filter(length(col("bin")) === 16 && col("pfx") < unhex(lit("40")))
        .groupBy(col("pfx"))
        .agg(count(lit(1)).as("n"),
          min(hex(col("bin"))).as("min_hex"),
          max(hex(col("bin"))).as("max_hex"))
        .select(hex(col("pfx")).as("pfx_hex"), col("n"),
          col("min_hex"), col("max_hex"))
        .orderBy(col("pfx_hex"))
    },
    oracle = Some("""
      WITH bt AS (SELECT p_partkey, unhex(md5(p_name)) AS bin,
                         unhex(substr(md5(p_name), 1, 2)) AS pfx
                  FROM part)
      SELECT hex(pfx) AS pfx_hex, count(*) AS n,
             min(hex(bin)) AS min_hex, max(hex(bin)) AS max_hex
      FROM bt
      WHERE octet_length(bin) = 16 AND pfx < unhex('40')
      GROUP BY pfx ORDER BY pfx_hex""")
  )

  /** LIKE … ESCAPE — literal `%` / `_` matching through a user escape
    * char (MySQL surface; the dictionary scan treats the escaped char as
    * a literal byte). Wildcard-bearing strings are planted per partkey
    * class; `!` is the escape so the one SQL text runs unchanged on both
    * engines (backslash would hit Spark's string-literal escaping). */
  val likeEscape: QueryDef = {
    val q = """
      SELECT count(*) AS n_total,
        CAST(sum(CASE WHEN aug LIKE '%100!%' ESCAPE '!'
          THEN 1 ELSE 0 END) AS BIGINT) AS n_lit_pct,
        CAST(sum(CASE WHEN aug LIKE '%100!_x' ESCAPE '!'
          THEN 1 ELSE 0 END) AS BIGINT) AS n_lit_underscore,
        CAST(sum(CASE WHEN aug LIKE '%100_%' ESCAPE '!'
          THEN 1 ELSE 0 END) AS BIGINT) AS n_wild_underscore
      FROM (SELECT p_name ||
              CASE WHEN p_partkey % 7 = 0 THEN ' 100%'
                   WHEN p_partkey % 7 = 1 THEN ' 100_x'
                   ELSE '' END AS aug
            FROM part) t"""
    QueryDef("f_like_escape",
      (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) },
      oracle = Some(q))
  }

  def defs: Seq[QueryDef] = Seq(predicateMatrix, likePatterns,
    constantFilterOrChain, nullSemantics, whereFalse, constantProjection,
    casts, pruneProject, unsignedBigint, collationCi, collationLatin1,
    collationAccentFolds, varbinary, likeEscape)
}
