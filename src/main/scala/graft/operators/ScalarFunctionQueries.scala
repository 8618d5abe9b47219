package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function parity (SURVEY §2.8).
  *
  * The reference registers 118 scalar functions in FuncExp::FuncMap
  * (reference: utils/funcexp/funcexp.cpp:68-320, one file per function) and
  * evaluates them either UM-side (ExpressionStep) or pushed to the PM
  * (FuncExpWrapper). Here they are all `org.apache.spark.sql.functions`
  * built-ins — codegen'd inside WholeStageCodegen, so they run inside the
  * scan stage exactly like the reference's PM-pushed fe1/fe2 expressions.
  *
  * Functions with MySQL-only quirks (period_add/period_diff, week modes,
  * conv, get_format) live in graft.functions.MySqlFunctions.
  */
object ScalarFunctionQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** String battery 1: case, trim, pad, substring, search.
    * (reference: utils/funcexp/func_ucase.cpp, func_ltrim.cpp,
    * func_lpad.cpp, func_substr.cpp, func_instr.cpp …) */
  val stringBasic: QueryDef = QueryDef(
    "fn_string_basic",
    (s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          lower(col("c_name")).as("f_lower"),
          upper(col("c_mktsegment")).as("f_upper"),
          length(col("c_name")).as("f_length"),
          substring(col("c_name"), 10, 5).as("f_substr"),
          expr("left(c_name, 8)").as("f_left"),
          expr("right(c_name, 6)").as("f_right"),
          lpad(col("c_mktsegment"), 12, "*").as("f_lpad"),
          rpad(col("c_mktsegment"), 12, "-").as("f_rpad"),
          trim(lpad(col("c_mktsegment"), 12, " ")).as("f_trim"),
          ltrim(concat(lit("  "), col("c_mktsegment"))).as("f_ltrim"),
          rtrim(concat(col("c_mktsegment"), lit("  "))).as("f_rtrim"),
          instr(col("c_name"), "#").as("f_instr"),
          ascii(col("c_mktsegment")).as("f_ascii"),
          reverse(col("c_mktsegment")).as("f_reverse"),
          repeat(col("c_mktsegment"), 2).as("f_repeat"),
          concat(col("c_mktsegment"), lit("/"), col("c_name")).as("f_concat"),
          concat_ws("|", col("c_mktsegment"), col("c_name"), lit("z"))
            .as("f_concat_ws"),
          replace(col("c_name"), lit("Customer"), lit("Cust")).as("f_replace"))
        .orderBy(col("c_custkey")),
    oracle = Some("""
      SELECT c_custkey,
             lower(c_name) AS f_lower,
             upper(c_mktsegment) AS f_upper,
             length(c_name) AS f_length,
             substring(c_name, 10, 5) AS f_substr,
             left(c_name, 8) AS f_left,
             right(c_name, 6) AS f_right,
             lpad(c_mktsegment, 12, '*') AS f_lpad,
             rpad(c_mktsegment, 12, '-') AS f_rpad,
             trim(lpad(c_mktsegment, 12, ' ')) AS f_trim,
             ltrim(concat('  ', c_mktsegment)) AS f_ltrim,
             rtrim(concat(c_mktsegment, '  ')) AS f_rtrim,
             strpos(c_name, '#') AS f_instr,
             ascii(c_mktsegment) AS f_ascii,
             reverse(c_mktsegment) AS f_reverse,
             repeat(c_mktsegment, 2) AS f_repeat,
             concat(c_mktsegment, '/', c_name) AS f_concat,
             concat_ws('|', c_mktsegment, c_name, 'z') AS f_concat_ws,
             replace(c_name, 'Customer', 'Cust') AS f_replace
      FROM customer ORDER BY c_custkey""")
  )

  /** String battery 2: split/extract/hash family.
    * (reference: func_substring_index.cpp, func_elt.cpp, func_find_in_set.cpp,
    * func_md5.cpp, func_sha.cpp, func_char.cpp, func_strcmp.cpp) */
  val stringAdvanced: QueryDef = QueryDef(
    "fn_string_advanced",
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          substring_index(col("p_name"), " ", 1).as("f_subidx"),
          substring_index(col("p_name"), " ", -1).as("f_subidx_neg"),
          element_at(split(col("p_name"), " "), 1).as("f_split1"),
          expr("elt(1 + p_partkey % 2, 'alpha', 'beta')").as("f_elt"),
          expr("find_in_set(p_brand, 'Brand#1,Brand#2,Brand#3')")
            .as("f_find_in_set"),
          md5(col("p_name")).as("f_md5"),
          sha2(col("p_name"), 256).as("f_sha256"),
          expr("char(65 + p_partkey % 26)").as("f_char"),
          when(col("p_name") < col("p_brand"), -1)
            .when(col("p_name") === col("p_brand"), 0).otherwise(1)
            .as("f_strcmp"),
          translate(col("p_brand"), "#B", "-b").as("f_translate"),
          initcap(col("p_name")).as("f_initcap"))
        .orderBy(col("p_partkey")),
    oracle = Some("""
      SELECT p_partkey,
             split_part(p_name, ' ', 1) AS f_subidx,
             split_part(p_name, ' ', -1) AS f_subidx_neg,
             string_split(p_name, ' ')[1] AS f_split1,
             CASE WHEN 1 + p_partkey % 2 = 1 THEN 'alpha' ELSE 'beta' END AS f_elt,
             CASE WHEN p_brand = 'Brand#1' THEN 1
                  WHEN p_brand = 'Brand#2' THEN 2
                  WHEN p_brand = 'Brand#3' THEN 3 ELSE 0 END AS f_find_in_set,
             md5(p_name) AS f_md5,
             sha256(p_name) AS f_sha256,
             chr(CAST(65 + p_partkey % 26 AS INTEGER)) AS f_char,
             CASE WHEN p_name < p_brand THEN -1
                  WHEN p_name = p_brand THEN 0 ELSE 1 END AS f_strcmp,
             replace(replace(p_brand, '#', '-'), 'B', 'b') AS f_translate,
             array_to_string(list_transform(string_split(p_name, ' '),
               w -> concat(upper(w[1]), w[2:])), ' ') AS f_initcap
      FROM part ORDER BY p_partkey""")
  )

  /** Math battery (reference: func_math.cpp, func_round.cpp, func_mod.cpp;
    * bitshift/bitand func_bitwise.cpp). */
  val mathBattery: QueryDef = QueryDef(
    "fn_math",
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          abs(col("p_retailprice") * -1).as("f_abs"),
          ceil(col("p_retailprice")).as("f_ceil"),
          floor(col("p_retailprice")).as("f_floor"),
          round(col("p_retailprice"), 1).as("f_round1"),
          round(col("p_retailprice"), -1).as("f_round_neg"),
          signum(col("p_retailprice") - 1000).as("f_sign"),
          sqrt(col("p_retailprice")).as("f_sqrt"),
          // transcendentals differ from DuckDB's libm in the last ulp;
          // round both sides so the byte-exact gate is deterministic
          round(exp(col("p_size") / lit(25.0)), 6).as("f_exp"),
          round(log(col("p_retailprice")), 6).as("f_ln"),
          round(log10(col("p_retailprice")), 6).as("f_log10"),
          round(log2(col("p_retailprice")), 6).as("f_log2"),
          pow(col("p_size"), 2).as("f_pow"),
          expr("mod(p_partkey, 7)").as("f_mod"),
          radians(col("p_size")).as("f_radians"),
          degrees(col("p_size") / lit(10.0)).as("f_degrees"),
          sin(col("p_size")).as("f_sin"),
          cos(col("p_size")).as("f_cos"),
          atan2(col("p_size"), lit(2.0)).as("f_atan2"),
          (floor(col("p_retailprice") * 100) / 100).as("f_truncate2"),
          shiftleft(col("p_partkey"), 3).as("f_lshift"),
          shiftright(col("p_partkey"), 1).as("f_rshift"),
          col("p_partkey").bitwiseAND(255).as("f_bitand"),
          col("p_partkey").bitwiseOR(16).as("f_bitor"),
          col("p_partkey").bitwiseXOR(85).as("f_bitxor"),
          greatest(col("p_size"), lit(25), col("p_partkey") % 50)
            .as("f_greatest"),
          least(col("p_size"), lit(25), col("p_partkey") % 50).as("f_least"))
        .orderBy(col("p_partkey")),
    oracle = Some("""
      SELECT p_partkey,
             abs(p_retailprice * -1) AS f_abs,
             CAST(ceil(p_retailprice) AS BIGINT) AS f_ceil,
             CAST(floor(p_retailprice) AS BIGINT) AS f_floor,
             round(p_retailprice, 1) AS f_round1,
             round(p_retailprice, -1) AS f_round_neg,
             CAST(CASE WHEN p_retailprice - 1000 > 0 THEN 1.0
                  WHEN p_retailprice - 1000 < 0 THEN -1.0 ELSE 0.0 END
                  AS DOUBLE) AS f_sign,
             sqrt(p_retailprice) AS f_sqrt,
             round(exp(p_size / 25.0), 6) AS f_exp,
             round(ln(p_retailprice), 6) AS f_ln,
             round(log10(p_retailprice), 6) AS f_log10,
             round(log2(p_retailprice), 6) AS f_log2,
             pow(p_size, 2) AS f_pow,
             mod(p_partkey, 7) AS f_mod,
             radians(p_size) AS f_radians,
             degrees(p_size / 10.0) AS f_degrees,
             sin(p_size) AS f_sin,
             cos(p_size) AS f_cos,
             atan2(p_size, 2.0) AS f_atan2,
             floor(p_retailprice * 100) / 100 AS f_truncate2,
             p_partkey << 3 AS f_lshift,
             p_partkey >> 1 AS f_rshift,
             p_partkey & 255 AS f_bitand,
             p_partkey | 16 AS f_bitor,
             xor(p_partkey, 85) AS f_bitxor,
             greatest(p_size, 25, p_partkey % 50) AS f_greatest,
             least(p_size, 25, p_partkey % 50) AS f_least
      FROM part ORDER BY p_partkey""")
  )

  /** Date/time battery 1: field extraction.
    * (reference: func_year.cpp … func_weekofyear.cpp, func_extract.cpp) */
  val dateExtract: QueryDef = QueryDef(
    "fn_date_extract",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("f_year"),
          month(col("o_orderdate")).as("f_month"),
          dayofmonth(col("o_orderdate")).as("f_day"),
          dayofweek(col("o_orderdate")).as("f_dayofweek"),
          dayofyear(col("o_orderdate")).as("f_dayofyear"),
          weekofyear(col("o_orderdate")).as("f_weekofyear"),
          quarter(col("o_orderdate")).as("f_quarter"),
          hour(col("o_orderdate")).as("f_hour"),
          minute(col("o_orderdate")).as("f_minute"),
          second(col("o_orderdate")).as("f_second"),
          expr("extract(YEAR FROM o_orderdate)").as("f_extract_year"))
        .orderBy(col("o_orderkey")),
    oracle = Some("""
      SELECT o_orderkey,
             year(o_orderdate) AS f_year,
             month(o_orderdate) AS f_month,
             day(o_orderdate) AS f_day,
             CAST(date_part('dow', o_orderdate) + 1 AS BIGINT) AS f_dayofweek,
             CAST(date_part('doy', o_orderdate) AS BIGINT) AS f_dayofyear,
             CAST(date_part('week', o_orderdate) AS BIGINT) AS f_weekofyear,
             quarter(o_orderdate) AS f_quarter,
             hour(o_orderdate) AS f_hour,
             minute(o_orderdate) AS f_minute,
             second(o_orderdate) AS f_second,
             extract(YEAR FROM o_orderdate) AS f_extract_year
      FROM orders ORDER BY o_orderkey""")
  )

  /** Date/time battery 2: arithmetic & formatting.
    * (reference: func_date_add_interval.cpp, func_last_day.cpp,
    * func_from_unixtime.cpp, func_unix_timestamp.cpp, func_to_days.cpp) */
  val dateArith: QueryDef = QueryDef(
    "fn_date_arith",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          date_add(col("o_orderdate"), 7).as("f_date_add"),
          date_sub(col("o_orderdate"), 30).as("f_date_sub"),
          add_months(col("o_orderdate"), 3).as("f_add_months"),
          last_day(col("o_orderdate")).as("f_last_day"),
          datediff(lit("2000-01-01").cast("date"),
            col("o_orderdate").cast("date")).as("f_datediff"),
          date_trunc("month", col("o_orderdate")).as("f_trunc_month"),
          date_trunc("quarter", col("o_orderdate")).as("f_trunc_quarter"),
          unix_timestamp(col("o_orderdate").cast("timestamp"))
            .as("f_unix_ts"),
          (col("o_orderdate") + expr("INTERVAL 36 HOURS")).as("f_add_interval"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")),
            lit(1)).as("f_make_date"))
        .orderBy(col("o_orderkey")),
    oracle = Some("""
      SELECT o_orderkey,
             (o_orderdate::DATE + 7) AS f_date_add,
             (o_orderdate::DATE - 30) AS f_date_sub,
             (o_orderdate::DATE + INTERVAL 3 MONTH)::DATE AS f_add_months,
             last_day(o_orderdate) AS f_last_day,
             date_diff('day', o_orderdate::DATE, DATE '2000-01-01') AS f_datediff,
             date_trunc('month', o_orderdate) AS f_trunc_month,
             date_trunc('quarter', o_orderdate) AS f_trunc_quarter,
             CAST(epoch(o_orderdate) AS BIGINT) AS f_unix_ts,
             (o_orderdate + INTERVAL 36 HOUR) AS f_add_interval,
             make_date(CAST(year(o_orderdate) AS BIGINT),
                       CAST(month(o_orderdate) AS BIGINT), 1) AS f_make_date
      FROM orders ORDER BY o_orderkey""")
  )

  /** Control flow: CASE/IF/IFNULL/NULLIF/COALESCE + NULL-yielding division.
    * (reference: func_case.cpp, func_if.cpp, func_ifnull.cpp,
    * func_nullif.cpp, func_coalesce.cpp; MySQL x/0 → NULL which both Spark
    * (non-ANSI) and DuckDB reproduce for integer ops — double x/0 differs,
    * so the battery uses guarded division). */
  val controlFlow: QueryDef = QueryDef(
    "fn_control_flow",
    (s, dir) =>
      t(s, dir, "supplier")
        .select(
          col("s_suppkey"),
          when(col("s_acctbal") > 5000, "high")
            .when(col("s_acctbal") > 0, "mid")
            .otherwise("low").as("f_case_searched"),
          when(col("s_nationkey") % 2 === 0, "even").otherwise("odd")
            .as("f_case_simple"),
          expr("if(s_acctbal > 0, 'pos', 'neg')").as("f_if"),
          coalesce(nullif(col("s_nationkey"), lit(3)), lit(-1))
            .as("f_ifnull"),
          nullif(col("s_nationkey"), lit(5)).as("f_nullif"),
          coalesce(nullif(col("s_nationkey"), lit(0)),
            nullif(col("s_nationkey"), lit(1)), lit(99)).as("f_coalesce"),
          (col("s_acctbal") / nullif(col("s_nationkey"), lit(0)))
            .as("f_guarded_div"),
          isnull(nullif(col("s_nationkey"), lit(7))).as("f_isnull"))
        .orderBy(col("s_suppkey")),
    oracle = Some("""
      SELECT s_suppkey,
             CASE WHEN s_acctbal > 5000 THEN 'high'
                  WHEN s_acctbal > 0 THEN 'mid' ELSE 'low' END AS f_case_searched,
             CASE WHEN s_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS f_case_simple,
             CASE WHEN s_acctbal > 0 THEN 'pos' ELSE 'neg' END AS f_if,
             coalesce(nullif(s_nationkey, 3), -1) AS f_ifnull,
             nullif(s_nationkey, 5) AS f_nullif,
             coalesce(nullif(s_nationkey, 0), nullif(s_nationkey, 1), 99) AS f_coalesce,
             s_acctbal / nullif(s_nationkey, 0) AS f_guarded_div,
             nullif(s_nationkey, 7) IS NULL AS f_isnull
      FROM supplier ORDER BY s_suppkey""")
  )

  /** MySQL-flavor battery 2: base conversion, hex, overlay/INSERT, locate,
    * space, inet_aton/ntoa (reference: func_conv.cpp, func_hex.cpp,
    * func_insert.cpp, func_locate.cpp, func_inet.cpp). */
  val mysqlStrings: QueryDef = QueryDef(
    "fn_string_mysql",
    (s, dir) => {
      import graft.functions.MySqlFunctions._
      val ip = concat(lit("10.0."), (col("p_partkey") % 256).cast("string"),
        lit("."), ((col("p_partkey") * 7) % 256).cast("string"))
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          conv(col("p_partkey").cast("string"), 10, 16).as("f_conv16"),
          conv(col("p_partkey").cast("string"), 10, 2).as("f_conv2"),
          hex(col("p_partkey")).as("f_hex"),
          expr("char_length(p_name)").as("f_char_length"),
          locate("e", col("p_name")).as("f_locate"),
          expr("position('a' IN p_name)").as("f_position"),
          substring(col("p_name"), 3, 4).as("f_mid"),
          overlay(col("p_name"), lit("XX"), lit(2), lit(3)).as("f_insert"),
          concat(lit("["), expr("space(3)"), lit("]")).as("f_space"),
          ip.as("ip"),
          inetAton(ip).as("f_inet_aton"),
          inetNtoa(inetAton(ip)).as("f_inet_ntoa"),
          mysqlToNumber(concat(col("p_partkey"), col("p_brand")))
            .as("f_str_to_num"))
        .orderBy(col("p_partkey"))
    },
    oracle = Some("""
      WITH b AS (SELECT p_partkey, p_name,
                        concat('10.0.', CAST(p_partkey % 256 AS VARCHAR), '.',
                               CAST((p_partkey * 7) % 256 AS VARCHAR)) AS ip
                 FROM part),
           n AS (SELECT *,
                        CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
                        + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
                        + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
                        + CAST(string_split(ip, '.')[4] AS BIGINT) AS aton
                 FROM b)
      SELECT p_partkey,
             upper(to_hex(p_partkey)) AS f_conv16,
             bin(p_partkey) AS f_conv2,
             upper(to_hex(p_partkey)) AS f_hex,
             length(p_name) AS f_char_length,
             strpos(p_name, 'e') AS f_locate,
             strpos(p_name, 'a') AS f_position,
             substring(p_name, 3, 4) AS f_mid,
             concat(p_name[1:1], 'XX', p_name[5:]) AS f_insert,
             '[   ]' AS f_space,
             ip,
             aton AS f_inet_aton,
             concat(CAST((aton // 16777216) % 256 AS VARCHAR), '.',
                    CAST((aton // 65536) % 256 AS VARCHAR), '.',
                    CAST((aton // 256) % 256 AS VARCHAR), '.',
                    CAST(aton % 256 AS VARCHAR)) AS f_inet_ntoa,
             CAST(p_partkey AS DOUBLE) AS f_str_to_num
      FROM n ORDER BY p_partkey""")
  )

  /** MySQL-flavor date battery 2: DATE_FORMAT/STR_TO_DATE via the format-
    * string translator, dayname/monthname, weekday, week mode 0, makedate,
    * microsecond (reference: func_date_format.cpp, func_str_to_date.cpp,
    * func_dayname.cpp, func_week.cpp, func_makedate.cpp). */
  val mysqlDates: QueryDef = QueryDef(
    "fn_date_mysql",
    (s, dir) => {
      import graft.functions.MySqlFunctions._
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          dateFormat(col("o_orderdate"), "%Y/%m/%d %H:%i:%s")
            .as("f_date_format"),
          dateFormat(col("o_orderdate"), "%a %b").as("f_date_format_names"),
          strToDate(dateFormat(col("o_orderdate"), "%Y*%m*%d"), "%Y*%m*%d")
            .as("f_str_to_date"),
          expr("dayname(o_orderdate)").as("f_dayname"),
          expr("monthname(o_orderdate)").as("f_monthname"),
          weekday(col("o_orderdate")).as("f_weekday"),
          weekMode0(col("o_orderdate")).as("f_week0"),
          makeDate(year(col("o_orderdate")), dayofyear(col("o_orderdate")))
            .as("f_makedate"))
        .orderBy(col("o_orderkey"))
    },
    oracle = Some("""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y/%m/%d %H:%M:%S') AS f_date_format,
             strftime(o_orderdate, '%a %b') AS f_date_format_names,
             strptime(strftime(o_orderdate, '%Y*%m*%d'), '%Y*%m*%d')
               AS f_str_to_date,
             strftime(o_orderdate, '%a') AS f_dayname,
             strftime(o_orderdate, '%b') AS f_monthname,
             CAST((date_part('dow', o_orderdate) + 6) % 7 AS BIGINT)
               AS f_weekday,
             CAST(floor((date_part('doy', o_orderdate) - 1
                    - (7 - date_part('dow', date_trunc('year', o_orderdate))) % 7)
                   / 7) + 1 AS BIGINT) AS f_week0,
             (make_date(CAST(year(o_orderdate) AS BIGINT), 1, 1)
              + CAST(date_part('doy', o_orderdate) - 1 AS INTEGER)) AS f_makedate
      FROM orders ORDER BY o_orderkey""")
  )

  /** Pseudo-columns (reference: PseudoColStep primitivestep.h:1348 —
    * idbdbroot/idbpm/idbsegment/idbextentrelativerid): Spark's equivalents
    * are input_file_name / spark_partition_id / monotonically_increasing_id.
    * Output is aggregated to stay deterministic. */
  val pseudoColumns: QueryDef = QueryDef(
    "f_pseudo_columns",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(input_file_name().as("file"),
          spark_partition_id().as("pid"),
          monotonically_increasing_id().as("mid"))
        // the raw values are engine-specific (file layout, task ids), so
        // the output is the INVARIANTS they must satisfy — each one a
        // deterministic value the DuckDB oracle can assert
        .agg(
          count(lit(1)).as("n_rows"),
          (countDistinct(col("mid")) === count(lit(1))).as("rids_unique"),
          (countDistinct(col("file")) >= 1).as("has_files"),
          min(col("file").endsWith(".parquet")).as("files_are_parquet"),
          (min(col("pid")) >= 0).as("pids_nonneg")),
    oracle = Some("""
      SELECT count(*) AS n_rows, true AS rids_unique, true AS has_files,
             true AS files_are_parquet, true AS pids_nonneg
      FROM lineitem""")
  )

  /** Time-difference battery over the microsecond-resolution events table
    * (reference: func_timestampdiff.cpp, func_timediff.cpp,
    * func_add_time.cpp, func_microsecond.cpp). */
  val timeBattery: QueryDef = QueryDef(
    "fn_time_battery",
    (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_id") < 2000)
        .select(
          col("event_id"),
          expr("timestampdiff(DAY, TIMESTAMP '2024-01-01 00:00:00', ts)")
            .as("f_tsdiff_day"),
          expr("timestampdiff(HOUR, TIMESTAMP '2024-01-01 00:00:00', ts)")
            .as("f_tsdiff_hour"),
          expr("timestampdiff(MINUTE, TIMESTAMP '2024-01-01 00:00:00', ts)")
            .as("f_tsdiff_min"),
          (unix_micros(col("ts")) -
            unix_micros(lit("2024-01-01 00:00:00").cast("timestamp")))
            .as("f_timediff_us"),
          (col("ts") + expr("INTERVAL 1 HOUR 30 MINUTES")).as("f_addtime"),
          (unix_micros(col("ts")) % 1000000L).as("f_microsecond"),
          from_unixtime(unix_micros(col("ts")).cast("double") / 1e6)
            .cast("timestamp").as("f_from_unixtime"))
        .orderBy(col("event_id")),
    oracle = Some("""
      SELECT event_id,
             -- MySQL/Spark TIMESTAMPDIFF counts FULL units (duck date_diff
             -- counts boundary crossings) — emulate with floor division
             (epoch_us(ts::TIMESTAMP)
              - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 86400000000
               AS f_tsdiff_day,
             (epoch_us(ts::TIMESTAMP)
              - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 3600000000
               AS f_tsdiff_hour,
             (epoch_us(ts::TIMESTAMP)
              - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 60000000
               AS f_tsdiff_min,
             epoch_us(ts::TIMESTAMP)
               - epoch_us(TIMESTAMP '2024-01-01 00:00:00') AS f_timediff_us,
             (ts::TIMESTAMP + INTERVAL '90 MINUTE') AS f_addtime,
             epoch_us(ts::TIMESTAMP) % 1000000 AS f_microsecond,
             make_timestamp((epoch_us(ts::TIMESTAMP) // 1000000) * 1000000)
               AS f_from_unixtime
      FROM events WHERE event_id < 2000 ORDER BY event_id""")
  )

  /** Division/modulo-by-zero → NULL (MySQL semantics the reference
    * inherits; Spark non-ANSI and DuckDB agree) + decimal arithmetic and
    * the UBIGINT range carried as DECIMAL(20,0) (SURVEY §7.3 risk:
    * reference UBIGINT exceeds LongType). */
  val divZeroDecimal: QueryDef = QueryDef(
    "fn_div_zero_decimal",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // Spark 4 runs ANSI by default (x/0 errors); the MySQL-style
          // NULL-on-zero the reference inherits is the try_* family
          expr("try_divide(l_quantity, l_linenumber - l_linenumber)")
            .as("f_div0"),
          expr("cast(try_divide(l_orderkey, 0) as bigint)").as("f_intdiv0"),
          expr("try_mod(l_orderkey, 0)").as("f_mod0"),
          expr("l_orderkey div 3").as("f_intdiv"),
          // exact decimal arithmetic under test; emit as double/string so
          // both engines hand the gate an identical wire representation
          col("l_extendedprice").cast("decimal(18,2)")
            .multiply(col("l_quantity").cast("decimal(10,2)"))
            .cast("decimal(30,4)").cast("double").as("f_dec_mul"),
          // above Long.MaxValue on purpose: UBIGINT → DECIMAL(20,0) mapping
          // (SURVEY §1.3) must survive the full unsigned range
          (lit("18446744073709551615").cast("decimal(20,0)") -
            col("l_orderkey").cast("decimal(20,0)")).cast("decimal(21,0)")
            .cast("string").as("f_ubigint_range"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    oracle = Some("""
      SELECT l_orderkey, l_linenumber,
             l_quantity / nullif(l_linenumber - l_linenumber, 0) AS f_div0,
             l_orderkey // nullif(0, 0) AS f_intdiv0,
             mod(l_orderkey, 0) AS f_mod0,
             l_orderkey // 3 AS f_intdiv,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(10,2)) AS DECIMAL(30,4))
               AS DOUBLE) AS f_dec_mul,
             CAST(CAST(CAST('18446744073709551615' AS DECIMAL(20,0))
                  - CAST(l_orderkey AS DECIMAL(20,0)) AS DECIMAL(21,0))
               AS VARCHAR) AS f_ubigint_range
      FROM lineitem WHERE l_orderkey < 200
      ORDER BY l_orderkey, l_linenumber""")
  )

  /** WEEK()/YEARWEEK() in all 8 MySQL modes via the calc_mysql_week kernel
    * (reference: utils/funcexp/func_week.cpp, func_yearweek.cpp,
    * funchelpers.h:253-345 calc_mysql_week). The oracle replicates the
    * same baseday arithmetic in SQL; mode 3 ≡ ISO week, cross-checked
    * against DuckDB's native week()/isoyear(). */
  val weekModes: QueryDef = QueryDef(
    "fn_week_modes",
    (s, dir) => {
      import graft.functions.DateFunctions.{week, yearweek}
      val d = col("o_orderdate")
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          week(d, 0).as("f_week0"), week(d, 1).as("f_week1"),
          week(d, 2).as("f_week2"), week(d, 3).as("f_week3"),
          week(d, 4).as("f_week4"), week(d, 5).as("f_week5"),
          week(d, 6).as("f_week6"), week(d, 7).as("f_week7"),
          yearweek(d, 0).as("f_yearweek0"),
          yearweek(d, 3).as("f_yearweek3"))
        .orderBy(col("o_orderkey"))
    },
    oracle = Some("""
      WITH w AS (
        SELECT o_orderkey, o_orderdate::DATE AS d,
          year(o_orderdate) AS y,
          datediff('day', DATE '1970-01-01', o_orderdate::DATE) AS jd,
          dayofweek(make_date(year(o_orderdate),1,1)) AS j1s,
          (dayofweek(make_date(year(o_orderdate),1,1)) + 6) % 7 AS j1m,
          dayofweek(make_date(year(o_orderdate)-1,1,1)) AS p1s,
          (dayofweek(make_date(year(o_orderdate)-1,1,1)) + 6) % 7 AS p1m,
          datediff('day', DATE '1970-01-01', make_date(year(o_orderdate),1,1)) AS jan1,
          datediff('day', DATE '1970-01-01', make_date(year(o_orderdate)-1,1,1)) AS pjan1,
          day(o_orderdate) AS dd, dayofweek(o_orderdate) AS ds
        FROM orders
      ), base AS (
        SELECT *,
          jan1 + CASE WHEN j1s <> 0 THEN 7 - j1s ELSE 0 END AS bs,
          jan1 + CASE WHEN j1m <> 0 THEN 7 - j1m ELSE 0 END AS bm,
          jan1 + CASE WHEN j1s <> 0 THEN 7 - j1s ELSE 0 END
               - CASE WHEN j1s BETWEEN 1 AND 3 THEN 7 ELSE 0 END AS bs3,
          jan1 + CASE WHEN j1m <> 0 THEN 7 - j1m ELSE 0 END
               - CASE WHEN j1m BETWEEN 1 AND 3 THEN 7 ELSE 0 END AS bm3,
          pjan1 + CASE WHEN p1s <> 0 THEN 7 - p1s ELSE 0 END AS pbs,
          pjan1 + CASE WHEN p1s <> 0 THEN 7 - p1s ELSE 0 END
                - CASE WHEN p1s BETWEEN 1 AND 3 THEN 7 ELSE 0 END AS pbs3,
          pjan1 + CASE WHEN p1m <> 0 THEN 7 - p1m ELSE 0 END AS pbm
        FROM w
      )
      SELECT o_orderkey,
        CAST(CASE WHEN jd >= bs THEN (jd - bs)//7 + 1 ELSE 0 END AS INTEGER) AS f_week0,
        CAST(CASE WHEN jd >= bm3 THEN (jd - bm3)//7 + 1 ELSE 0 END AS INTEGER) AS f_week1,
        CAST(CASE WHEN jd < bs THEN (jd - pbs)//7 + 1
             ELSE (jd - bs)//7 + 1 END AS INTEGER) AS f_week2,
        CAST(week(d) AS INTEGER) AS f_week3,
        CAST(CASE WHEN jd >= bs3 THEN (jd - bs3)//7 + 1 ELSE 0 END AS INTEGER) AS f_week4,
        CAST(CASE WHEN jd >= bm THEN (jd - bm)//7 + 1 ELSE 0 END AS INTEGER) AS f_week5,
        CAST(CASE WHEN jd < bs3 THEN (jd - pbs3)//7 + 1
             WHEN (jd - bs3)//7 + 1 > 52 AND ds + (32 - dd) < 4 THEN 1
             ELSE (jd - bs3)//7 + 1 END AS INTEGER) AS f_week6,
        CAST(CASE WHEN jd < bm THEN (jd - pbm)//7 + 1
             ELSE (jd - bm)//7 + 1 END AS INTEGER) AS f_week7,
        CAST(CASE WHEN jd < bs THEN (y-1)*100 + (jd - pbs)//7 + 1
             ELSE y*100 + (jd - bs)//7 + 1 END AS INTEGER) AS f_yearweek0,
        CAST(isoyear(d)*100 + week(d) AS INTEGER) AS f_yearweek3
      FROM base ORDER BY o_orderkey""")
  )

  /** Registry tail: crc32, unhex, cot, maketime, get_format — the last
    * FuncMap entries without coverage (reference: utils/funcexp/
    * func_crc32.cpp, func_unhex.cpp, funcexp.cpp cot registration,
    * func_maketime.cpp, func_get_format.cpp). crc32 of a fixed string is
    * checked against MySQL's documented value (DuckDB has no crc32);
    * per-row crc32 determinism is covered in FunctionsSpec. */
  val registryTail: QueryDef = QueryDef(
    "fn_registry_tail",
    (s, dir) => {
      import graft.functions.MySqlFunctions.{getFormat, makeTime}
      t(s, dir, "part")
        .select(col("p_partkey"),
          crc32(lit("MySQL")).as("f_crc32_const"),
          // hex → unhex → decode round-trip exercises both directions
          decode(unhex(hex(col("p_name"))), "UTF-8").as("f_unhex_rt"),
          round(expr("cot(p_partkey % 10 + 1)"), 6).as("f_cot"),
          makeTime(col("p_partkey") % 24, col("p_partkey") % 60,
            (col("p_partkey") * 7) % 60).as("f_maketime"),
          makeTime(lit(5), lit(75), lit(10)).as("f_maketime_bad_min"),
          // negative hours keep the reference's snprintf %02d behavior:
          // the sign counts toward the width, so -5 prints as '-5', and
          // hours beyond -838 saturate to the TIME range endpoint
          makeTime(lit(-5), lit(10), lit(10)).as("f_maketime_neg"),
          makeTime(lit(-900), lit(1), lit(1)).as("f_maketime_neg_sat"),
          // sha/sha1 + FORMAT(X,D) close out the §2.8 registry: sha1 against
          // the FIPS-180 test vector (DuckDB has no sha1), sha2-256 per-row
          // against DuckDB's sha256, and MySQL FORMAT's comma grouping via
          // format_number
          sha1(lit("abc")).as("f_sha1_const"),
          sha2(col("p_name"), 256).as("f_sha256"),
          format_number(col("p_retailprice") * 1000, 2).as("f_format"),
          getFormat("DATE", "USA").as("f_fmt_date_usa"),
          getFormat("DATETIME", "EUR").as("f_fmt_dt_eur"),
          getFormat("TIME", "ISO").as("f_fmt_time_iso"),
          getFormat("DATE", "INTERNAL").as("f_fmt_date_int"))
        .orderBy(col("p_partkey"))
    },
    oracle = Some("""
      SELECT p_partkey,
             CAST(3259397556 AS BIGINT) AS f_crc32_const,
             p_name AS f_unhex_rt,
             round(cot(p_partkey % 10 + 1), 6) AS f_cot,
             lpad(CAST(p_partkey % 24 AS VARCHAR), 2, '0') || ':' ||
               lpad(CAST(p_partkey % 60 AS VARCHAR), 2, '0') || ':' ||
               lpad(CAST((p_partkey * 7) % 60 AS VARCHAR), 2, '0')
               AS f_maketime,
             CAST(NULL AS VARCHAR) AS f_maketime_bad_min,
             '-5:10:10' AS f_maketime_neg,
             '-838:59:59' AS f_maketime_neg_sat,
             'a9993e364706816aba3e25717850c26c9cd0d89d' AS f_sha1_const,
             sha256(p_name) AS f_sha256,
             reverse(array_to_string(regexp_extract_all(
                 reverse(split_part(printf('%.2f', p_retailprice * 1000),
                                    '.', 1)),
                 '[0-9]{1,3}'), ','))
               || '.' ||
               split_part(printf('%.2f', p_retailprice * 1000), '.', 2)
               AS f_format,
             '%m.%d.%Y' AS f_fmt_date_usa,
             '%Y-%m-%d %H.%i.%s' AS f_fmt_dt_eur,
             '%H:%i:%s' AS f_fmt_time_iso,
             '%Y%m%d' AS f_fmt_date_int
      FROM part ORDER BY p_partkey""")
  )

  /** UDF SDK surface, driver-verifiable (SURVEY §2.11): the custom
    * Catalyst expressions registered by GraftExtensions are exercised
    * through plain SQL text — the analog of the reference's funcexp::Func
    * registration making a C++ function callable from MySQL SQL. The
    * DuckDB oracle recomputes fingerprint64 with HUGEINT wrap arithmetic
    * and popcounts it, so even the custom-hash output is hash-compared. */
  val udfSqlSurface: QueryDef = QueryDef(
    "fn_udf_sql_surface",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT doc_id,
               fingerprint64(text) AS doc_fp,
               hamming64(fingerprint64(text), 0) AS fp_bits,
               mysql_week(DATE '2008-02-20', 1) AS wk_const
        FROM documents ORDER BY doc_id""")
    },
    oracle = Some("""
      WITH raw AS (
        SELECT doc_id,
          list_reduce(
            list_prepend(0::HUGEINT,
              list_transform(range(1, octet_length(encode(text)) + 1),
                i -> CAST((strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2-1, 1)) - 1) * 16
                   + (strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2, 1)) - 1) AS HUGEINT))),
            (acc, b) -> (acc * 1000003::HUGEINT + b) % 18446744073709551616::HUGEINT) AS acc
        FROM documents
      ), signed AS (
        SELECT doc_id,
          CAST(CASE WHEN acc >= 9223372036854775808::HUGEINT
               THEN acc - 18446744073709551616::HUGEINT ELSE acc END AS BIGINT) AS doc_fp
        FROM raw
      )
      SELECT doc_id, doc_fp,
             CAST(bit_count(doc_fp) AS INTEGER) AS fp_bits,
             CAST(8 AS INTEGER) AS wk_const
      FROM signed ORDER BY doc_id""")
  )

  /** Nested-type (array/lambda) battery — parity-plus: the reference's
    * registry is scalar-only, but every training-data pipeline lives on
    * token arrays, so the array surface is first-class here. Each
    * column derives a SCALAR from array ops (distinct/sort/slice/
    * contains/position/filter/transform/aggregate/zip_with), so the
    * oracle hash stays row-sortable; set-producing ops sort before any
    * size/join so DuckDB's unspecified list_distinct order can't leak
    * into results. */
  /** JSON parse/extract battery (parity-plus; the reference's MySQL
    * predates JSON functions): a nested JSON document is constructed
    * with identical concat logic on both engines (integer/string content
    * only — float text formatting is engine-specific), then pulled apart
    * via from_json with an explicit schema and json-path extraction
    * (json_tuple is a generator in Spark and cannot nest — both id paths
    * go through scalar extraction). The oracle replays extraction with DuckDB's json_*
    * functions — values compared, never JSON text. */
  val jsonBattery: QueryDef = QueryDef(
    "fn_json_battery",
    (s, dir) =>
      Tables.table(s, dir, "orders")
        .filter(col("o_orderkey") < 200)
        .withColumn("js", concat(
          lit("{\"id\":"), col("o_orderkey"),
          lit(",\"st\":\""), col("o_orderstatus"),
          lit("\",\"arr\":["), col("o_custkey"),
          lit(","), col("o_orderkey") % 7,
          lit("],\"nested\":{\"pr\":\""), col("o_orderpriority"),
          lit("\"}}")))
        .select(
          col("o_orderkey"),
          from_json(col("js"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("st",
              org.apache.spark.sql.types.StringType)))).getField("id")
            .as("j_id"),
          get_json_object(col("js"), "$.st").as("j_st"),
          get_json_object(col("js"), "$.nested.pr").as("j_pr"),
          get_json_object(col("js"), "$.arr[0]").cast("bigint")
            .as("j_arr0"),
          expr("json_array_length(get_json_object(js, '$.arr'))")
            .as("j_arr_len"),
          get_json_object(col("js"), "$.id").cast("bigint")
            .as("j_tup_id"))
        .orderBy(col("o_orderkey")),
    oracle = Some("""
      WITH j AS (SELECT o_orderkey,
                   '{"id":' || o_orderkey || ',"st":"' || o_orderstatus ||
                   '","arr":[' || o_custkey || ',' || (o_orderkey % 7) ||
                   '],"nested":{"pr":"' || o_orderpriority || '"}}' AS js
                 FROM orders WHERE o_orderkey < 200)
      SELECT o_orderkey,
             CAST(js ->> '$.id' AS BIGINT) AS j_id,
             js ->> '$.st' AS j_st,
             js ->> '$.nested.pr' AS j_pr,
             CAST(js ->> '$.arr[0]' AS BIGINT) AS j_arr0,
             CAST(json_array_length(js, '$.arr') AS INTEGER) AS j_arr_len,
             CAST(js ->> '$.id' AS BIGINT) AS j_tup_id
      FROM j ORDER BY o_orderkey""")
  )

  val arrayNested: QueryDef = QueryDef(
    "fn_array_nested",
    (s, dir) =>
      Tables.table(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("f_size"),
          size(array_distinct(col("toks"))).as("f_n_distinct"),
          expr("concat_ws(' ', slice(sort_array(toks), 1, 3))")
            .as("f_sorted_head"),
          array_contains(col("toks"), "spark").as("f_contains"),
          expr("array_position(toks, 'spark')").as("f_position"),
          expr("size(filter(toks, t -> length(t) > 4))").as("f_n_long"),
          expr("aggregate(transform(toks, t -> length(t)), 0, " +
            "(a, x) -> a + x)").as("f_len_sum"),
          expr("aggregate(zip_with(transform(toks, t -> length(t)), " +
            "transform(reverse(toks), t -> length(t)), (x, y) -> x * y), " +
            "0, (a, v) -> a + v)").as("f_zip_dot"),
          expr("size(array_intersect(toks, array('spark', 'join', " +
            "'window', 'scan')))").as("f_n_keywords"),
          expr("element_at(toks, 1)").as("f_first"),
          expr("element_at(toks, -1)").as("f_last"),
          expr("size(flatten(array(slice(toks, 1, 2), slice(toks, 3, 2))))")
            .as("f_flat_size"),
          expr("exists(toks, t -> t = 'vector')").as("f_exists"),
          expr("forall(toks, t -> length(t) >= 1)").as("f_forall"))
        .orderBy(col("doc_id")),
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents)
      SELECT doc_id,
             len(toks) AS f_size,
             len(list_distinct(toks)) AS f_n_distinct,
             array_to_string(list_sort(toks)[1:3], ' ') AS f_sorted_head,
             list_contains(toks, 'spark') AS f_contains,
             CAST(coalesce(list_position(toks, 'spark'), 0) AS BIGINT)
               AS f_position,
             len(list_filter(toks, t -> length(t) > 4)) AS f_n_long,
             list_reduce(list_prepend(0,
               list_transform(toks, t -> CAST(length(t) AS INTEGER))),
               (a, x) -> a + x) AS f_len_sum,
             list_reduce(list_prepend(0, list_transform(
               range(1, len(toks) + 1),
               i -> CAST(length(toks[i]) * length(list_reverse(toks)[i])
                    AS INTEGER))), (a, v) -> a + v) AS f_zip_dot,
             len(list_intersect(toks,
               ['spark', 'join', 'window', 'scan'])) AS f_n_keywords,
             toks[1] AS f_first,
             toks[-1] AS f_last,
             len(flatten([toks[1:2], toks[3:4]])) AS f_flat_size,
             list_contains(toks, 'vector') AS f_exists,
             len(list_filter(toks, t -> length(t) >= 1)) = len(toks)
               AS f_forall
      FROM t ORDER BY doc_id""")
  )

  /** Regex function battery (MySQL 8 / MariaDB REGEXP surface the
    * reference's front end exposes: REGEXP/RLIKE predicate,
    * REGEXP_SUBSTR, REGEXP_REPLACE, plus Spark's regexp_count /
    * regexp_extract_all as the modern extensions). Patterns stick to the
    * POSIX-portable core — classes, quantifiers, anchors, alternation,
    * capture groups — where Java regex (Spark) and RE2-ish (DuckDB)
    * semantics coincide; DuckDB's regexp_replace needs the 'g' flag to
    * match Spark's replace-all default. All codegen'd built-ins, so the
    * whole battery rides the scan stage. */
  val regexpBattery: QueryDef = QueryDef(
    "fn_regexp_battery",
    (s, dir) =>
      Tables.table(s, dir, "part")
        .select(col("p_partkey"),
          col("p_name").rlike("^(red|blue) [a-z]+$").as("f_rlike"),
          regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)$", 2)
            .as("f_extract_noun"),
          regexp_replace(col("p_name"), "[aeiou]", "_")
            .as("f_replace_all"),
          regexp_count(col("p_name"), lit("o+")).as("f_count"),
          array_join(expr("regexp_extract_all(p_name, '[a-z]{4,}', 0)"),
            "|").as("f_extract_all"),
          regexp_extract(col("p_brand"), "#([0-9]+)", 1).cast("int")
            .as("f_brand_num"))
        .orderBy(col("p_partkey")),
    oracle = Some("""
      SELECT p_partkey,
             regexp_matches(p_name, '^(red|blue) [a-z]+$') AS f_rlike,
             regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 2)
               AS f_extract_noun,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS f_replace_all,
             CAST(len(regexp_extract_all(p_name, 'o+')) AS INT) AS f_count,
             coalesce(array_to_string(
                 regexp_extract_all(p_name, '[a-z]{4,}'), '|'), '')
               AS f_extract_all,
             CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS INT)
               AS f_brand_num
      FROM part ORDER BY p_partkey""")
  )

  /** CONVERT_TZ battery (reference: utils/funcexp/func_convert_tz.cpp) —
    * the fixed-offset form is pure interval arithmetic, replayed in the
    * oracle as ± INTERVAL; out-of-range offsets (beyond MySQL's ±13:59)
    * are NULL. Exercised over events.ts so sub-second preservation is
    * covered too. */
  val convertTzBattery: QueryDef = QueryDef(
    "fn_convert_tz",
    (s, dir) =>
      Tables.table(s, dir, "events")
        .filter(col("event_id") < 200)
        .select(col("event_id"),
          graft.functions.MySqlFunctions
            .convertTz(col("ts"), "+00:00", "+05:30").as("f_ist"),
          graft.functions.MySqlFunctions
            .convertTz(col("ts"), "+02:00", "-08:00").as("f_west10"),
          graft.functions.MySqlFunctions
            .convertTz(col("ts"), "+00:00", "+14:00").as("f_bad_offset"),
          graft.functions.MySqlFunctions
            .convertTz(col("ts"), "junk", "+01:00").as("f_bad_zone"))
        .orderBy(col("event_id")),
    oracle = Some("""
      SELECT event_id,
             ts::TIMESTAMP + INTERVAL 19800 SECOND AS f_ist,
             ts::TIMESTAMP - INTERVAL 36000 SECOND AS f_west10,
             CAST(NULL AS TIMESTAMP) AS f_bad_offset,
             CAST(NULL AS TIMESTAMP) AS f_bad_zone
      FROM events WHERE event_id < 200 ORDER BY event_id""")
  )

  def defs: Seq[QueryDef] = Seq(stringBasic, stringAdvanced, mathBattery,
    dateExtract, dateArith, controlFlow, mysqlStrings, mysqlDates,
    pseudoColumns, timeBattery, divZeroDecimal, weekModes, registryTail,
    udfSqlSurface, arrayNested, jsonBattery, regexpBattery,
    convertTzBattery)
}
