package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Num, QueryPack, Tables}
import graft.functions.Holidays

/** Scalar functions (SURVEY §2.7 F1–F6 + JSON extension surface). */
object FunctionsPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: string functions — concat, lower, trim/ltrim, replace
    // (glue.py:85,131-132; webscrapping.py:49 `.replace(".SA","")`).
    "f1_strings" -> ((s, dir) =>
      Tables.part(s, dir)
        .withColumn("name_norm", lower(trim(col("p_name"))))
        .withColumn("brand_num", regexp_replace(col("p_brand"), "Brand#", ""))
        .withColumn("label",
          concat(col("p_type"), lit("-"), col("p_brand")))
        .withColumn("no_prefix", ltrim(col("p_name")))
        .select("p_partkey", "name_norm", "brand_num", "label", "no_prefix")),

    // F2: date/time functions — dayofweek/month/year, date_format,
    // date_sub, cast→date (glue.py:86,174; s3.py:73-75). Convention:
    // Spark dayofweek 1=Sunday (documented per SURVEY F2 caveat); DuckDB
    // dow 0=Sunday, so the oracle shifts by +1.
    "f2_dates" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("d", col("o_orderdate").cast("date"))
        .withColumn("dow", dayofweek(col("d")))
        .withColumn("mon", month(col("d")))
        .withColumn("yr", year(col("d")))
        .withColumn("ymd", date_format(col("d"), "yyyy-MM-dd"))
        .withColumn("d_minus_7", date_sub(col("d"), 7))
        .select("o_orderkey", "d", "dow", "mon", "yr", "ymd", "d_minus_7")),

    // F3: math + cyclic encodings (glue.py:175-178).
    "f3_math_cyclic" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("qmod", pmod(col("l_quantity").cast("int"), lit(5)))
        .withColumn("q_sin", Num.r6(sin(lit(2.0 * math.Pi) * col("qmod") / 5)))
        .withColumn("q_cos", Num.r6(cos(lit(2.0 * math.Pi) * col("qmod") / 5)))
        .withColumn("lq", Num.r6(log(col("l_extendedprice"))))
        .withColumn("sq", Num.r6(sqrt(col("l_quantity"))))
        .withColumn("ab", abs(col("l_discount") - 0.05))
        .select("l_orderkey", "l_linenumber", "qmod", "q_sin", "q_cos",
          "lq", "sq", "ab")),

    // F4: null handling — na.fill constant on a subset + na.fill map
    // (glue.py:202-214).
    "f4_null_fill" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("v", when(pmod(col("event_id"), lit(7)) === 0, lit(null))
          .otherwise(col("value")))
        .withColumn("t", when(pmod(col("event_id"), lit(11)) === 0, lit(null))
          .otherwise(col("event_type")))
        .na.fill(0.0, Seq("v"))
        .na.fill(Map("t" -> "unknown"))
        .select("event_id", "v", "t")),

    // F5: casts — int widening, long→string (exact), string→double via
    // extraction, timestamp→date (glue.py:86,131).
    "f5_casts" -> ((s, dir) =>
      Tables.customer(s, dir)
        .withColumn("key_str", col("c_custkey").cast("string"))
        .withColumn("nk_long", col("c_nationkey").cast("long"))
        .withColumn("bal_from_str",
          regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long"))
        .select("c_custkey", "key_str", "nk_long", "bal_from_str")),

    // F6: holiday-calendar flag — broadcast Set[LocalDate] + isin
    // (preprocessing.py:186-189 `date in holidays.BR()`).
    "f6_holiday_flag" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("d", col("o_orderdate").cast("date"))
        .withColumn("is_holiday", Holidays.isHoliday(col("d")).cast("int"))
        .select("o_orderkey", "d", "is_holiday")),

    // JSON extension surface (events.props; SURVEY §2.7 note): extract a
    // typed field from the JSON payload.
    "f7_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .select("event_id", "k")),

    // Schema-on-read JSON → struct column + dot access (nested type
    // surface the reference never used but the engine exposes).
    "f8_from_json" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("p", from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))))
        .select(col("event_id"), col("p.k").as("k"),
          (col("p.k") * 2).as("k2"))),

    // Spark 4 VARIANT: parse the JSON payload once into the binary
    // semi-structured type, then typed-path extraction (variant_get) and
    // the try_ missing-path form — the open-schema column a lakehouse
    // keeps when event payloads evolve. Unlike f7's per-path string
    // re-parse, the VARIANT is decoded once and each extraction is a
    // binary path walk. Outputs are plain typed columns, so the frame
    // hash-matches the oracle's JSON-function extraction.
    "f11_variant" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k"),
          expr("try_variant_get(v, '$.absent', 'string')").as("absent"),
          expr("CAST(is_variant_null(variant_get(v, '$.k')) AS BOOLEAN)")
            .as("k_is_null"))),

    // Higher-order array functions (transform/filter/aggregate) — the
    // codegen-friendly per-row collection surface; everything casts to
    // BIGINT so both engines agree on integer width.
    "f9_hof_array" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("ws", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"),
          expr("CAST(aggregate(transform(ws, w -> length(w)), 0, (a, x) -> a + x) AS BIGINT)")
            .as("total_chars"),
          expr("CAST(size(filter(ws, w -> length(w) > 4)) AS BIGINT)")
            .as("n_long_words"),
          expr("CAST(array_max(transform(ws, w -> length(w))) AS BIGINT)")
            .as("max_word_len"))),

    // Regexp family. Patterns stay in the RE2-compatible subset (simple
    // classes, no lookaround/backrefs) so Java regex and DuckDB RE2 agree.
    "f10_regexp" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          regexp_replace(trim(col("text")), "\\s+", "_").as("snake"),
          regexp_extract(col("text"), "([a-z]+)", 1).as("first_lower_run"),
          length(regexp_replace(col("text"), "[aeiou]", "")).cast("long")
            .as("n_non_vowels")))
  )

  def oracleSql: Map[String, String] = Map(
    "f11_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CAST(NULL AS VARCHAR) AS absent,
        |  json_extract(props, '$.k') = 'null' AS k_is_null
        |FROM events""".stripMargin,
    "f1_strings" ->
      """SELECT p_partkey,
        |  lower(trim(p_name)) AS name_norm,
        |  replace(p_brand, 'Brand#', '') AS brand_num,
        |  p_type || '-' || p_brand AS label,
        |  ltrim(p_name) AS no_prefix
        |FROM part""".stripMargin,
    "f2_dates" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  (dayofweek(CAST(o_orderdate AS DATE)) + 1) AS dow,
        |  month(CAST(o_orderdate AS DATE)) AS mon,
        |  year(CAST(o_orderdate AS DATE)) AS yr,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ymd,
        |  CAST(o_orderdate AS DATE) - 7 AS d_minus_7
        |FROM orders""".stripMargin,
    "f3_math_cyclic" ->
      """SELECT l_orderkey, l_linenumber,
        |  ((CAST(l_quantity AS INT) % 5) + 5) % 5 AS qmod,
        |  floor((sin(2*pi() * (((CAST(l_quantity AS INT) % 5) + 5) % 5) / 5)) * 1000000 + 0.5) / 1000000 AS q_sin,
        |  floor((cos(2*pi() * (((CAST(l_quantity AS INT) % 5) + 5) % 5) / 5)) * 1000000 + 0.5) / 1000000 AS q_cos,
        |  floor((ln(l_extendedprice)) * 1000000 + 0.5) / 1000000 AS lq,
        |  floor((sqrt(l_quantity)) * 1000000 + 0.5) / 1000000 AS sq,
        |  abs(l_discount - 0.05) AS ab
        |FROM lineitem""".stripMargin,
    "f4_null_fill" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 7 = 0 THEN 0.0 ELSE value END AS v,
        |  CASE WHEN event_id % 11 = 0 THEN 'unknown' ELSE event_type END AS t
        |FROM events""".stripMargin,
    "f5_casts" ->
      """SELECT c_custkey,
        |  CAST(c_custkey AS VARCHAR) AS key_str,
        |  CAST(c_nationkey AS BIGINT) AS nk_long,
        |  CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS bal_from_str
        |FROM customer""".stripMargin,
    "f6_holiday_flag" ->
      s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
         |  CAST(CAST(o_orderdate AS DATE) IN (${Holidays.sqlList}) AS INT)
         |    AS is_holiday
         |FROM orders""".stripMargin,
    "f7_json_extract" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k
        |FROM events""".stripMargin,
    "f8_from_json" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) * 2 AS k2
        |FROM events""".stripMargin,
    "f9_hof_array" ->
      """SELECT doc_id,
        |  CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT) AS total_chars,
        |  CAST(len(list_filter(ws, w -> len(w) > 4)) AS BIGINT) AS n_long_words,
        |  CAST(list_max(list_transform(ws, w -> len(w))) AS BIGINT) AS max_word_len
        |FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |      FROM documents)""".stripMargin,
    "f10_regexp" ->
      """SELECT doc_id,
        |  regexp_replace(trim(text), '\s+', '_', 'g') AS snake,
        |  regexp_extract(text, '([a-z]+)') AS first_lower_run,
        |  CAST(len(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
        |    AS n_non_vowels
        |FROM documents""".stripMargin
  )
}
