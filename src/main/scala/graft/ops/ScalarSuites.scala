package graft.ops

import graft.core.{Graph, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function families (SURVEY §2.7 extension): the string, datetime,
  * and array/higher-order surfaces a user of the reference's Cypher
  * functions (`toLower`, `CONTAINS`, `split`, `id()`, …) would expect a
  * replacement engine to carry. Every function here is a codegen'd native
  * expression — one projection node, no UDFs — and every column is pinned
  * to a representation both engines render identically (LONG for counts
  * and date parts, formatted strings for dates, flattened strings for
  * arrays — the oracle channel has no typed-list or date32 comparison).
  */
object ScalarSuites {

  /** String-function sweep over customer names: case mapping, slicing,
    * padding, splitting, translation, search, hashing. One codegen'd
    * projection; functions chosen for cross-engine-identical semantics
    * (1-based positions, negative-index-free). */
  def stringSuite(spark: SparkSession, sfDir: String, maxKey: Long = 50): DataFrame =
    Tables.customer(spark, sfDir)
      .filter(col("c_custkey") < maxKey)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        reverse(col("c_name")).as("rev"),
        expr("left(c_name, 8)").as("l8"),
        expr("right(c_name, 4)").as("r4"),
        lpad(col("c_custkey").cast("string"), 6, "0").as("pad6"),
        expr("split_part(c_name, '#', 2)").as("num_part"),
        translate(col("c_name"), "0C", "xY").as("tr"),
        expr("replace(c_name, 'Customer', 'Cust')").as("repl"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        length(col("c_name")).cast("long").as("len"),
        concat_ws("|", col("c_name"), upper(col("c_name"))).as("joined"),
        md5(col("c_name")).as("digest"))
      .orderBy("c_custkey")

  /** Datetime-function sweep over order dates: part extraction, arithmetic,
    * boundary snapping, differences. Date results leave as formatted
    * strings (engine-neutral — no date32-vs-timestamp hash hazard), parts
    * and diffs as LONG. Day-of-week is deliberately absent: Spark and
    * standard SQL disagree on week-start numbering, so the portable form
    * is date_format's textual day name, included instead. */
  def datetimeSuite(spark: SparkSession, sfDir: String, maxKey: Long = 200): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") < maxKey)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        date_format(col("o_orderdate"), "EEEE").as("dow_name"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("som"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("long").as("days_since"))
      .orderBy("o_orderkey")

  /** Array/higher-order sweep over per-house name lists: collect → sort →
    * slice/index/search, plus a lambda transform (the higher-order-function
    * family: `transform` runs a codegen'd expression per element — the
    * Spark-native form of Cypher's list comprehensions). Arrays leave
    * flattened to strings (a4's convention — the compare channel is
    * scalar-only). */
  def arraySuite(spark: SparkSession, sfDir: String, maxNid: Long = 25): DataFrame =
    Graph.nodes(spark, sfDir)
      .filter(col("nid") < maxNid)
      .groupBy("house")
      .agg(sort_array(collect_list(col("name"))).as("ns"),
           count(lit(1)).as("n"))
      .select(
        col("house"),
        array_join(slice(col("ns"), 1, 3), ",").as("top3"),
        col("n"),
        array_contains(col("ns"), Graph.fullName(1)).as("has_c1"),
        element_at(col("ns"), 1).as("first_name"),
        element_at(col("ns"), size(col("ns"))).as("last_name"),
        array_join(expr("transform(slice(ns, 1, 2), x -> upper(x))"), ",").as("up2"),
        size(expr("filter(ns, x -> x like '%0')")).cast("long").as("n_ending_0"))
      .orderBy("house")

  /** Aggregate-function sweep per return flag: conditional counting
    * (`count_if`), boolean reduction (`bool_and`/`bool_or` — Cypher's
    * all()/any() predicates as aggregates), exact `median`, and distinct
    * counting. All are single-pass hash aggregates with partial (map-side)
    * combine except median, which Spark evaluates as an exact percentile —
    * the one to swap for a KLL sketch at 100 TB (rq19 is that twin). */
  def aggSuite(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        count_if(col("l_quantity") > 25).as("n_bulk"),
        bool_and(col("l_quantity") > 0).as("all_positive"),
        bool_or(col("l_discount") > 0.09).as("any_deep_discount"),
        round(median(col("l_quantity")), 2).as("med_qty"),
        countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy("l_returnflag")

  /** Bitwise-function sweep over customer keys: and/or/xor, shifts,
    * popcount, and the mask/bucket idioms they serve (hash partitioning,
    * bloom-filter bit math, flag words — all bit ops at heart). Every
    * operator here is a codegen'd integral expression with identical
    * two's-complement semantics on both engines; results stay LONG. */
  def bitwiseSuite(spark: SparkSession, sfDir: String, maxKey: Long = 100): DataFrame =
    Tables.customer(spark, sfDir)
      .filter(col("c_custkey") < maxKey)
      .select(
        col("c_custkey"),
        (col("c_custkey").bitwiseAND(lit(0xFFL))).as("and_ff"),
        (col("c_custkey").bitwiseOR(lit(0x100L))).as("or_256"),
        (col("c_custkey").bitwiseXOR(lit(0x55L))).as("xor_55"),
        shiftleft(col("c_custkey"), 3).cast("long").as("shl3"),
        shiftright(col("c_custkey"), 2).cast("long").as("shr2"),
        bit_count(col("c_custkey")).cast("long").as("popcount"),
        (col("c_custkey").bitwiseAND(lit(31L))).as("bucket32"))
      .orderBy("c_custkey")

  /** Map-function sweep — the last §2.7 family (string/datetime/array/
    * bitwise/agg covered by the sibling suites): construction, key/value
    * extraction, lookup with and without a default, membership, and an
    * entries→string flattening via a higher-order lambda. Map-typed
    * columns never reach the output (the oracle channel has no canonical
    * map rendering — key order is engine-dependent); every projection
    * flattens to sorted strings or scalars first. `try_element_at` for
    * lookups: ANSI-mode `element_at` hard-errors on an absent key, the
    * map twin of the try_cast rule in `mixCorpus`. */
  def mapSuite(spark: SparkSession, sfDir: String, maxKey: Long = 40): DataFrame =
    Tables.customer(spark, sfDir)
      .filter(col("c_custkey") < maxKey)
      .withColumn("mp", map(
        lit("seg"), col("c_mktsegment"),
        lit("nat"), col("c_nationkey").cast("string"),
        lit("name"), col("c_name")))
      .select(
        col("c_custkey"),
        size(col("mp")).as("n_keys"),
        concat_ws(",", array_sort(map_keys(col("mp")))).as("keys_sorted"),
        concat_ws(",", array_sort(map_values(col("mp")))).as("vals_sorted"),
        try_element_at(col("mp"), lit("seg")).as("seg"),
        coalesce(try_element_at(col("mp"), lit("missing")), lit("none")).as("missing_dflt"),
        array_contains(map_keys(col("mp")), "nat").as("has_nat"),
        concat_ws(";", array_sort(transform(map_entries(col("mp")),
          e => concat(e.getField("key"), lit("="), e.getField("value")))))
          .as("entries_sorted"))
      .orderBy("c_custkey")

  /** Statistical-aggregate sweep per return flag: correlation, both
    * covariances, sample stddev, population skewness/kurtosis, and the
    * regr_* linear-fit family — the moment surface a feature-engineering
    * pass computes per segment. All are single-pass partial-combinable
    * aggregates (Catalyst's central-moment updates merge across
    * partitions), so one scan, one hash agg, 3 groups out. Spark's
    * skewness/kurtosis are the POPULATION formulas (m3/m2^1.5,
    * m4/m2²−3); the oracle replicates them from raw two-pass moments
    * because DuckDB's built-ins are the sample-bias-corrected variants.
    * Every output is rounded then `+0`-normalized: a true value a hair
    * below zero rounds to IEEE −0.0, which hashes differently from the
    * other engine's +0.0 — adding 0.0 collapses both to +0.0. */
  def statSuite(spark: SparkSession, sfDir: String): DataFrame = {
    def r4(c: org.apache.spark.sql.Column) = round(c, 4) + lit(0.0)
    def r2c(c: org.apache.spark.sql.Column) = round(c, 2) + lit(0.0)
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        r4(corr(col("l_extendedprice"), col("l_quantity"))).as("corr_pq"),
        r2c(covar_pop(col("l_extendedprice"), col("l_quantity"))).as("covar_pop_pq"),
        r2c(covar_samp(col("l_extendedprice"), col("l_quantity"))).as("covar_samp_pq"),
        r4(stddev_samp(col("l_quantity"))).as("stddev_qty"),
        r4(skewness(col("l_quantity"))).as("skew_qty"),
        r4(kurtosis(col("l_quantity"))).as("kurt_qty"),
        r4(regr_slope(col("l_extendedprice"), col("l_quantity"))).as("slope"),
        r4(regr_intercept(col("l_extendedprice"), col("l_quantity"))).as("intercept"),
        r4(regr_r2(col("l_extendedprice"), col("l_quantity"))).as("r2"))
      .orderBy("l_returnflag")
  }

  /** Arithmetic-semantics sweep (fn_math_suite) — the sign/modulo corners
    * a migration silently breaks on: `%` (sign of the DIVIDEND in both
    * engines) vs `pmod` (always non-negative — DuckDB has no pmod, the
    * oracle replays ((k%m)+m)%m), floor/ceil on NEGATIVE doubles (toward
    * −∞ / +∞, not toward zero), abs/sign, greatest/least over mixed
    * expressions, factorial as exact BIGINT, and the two
    * cross-engine-safe float channels (sqrt is IEEE-exact; powers of two
    * are exact doubles). Deliberately absent: round() on doubles (Spark
    * rounds the DECIMAL rendering, DuckDB the binary double — the
    * nullSuite note) and transcendentals (libm differs — BASELINE rule).
    * All scalar, codegen'd, one scan. */
  def mathSuite(spark: SparkSession, sfDir: String, maxKey: Long = 60): DataFrame =
    Tables.customer(spark, sfDir).filter(col("c_custkey") < maxKey)
      .selectExpr("c_custkey",
        "c_acctbal - 500.0 AS v",
        "abs(c_acctbal - 500.0) AS abs_v",
        "CAST(sign(c_acctbal - 500.0) AS BIGINT) AS sign_v",
        "CAST(c_custkey % 7 AS BIGINT) - 3 AS k",
        "CAST((CAST(c_custkey % 7 AS BIGINT) - 3) % 5 AS BIGINT) AS mod_k",
        "pmod(CAST(c_custkey % 7 AS BIGINT) - 3, 5) AS pmod_k",
        "greatest(c_custkey % 10, c_custkey % 7, 3) AS g3",
        "least(c_custkey % 10, c_custkey % 7, 3) AS l3",
        "CAST(floor(c_acctbal - 500.0) AS BIGINT) AS fl",
        "CAST(ceil(c_acctbal - 500.0) AS BIGINT) AS ce",
        "sqrt(abs(c_acctbal - 500.0)) AS sq",
        "CAST(power(2.0D, c_custkey % 11) AS BIGINT) AS pow2",
        "CAST(factorial(CAST(c_custkey % 6 AS INT)) AS BIGINT) AS fact")
      .orderBy("c_custkey")

  /** Null-semantics sweep — the three-valued-logic corner every SQL engine
    * must agree on before any filter can be trusted: NULLIF / COALESCE /
    * NVL / NVL2, null-safe equality (`<=>`, including the NULL<=>NULL
    * case that ordinary `=` gets wrong), IS NULL projection, and the
    * classic divide-by-zero guard `x / NULLIF(d, 0)`. All scalar, all
    * codegen'd, one scan. */
  def nullSuite(spark: SparkSession, sfDir: String, maxKey: Long = 50): DataFrame =
    Tables.customer(spark, sfDir).filter(col("c_custkey") < maxKey)
      .selectExpr("c_custkey",
        "nullif(c_mktsegment, 'BUILDING') AS seg_or_null",
        "coalesce(nullif(c_mktsegment, 'BUILDING'), 'was_building') AS seg_coalesced",
        "nvl(nullif(c_mktsegment, 'BUILDING'), 'nvl_default') AS seg_nvl",
        "nvl2(nullif(c_mktsegment, 'BUILDING'), 'other', 'building') AS seg_nvl2",
        "c_mktsegment <=> 'BUILDING' AS is_building_nullsafe",
        "CAST(NULL AS STRING) <=> CAST(NULL AS STRING) AS null_eq_null",
        "isnull(nullif(c_mktsegment, 'BUILDING')) AS seg_is_null",
        // integer cents, not round(double/…): a .xx5 quotient rounds by the
        // DECIMAL RENDERING in Spark but by the binary double in DuckDB —
        // floor-dividing exact cents removes the channel entirely
        "CAST(round(c_acctbal * 100) AS BIGINT) div nullif(c_custkey % 3, 0) AS guarded_div_cents")
      .orderBy("c_custkey")

  /** Cast-semantics sweep — the conversions an ingest layer leans on,
    * pinned across engines: TRY_CAST of valid and invalid numerics
    * (failure → NULL, never an error — the PERMISSIVE-mode scalar twin),
    * invalid calendar dates rejected as NULL, integer/string round-trips,
    * and boolean rendering. Deliberately ABSENT: bare double→int casts,
    * whose truncate-vs-round semantics differ between engines (documented
    * at MultimodalOps.mediaTable) — an engine surface must steer users to
    * floor/round instead. */
  def castSuite(spark: SparkSession, sfDir: String, maxKey: Long = 50): DataFrame =
    Tables.customer(spark, sfDir).filter(col("c_custkey") < maxKey)
      .selectExpr("c_custkey",
        "try_cast(split_part(c_name, '#', 2) AS BIGINT) AS name_num",
        "try_cast(c_mktsegment AS BIGINT) AS seg_as_num",
        "CAST(c_custkey AS STRING) AS key_str",
        "try_cast('2024-02-30' AS DATE) IS NULL AS bad_date_is_null",
        "CAST(try_cast('2024-03-05' AS DATE) AS STRING) AS good_date",
        "date_format(CAST(try_cast('2024-03-05' AS DATE) AS TIMESTAMP), 'yyyy-MM-dd HH:mm:ss') AS date_ts",
        "CAST(c_custkey % 2 = 0 AS STRING) AS even_str",
        "try_cast(concat('1', CAST(c_custkey AS STRING)) AS BIGINT) AS prefixed_num")
      .orderBy("c_custkey")

  /** JSON-function sweep (fn_json_suite) — the document-column surface
    * beyond rq11's flat property pull: nested-path extraction, array
    * indexing and length, a from_json round-trip consistency boolean
    * (schema-bound struct field must equal the string-path extraction),
    * and to_json's EXACT rendering (the oracle rebuilds the rendered
    * text by string concatenation, so Spark's field order and compact
    * formatting are certified byte-for-byte, not assumed). Input JSON is
    * assembled from table columns — same trick as the URL suite. */
  def jsonSuite(spark: SparkSession, sfDir: String, maxKey: Long = 50): DataFrame =
    Tables.customer(spark, sfDir).filter(col("c_custkey") < maxKey)
      .selectExpr("c_custkey", "c_mktsegment",
        "concat('{\"user\": {\"id\": ', CAST(c_custkey AS STRING), " +
          "', \"name\": \"', c_name, '\"}, \"tags\": [\"x\", \"', " +
          "c_mktsegment, '\", \"z\"], \"n\": ', CAST(c_nationkey AS STRING), '}') AS jdoc")
      .selectExpr("c_custkey", "jdoc",
        "CAST(get_json_object(jdoc, '$.user.id') AS BIGINT) AS uid",
        "get_json_object(jdoc, '$.user.name') AS uname",
        "get_json_object(jdoc, '$.tags[1]') AS tag1",
        "json_array_length(get_json_object(jdoc, '$.tags')) AS ntags",
        "from_json(jdoc, 'user STRUCT<id: BIGINT, name: STRING>, tags ARRAY<STRING>, n BIGINT').user.id " +
          "= CAST(get_json_object(jdoc, '$.user.id') AS BIGINT) AS from_json_consistent",
        "to_json(struct(c_custkey AS id, c_mktsegment AS seg)) AS rendered")
      .orderBy("c_custkey")

  /** URL-parsing sweep (fn_url_suite) — `parse_url` over URLs assembled
    * from table columns (scheme/host/path/query/single-parameter
    * extraction, the log-sessionization staples). Spark's parse_url is a
    * real Catalyst expression (codegen'd, java.net.URI semantics); the
    * oracle replays each part with anchored regexes, so the suite also
    * documents the exact equivalences a migration needs. */
  def urlSuite(spark: SparkSession, sfDir: String, maxDocId: Long = 50): DataFrame =
    graft.core.Tables.documents(spark, sfDir).filter(col("doc_id") < maxDocId)
      .selectExpr("doc_id",
        "concat('https://', source, '.example.org/docs/', CAST(doc_id AS STRING), " +
          "'?lang=', lang, '&v=', CAST(doc_id % 7 AS STRING)) AS url")
      .selectExpr("doc_id", "url",
        "parse_url(url, 'PROTOCOL') AS proto",
        "parse_url(url, 'HOST') AS host",
        "parse_url(url, 'PATH') AS path",
        "parse_url(url, 'QUERY') AS query",
        "parse_url(url, 'QUERY', 'lang') AS lang_param",
        "parse_url(url, 'QUERY', 'v') AS v_param",
        "parse_url(url, 'QUERY', 'absent') AS missing_param")
      .orderBy("doc_id")

  /** Higher-order-function sweep (fn_hof_suite) — the lambda family the
    * array suite only samples (its transform/filter): `aggregate` as a
    * genuine sequential FOLD with an explicit zero (the accumulator hash
    * (acc·31 + x) mod p is order-sensitive, so this certifies fold ORDER,
    * not just totals — inexpressible as any commutative list_sum),
    * `exists` / `forall` quantifiers, and `zip_with` pairing an array
    * with its own reverse. Arrays are per-order sorted quantity lists
    * (floored to BIGINT before any fold — the double→int cast rule);
    * every lambda runs as a codegen'd expression per element, the
    * Spark-native form of Cypher's reduce()/any()/all() list predicates.
    * The oracle replays the fold with list_reduce over a zero-prepended
    * list and the quantifiers as filtered-length tests. */
  def hofSuite(spark: SparkSession, sfDir: String, maxKey: Long = 60): DataFrame =
    Tables.lineitem(spark, sfDir).filter(col("l_orderkey") < maxKey)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(floor(col("l_quantity")).cast("long"))).as("qs"))
      .selectExpr("l_orderkey",
        "CAST(size(qs) AS BIGINT) AS n_items",
        "aggregate(qs, 0L, (acc, x) -> acc + x) AS fold_sum",
        "aggregate(qs, 7L, (acc, x) -> (acc * 31 + x) % 1000003) AS fold_hash",
        "exists(qs, x -> x > 45) AS has_bulk",
        "forall(qs, x -> x > 0) AS all_positive",
        "array_join(transform(zip_with(qs, reverse(qs), (a, b) -> a + b), " +
          "x -> CAST(x AS STRING)), ',') AS palindrome_sums")
      .orderBy("l_orderkey")
}
