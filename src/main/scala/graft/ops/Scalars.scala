package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.Tables

/** SURVEY.md §2.H — scalar function surface (string / date / math /
  * array / map / json). All built-in codegen'd expressions, no UDFs —
  * these stay inside WholeStageCodegen at any scale.
  *
  * Cross-engine cast traps honored (see Det + tools/check.py findings):
  * DuckDB double→int CAST rounds while Spark truncates (only cast
  * integral doubles); Spark ceil/floor(double) yields BIGINT while
  * DuckDB yields DOUBLE (cast oracle side); Spark length() is INT,
  * DuckDB BIGINT (cast oracle side).
  */
object Scalars extends OpModule {

  def strFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "part")
      .select(
        $"p_partkey",
        lower($"p_name").as("name_lc"),
        upper($"p_brand").as("brand_uc"),
        substring($"p_type", 1, 4).as("type4"),
        concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
        length($"p_name").as("name_len"),
        regexp_replace($"p_name", " ", "_").as("name_us"),
        lpad($"p_brand", 10, "*").as("brand_pad"),
        $"p_name".like("%widget%").as("has_widget"))
      .orderBy($"p_partkey")
  }

  def strRegexpSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "part")
      .select(
        $"p_partkey",
        regexp_extract($"p_brand", "([0-9]+)", 1).as("brand_num"),
        element_at(split($"p_name", " "), 1).as("first_word"))
      .orderBy($"p_partkey")
  }

  def dateFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        date_trunc("month", $"o_orderdate").cast("date").as("month_start"),
        datediff(lit("1998-01-01").cast("date"), $"o_orderdate".cast("date"))
          .as("days_to_98"),
        add_months($"o_orderdate", 3).as("plus3m"),
        last_day($"o_orderdate").as("month_end"))
      .orderBy($"o_orderkey")
  }

  def mathFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .select(
        $"l_orderkey", $"l_linenumber",
        round(sqrt($"l_extendedprice"), 4).as("sqrt_price"),
        round(log($"l_extendedprice"), 4).as("ln_price"),
        round(pow($"l_discount" + 1d, 2d), 4).as("pow_disc"),
        abs($"l_quantity" - 25d).as("abs_qty"),
        ceil($"l_discount" * 100d).as("ceil_disc"),
        floor($"l_tax" * 100d).as("floor_tax"),
        ($"l_quantity".cast(LongType) % 7L).as("qty_mod7"))
      .orderBy($"l_orderkey", $"l_linenumber", $"sqrt_price", $"ln_price",
        $"pow_disc", $"abs_qty", $"ceil_disc", $"floor_tax", $"qty_mod7")
  }

  /** Calendar-part extraction. DuckDB's dayofweek is 0-based
    * (Sunday=0) where Spark's is 1-based — the oracle shifts. */
  def dateParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .select(
        $"o_orderkey",
        dayofweek($"o_orderdate").as("dow"),
        weekofyear($"o_orderdate").as("week"),
        quarter($"o_orderdate").as("qtr"),
        dayofyear($"o_orderdate").as("doy"))
      .orderBy($"o_orderkey")
  }

  def strMore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "part")
      .select(
        $"p_partkey",
        reverse($"p_name").as("rev_name"),
        repeat($"p_brand", 2).as("brand_x2"),
        ascii($"p_name").as("first_ascii"),
        instr($"p_name", "e").as("e_pos"),
        substring($"p_name", 1, 3).as("l3"),
        expr("right(p_name, 3)").as("r3"),
        translate($"p_name", "aeiou", "AEIOU").as("vowels_uc"))
      .orderBy($"p_partkey")
  }

  /** Fuzzy string matching — the edit-distance surface entity
    * resolution / fuzzy dedup builds on. Exact integer distances,
    * engine-portable. */
  def strFuzzy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w1 = element_at(split($"p_name", " "), 1)
    Tables.t(s, dir, "part")
      .select(
        $"p_partkey",
        w1.as("w1"),
        levenshtein(w1, lit("widget")).as("lev_widget"),
        levenshtein($"p_brand", $"p_type").as("lev_brand_type"))
      .orderBy($"p_partkey")
  }

  /** Per-row array set algebra (union/intersect/except) between the
    * name-word and type-word sets. Engine order semantics differ
    * (Spark keeps first-seen order, DuckDB concat order), so results
    * are SORTED then serialized — set-equal ⇒ string-equal. */
  def arraySetops(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = array_distinct(split($"p_name", " "))
    val b = array_distinct(split($"p_type", " "))
    def ser(c: org.apache.spark.sql.Column) = array_join(array_sort(c), ",")
    Tables.t(s, dir, "part")
      .select(
        $"p_partkey",
        ser(array_union(a, b)).as("u"),
        ser(array_intersect(a, b)).as("i"),
        ser(array_except(a, b)).as("d"),
        size(array_intersect(a, b)).as("n_common"))
      .orderBy($"p_partkey")
  }

  /** Array function surface. The sliced head is emitted as scalar
    * element extracts (exact floats, engine-portable) rather than an
    * array column: the driver's pandas comparator cannot hash
    * array-typed columns (round-1 FAIL), and serializing floats to
    * text would reopen the float-formatting trap — element floats
    * round-trip parquet exactly on both sides. */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val head4 = slice($"embedding", 1, 4)
    Tables.t(s, dir, "embeddings")
      .select(
        $"vec_id",
        size($"embedding").as("dim"),
        element_at($"embedding", 1).as("first_val"),
        element_at(head4, 2).as("head4_2"),
        element_at(head4, 4).as("head4_4"),
        element_at(reverse(head4), 1).as("head4_last"),
        array_contains(
          transform($"embedding",
            x => floor(x.cast("double") * 10d).cast(IntegerType)),
          lit(3)).as("has_bucket3"))
      .orderBy($"vec_id")
  }

  def arrayHof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // L2 norm via higher-order fold. Both engines fold the 64 squares
    // left-to-right in array order (Spark `aggregate` with 0.0 init;
    // DuckDB `list_reduce` starting at element 1 — identical sequence
    // since 0.0 + x1 == x1 exactly), so the double sum is bit-identical.
    Tables.t(s, dir, "embeddings")
      .select(
        $"vec_id",
        round(sqrt(aggregate(
          transform($"embedding",
            x => x.cast("double") * x.cast("double")),
          lit(0.0),
          (acc, x) => acc + x)), 4).as("l2_norm"))
      .orderBy($"vec_id")
  }

  def mapFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = from_json($"props",
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, IntegerType))
    Tables.t(s, dir, "events")
      .select(
        $"event_id",
        element_at(m, "k").as("k_val"),
        size(m).as("n_keys"),
        // try_: ANSI element_at on an out-of-range ARRAY index throws;
        // an empty props map must yield NULL like the oracle's
        // json_keys[1], not kill the query (map-key lookups already
        // NULL on miss — only the array index needs the guard)
        try_element_at(map_keys(m), lit(1)).as("first_key"))
      .orderBy($"event_id")
  }

  def jsonNested(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // struct → to_json → re-extract roundtrip; only the extracted values
    // are emitted (JSON text formatting is engine-specific), so the
    // oracle is the identity projection.
    val j = to_json(struct($"user_id".as("user"), $"event_type".as("etype")))
    Tables.t(s, dir, "events")
      .select(
        $"event_id",
        get_json_object(j, "$.user").cast(LongType).as("rt_user"),
        get_json_object(j, "$.etype").as("rt_etype"))
      .orderBy($"event_id")
  }

  /** Spark 4 COLLATION surface — case-insensitive comparison as a
    * COLUMN PROPERTY instead of scattered lower() calls: the segment
    * string is collated UTF8_LCASE and grouped directly; the oracle
    * expresses the same semantics with explicit lower(). Mixed-case
    * inputs are synthesized deterministically (odd custkeys lowercase
    * their segment) so the op proves the collation actually merges
    * case variants — on clean input the two group-bys would be
    * trivially equal.
    *
    * Scale shape: stateless projection + combinable aggregate; the
    * collation comparison is codegen'd, no normalization
    * materializes. */
  def strCollation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "customer")
      .select($"c_custkey",
        when($"c_custkey" % 2 === 1, lower($"c_mktsegment"))
          .otherwise($"c_mktsegment").as("seg_mixed"))
      .select($"c_custkey",
        expr("collate(seg_mixed, 'UTF8_LCASE')").as("seg_ci"))
      .groupBy($"seg_ci")
      .agg(count(lit(1)).as("n"))
      .select(upper($"seg_ci").as("segment"), $"n")
      .orderBy($"segment")
  }

  /** XML ingestion surface — `from_xml` as the third semi-structured
    * reader beside JSON (`q_source_json_col`) and VARIANT
    * (`q_json_variant`): a deterministic XML payload is synthesized
    * from the row (the corpus ships none), round-tripped through
    * `from_xml` with a declared schema, and aggregated. The oracle
    * recomputes the extracted values directly — proving the XML path
    * is lossless, which is exactly what an ingestion round-trip test
    * should pin. */
  def sourceXmlCol(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .select($"o_orderkey", concat(lit("<o><k>"), $"o_orderkey",
        lit("</k><p>"), $"o_orderpriority", lit("</p></o>")).as("xml"))
      .select(expr(
        "from_xml(xml, 'k BIGINT, p STRING')").as("r"))
      .groupBy($"r.p".as("priority"))
      .agg(count(lit(1)).as("n"), sum($"r.k").as("key_sum"))
      .orderBy($"priority")
  }

  /** Spark 4 VARIANT surface — semi-structured data as the OPEN type
    * the lakehouse world standardized on: `parse_json` shreds the
    * props string once into the binary variant encoding, and typed
    * access is `variant_get(v, '$.k', 'int')` — schema-on-read without
    * a declared struct, the drop-in for evolving telemetry payloads
    * (`q_json_nested`'s `from_json` twin for when the schema is NOT
    * known up front). Aggregated per event type so the oracle is
    * bounded; k extraction is exact integer.
    *
    * Scale shape: stateless parse + extract (codegen'd), one
    * combinable aggregate. The variant binary never shuffles — only
    * the extracted int does. */
  def jsonVariant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "events")
      .select($"event_type",
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .groupBy($"event_type")
      .agg(count($"k").as("n_with_k"), min($"k").as("min_k"),
        max($"k").as("max_k"), sum($"k".cast("long")).as("sum_k"))
      .orderBy($"event_type")
  }

  /** Correlated LATERAL subquery — the "top-N related rows per outer
    * row" SQL surface (Spark 4 lateral correlated subqueries ↔
    * DuckDB LATERAL): each of the 5 largest customers by balance
    * pulls its own 2 most recent orders via a correlated ordered
    * LIMIT. The planner decorrelates this into a ranked join — the
    * declarative form of `q_topk_per_group` when the driving side is
    * itself a query. */
  def joinLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "customer").createOrReplaceTempView("cust_lat")
    Tables.t(s, dir, "orders").createOrReplaceTempView("orders_lat")
    s.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_orderdate
        |FROM (SELECT c_custkey FROM cust_lat
        |      ORDER BY c_acctbal DESC, c_custkey LIMIT 5) c,
        |LATERAL (SELECT o_orderkey, o_orderdate FROM orders_lat
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_orderdate DESC, o.o_orderkey DESC""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q_json_variant" -> (jsonVariant _),
    "q_join_lateral" -> (joinLateral _),
    "q_str_collation" -> (strCollation _),
    "q_source_xml_col" -> (sourceXmlCol _),
    "q_str_funcs" -> (strFuncs _),
    "q_str_regexp_split" -> (strRegexpSplit _),
    "q_date_funcs" -> (dateFuncs _),
    "q_date_parts" -> (dateParts _),
    "q_str_more" -> (strMore _),
    "q_str_fuzzy" -> (strFuzzy _),
    "q_math_funcs" -> (mathFuncs _),
    "q_array_funcs" -> (arrayFuncs _),
    "q_array_setops" -> (arraySetops _),
    "q_array_hof" -> (arrayHof _),
    "q_map_funcs" -> (mapFuncs _),
    "q_json_nested" -> (jsonNested _)
  )

  val oracle: Map[String, String] = Map(
    "q_str_collation" ->
      """WITH m AS (
        |  SELECT CASE WHEN c_custkey % 2 = 1 THEN lower(c_mktsegment)
        |    ELSE c_mktsegment END AS seg_mixed
        |  FROM customer)
        |SELECT upper(seg_mixed) AS segment, COUNT(*) AS n
        |FROM m GROUP BY upper(seg_mixed) ORDER BY segment""".stripMargin,
    "q_source_xml_col" ->
      """SELECT o_orderpriority AS priority, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY o_orderpriority ORDER BY priority""".stripMargin,
    "q_json_variant" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(json_extract(props, '$.k') AS INTEGER) AS k
        |  FROM events)
        |SELECT event_type, COUNT(k) AS n_with_k,
        |  MIN(k) AS min_k, MAX(k) AS max_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_join_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_orderdate
        |FROM (SELECT c_custkey FROM customer
        |      ORDER BY c_acctbal DESC, c_custkey LIMIT 5) c,
        |LATERAL (SELECT o_orderkey, o_orderdate FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_orderdate DESC, o.o_orderkey DESC""".stripMargin,
    "q_str_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lc,
        |  upper(p_brand) AS brand_uc,
        |  substring(p_type, 1, 4) AS type4,
        |  p_brand || ':' || p_type AS brand_type,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  replace(p_name, ' ', '_') AS name_us,
        |  lpad(p_brand, 10, '*') AS brand_pad,
        |  p_name LIKE '%widget%' AS has_widget
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_str_regexp_split" ->
      """SELECT p_partkey,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  split_part(p_name, ' ', 1) AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_date_parts" ->
      """SELECT o_orderkey,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(weekofyear(o_orderdate) AS INTEGER) AS week,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_str_more" ->
      """SELECT p_partkey,
        |  reverse(p_name) AS rev_name,
        |  repeat(p_brand, 2) AS brand_x2,
        |  CAST(ascii(p_name) AS INTEGER) AS first_ascii,
        |  CAST(strpos(p_name, 'e') AS INTEGER) AS e_pos,
        |  substring(p_name, 1, 3) AS l3,
        |  right(p_name, 3) AS r3,
        |  translate(p_name, 'aeiou', 'AEIOU') AS vowels_uc
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_str_fuzzy" ->
      """SELECT p_partkey,
        |  split_part(p_name, ' ', 1) AS w1,
        |  CAST(levenshtein(split_part(p_name, ' ', 1), 'widget') AS INTEGER) AS lev_widget,
        |  CAST(levenshtein(p_brand, p_type) AS INTEGER) AS lev_brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(sqrt(l_extendedprice), 4) AS sqrt_price,
        |  ROUND(ln(l_extendedprice), 4) AS ln_price,
        |  ROUND(pow(l_discount + 1, 2), 4) AS pow_disc,
        |  abs(l_quantity - 25) AS abs_qty,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS ceil_disc,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS floor_tax,
        |  CAST(floor(l_quantity) AS BIGINT) % 7 AS qty_mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, sqrt_price, ln_price,
        |  pow_disc, abs_qty, ceil_disc, floor_tax, qty_mod7""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  embedding[1] AS first_val,
        |  embedding[1:4][2] AS head4_2,
        |  embedding[1:4][4] AS head4_4,
        |  list_reverse(embedding[1:4])[1] AS head4_last,
        |  list_contains(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 10) AS INTEGER)), 3) AS has_bucket3
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_array_setops" ->
      """WITH ab AS (SELECT p_partkey,
        |  list_distinct(string_split(p_name, ' ')) AS a,
        |  list_distinct(string_split(p_type, ' ')) AS b
        |  FROM part)
        |SELECT p_partkey,
        |  COALESCE(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS u,
        |  COALESCE(array_to_string(list_sort(list_intersect(a, b)), ','), '') AS i,
        |  COALESCE(array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))), ','), '') AS d,
        |  CAST(len(list_intersect(a, b)) AS INTEGER) AS n_common
        |FROM ab ORDER BY p_partkey""".stripMargin,
    "q_array_hof" ->
      """SELECT vec_id,
        |  ROUND(sqrt(list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)), 4) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_map_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        |  CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
        |  json_keys(props)[1] AS first_key
        |FROM events ORDER BY event_id""".stripMargin,
    "q_json_nested" ->
      """SELECT event_id, user_id AS rt_user, event_type AS rt_etype
        |FROM events ORDER BY event_id""".stripMargin
  )
}
