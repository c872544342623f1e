package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, MapType, StringType}

/** SURVEY §2.8 — scalar function surface (string / date / math /
  * conditional / json / array / map).
  *
  * Everything here is a built-in codegen'd Catalyst expression — no UDFs —
  * so each query is one whole-stage-codegen span over the scan. Determinism
  * notes per query; the JSON/array/map keys exercise the semi-structured
  * `events.props` payload surface the event-stream domain is built on.
  */
object Functions {

  val queries: Seq[Q] = Seq(

    Q("fn_string",
      (spark, sfDir) =>
        Tables.part(spark, sfDir)
          .select(
            col("p_partkey"),
            concat(upper(col("p_name")), lit("|"), lower(col("p_brand"))).as("shout"),
            substring(col("p_name"), 1, 5).as("head5"),
            length(col("p_name")).as("len"),
            lpad(col("p_type"), 12, "*").as("padded"),
            regexp_replace(col("p_name"), " ", "_").as("snake"),
            regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
            substring_index(col("p_name"), " ", -1).as("last_word"),
            col("p_name").like("%small%").as("is_small"))
          .orderBy(col("p_partkey")),
      Some("""
        SELECT p_partkey,
          upper(p_name) || '|' || lower(p_brand) AS shout,
          substring(p_name, 1, 5) AS head5,
          CAST(length(p_name) AS INT) AS len,
          lpad(p_type, 12, '*') AS padded,
          replace(p_name, ' ', '_') AS snake,
          regexp_extract(p_name, '^(\w+)', 1) AS first_word,
          split_part(p_name, ' ', -1) AS last_word,
          p_name LIKE '%small%' AS is_small
        FROM part
        ORDER BY p_partkey""".trim)),

    Q("fn_date",
      (spark, sfDir) =>
        Tables.orders(spark, sfDir)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).as("days_since"),
            date_add(to_date(col("o_orderdate")), 30).as("due_date"),
            (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("plus90"),
            unix_micros(col("o_orderdate")).as("epoch_us"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
          CAST(year(o_orderdate) AS INT) AS yr,
          CAST(month(o_orderdate) AS INT) AS mo,
          CAST(day(o_orderdate) AS INT) AS dom,
          date_trunc('month', o_orderdate) AS month_start,
          CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
          CAST(o_orderdate AS DATE) + 30 AS due_date,
          o_orderdate + INTERVAL 90 DAY AS plus90,
          epoch_us(o_orderdate) AS epoch_us
        FROM orders
        ORDER BY o_orderkey""".trim)),

    // Irrational results rounded to 6dp (libm last-ulp differences between
    // JVM and C are masked; sqrt is IEEE-correctly-rounded everywhere).
    Q("fn_math",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
            round(log(col("l_extendedprice")), 6).as("ln_price"),
            round(exp(col("l_discount")), 6).as("exp_disc"),
            (col("l_quantity") * col("l_quantity")).as("qty_sq"),
            abs(col("l_quantity") - 25.0).as("qty_dev"),
            ceil(col("l_quantity") / 7.0).as("qty_ceil7"),
            floor(col("l_quantity") / 7.0).as("qty_floor7"),
            pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
            signum(col("l_quantity") - 25.0).as("qty_sign"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""
        SELECT l_orderkey, l_linenumber,
          round(sqrt(l_extendedprice), 6) AS sqrt_price,
          round(ln(l_extendedprice), 6) AS ln_price,
          round(exp(l_discount), 6) AS exp_disc,
          l_quantity * l_quantity AS qty_sq,
          abs(l_quantity - 25.0) AS qty_dev,
          CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
          CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_floor7,
          l_orderkey % 7 AS key_mod7,
          CAST(sign(l_quantity - 25.0) AS DOUBLE) AS qty_sign
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber""".trim)),

    // CASE tiering + NULL-handling over a real NULL source (outer join).
    Q("fn_case_null",
      (spark, sfDir) => {
        val c = Tables.customer(spark, sfDir)
        val o = Tables.orders(spark, sfDir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .select(
            col("c_custkey"),
            coalesce(col("o_orderkey"), lit(-1L)).as("okey"),
            when(col("o_totalprice") > 300000, "high")
              .when(col("o_totalprice") > 100000, "mid")
              .when(col("o_totalprice").isNotNull, "low")
              .otherwise("none").as("tier"),
            coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status"),
            col("o_totalprice").isNull.as("no_order"))
          .orderBy(col("c_custkey"), col("okey"))
      },
      Some("""
        SELECT c_custkey,
          coalesce(o_orderkey, -1) AS okey,
          CASE WHEN o_totalprice > 300000 THEN 'high'
               WHEN o_totalprice > 100000 THEN 'mid'
               WHEN o_totalprice IS NOT NULL THEN 'low'
               ELSE 'none' END AS tier,
          coalesce(nullif(o_orderstatus, 'O'), 'open') AS status,
          o_totalprice IS NULL AS no_order
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        ORDER BY c_custkey, okey""".trim)),

    // JSON payload extraction + aggregation — the core event-stream op.
    Q("fn_json",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("k").cast(LongType)).as("sum_k"),
            avg(col("k")).as("avg_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
          AVG(CAST(json_extract_string(props, '$.k') AS INT)) AS avg_k,
          MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
          MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // JSON payload transformation between API shapes (r4): the reference's
    // central event-stream operation — parse the v1 `props` payload,
    // restructure into a v2 envelope (renamed fields, nested metrics
    // object), serialize back out. `to_json(struct(...))` and DuckDB
    // `json_object(...)` both emit compact, construction-ordered JSON, so
    // the payload STRING is oracle-exact; fields are int/string-typed only
    // (float formatting differs across serializers by design). Pure
    // per-row projection, zero shuffle.
    Q("fn_json_transform",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .select(col("event_id"), col("event_type"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
          .filter(col("k").isNotNull)
          .select(col("event_id"),
            to_json(struct(
              col("event_id").as("id"),
              upper(col("event_type")).as("kind"),
              struct(col("k"), (col("k") * 2).as("k2")).as("metrics"))).as("payload"))
          .orderBy(col("event_id")),
      Some("""
        SELECT event_id,
          json_object('id', event_id, 'kind', upper(event_type),
            'metrics', json_object('k', CAST(json_extract_string(props, '$.k') AS INT),
                                   'k2', CAST(json_extract_string(props, '$.k') AS INT) * 2))::VARCHAR AS payload
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
        ORDER BY event_id""".trim)),

    // VARIANT semi-structured path (r11): Spark 4's answer to
    // schema-on-read JSON — `parse_json` binary-encodes the document once
    // (shredded, field-indexed) and `variant_get` extracts typed paths
    // WITHOUT re-parsing text per access, the way get_json_object does.
    // At 100 TB that is the difference between N regex-ish text scans per
    // row (one per extracted field) and one parse + O(log fields) binary
    // lookups; variant columns also land in parquet with shredded stats.
    // The payload here is a nested envelope synthesized from orders (the
    // fixture's own props is flat), extracted back out through typed
    // paths, incl. a missing path that must yield NULL, not an error. The
    // oracle recomputes from the source columns directly, so the whole
    // to_json → parse_json → variant_get pipeline must be value-lossless
    // — including doubles, which survive because JSON shortest-round-trip
    // text parses to an exact decimal in the variant encoder.
    Q("fn_variant",
      (spark, sfDir) =>
        Tables.orders(spark, sfDir)
          .select(col("o_orderkey"),
            parse_json(to_json(struct(
              col("o_orderstatus").as("st"),
              col("o_totalprice").as("tp"),
              struct(col("o_orderpriority").as("pr"),
                (col("o_custkey") % 97).cast(IntegerType).as("sp")).as("meta")))).as("v"))
          .select(
            variant_get(col("v"), "$.st", "string").as("st"),
            variant_get(col("v"), "$.meta.pr", "string").as("pr"),
            variant_get(col("v"), "$.meta.sp", "int").as("sp"),
            variant_get(col("v"), "$.tp", "double").as("tp"),
            variant_get(col("v"), "$.absent.path", "string").as("missing"))
          .groupBy(col("st"), col("pr"))
          .agg(count(lit(1)).as("n"),
            sum(col("sp").cast(LongType)).as("sum_sp"),
            Det.emit(sum(Det.money(col("tp"))), 2).as("sum_tp"),
            count(col("missing")).as("n_missing"))
          .orderBy(col("st"), col("pr")),
      Some(s"""
        SELECT o_orderstatus AS st, o_orderpriority AS pr, COUNT(*) AS n,
          CAST(SUM(o_custkey % 97) AS BIGINT) AS sum_sp,
          ${Det.sqlEmit(s"SUM(${Det.sqlMoney("o_totalprice")})", 2)} AS sum_tp,
          CAST(0 AS BIGINT) AS n_missing
        FROM orders
        GROUP BY 1, 2 ORDER BY 1, 2""".trim)),

    // Collation semantics (r11): Spark 4's collated string type — equality,
    // grouping, and DISTINCT under UTF8_LCASE compare case-insensitively
    // WITHOUT rewriting values through lower() (at 100 TB that matters
    // because collation is a comparison property the optimizer understands
    // — pushdown and codegen still apply — while lower()-wrapping every
    // predicate rewrites data and defeats column statistics). The fixture
    // is case-perturbed three ways per segment key; the key counts
    // distincts and matches under binary vs LCASE collation side by side,
    // and the oracle reproduces the LCASE lane with explicit lower() —
    // the two semantics must agree exactly on this alphabet.
    Q("fn_collate",
      (spark, sfDir) => {
        val seg = col("c_mktsegment")
        val variant = when(col("c_custkey") % 3 === 0, lower(seg))
          .when(col("c_custkey") % 3 === 1, upper(seg))
          .otherwise(seg)
        Tables.customer(spark, sfDir)
          .select(col("c_custkey"), seg, variant.as("seg_var"))
          .groupBy(col("c_mktsegment"))
          .agg(
            countDistinct(col("seg_var")).as("n_cs"),
            countDistinct(collate(col("seg_var"), "UTF8_LCASE")).as("n_ci"),
            count(when(col("seg_var") === col("c_mktsegment"), 1)).as("n_match_cs"),
            count(when(collate(col("seg_var"), "UTF8_LCASE") ===
              collate(col("c_mktsegment"), "UTF8_LCASE"), 1)).as("n_match_ci"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        WITH v AS (
          SELECT c_mktsegment,
                 CASE CAST(c_custkey % 3 AS INT)
                   WHEN 0 THEN lower(c_mktsegment)
                   WHEN 1 THEN upper(c_mktsegment)
                   ELSE c_mktsegment END AS seg_var
          FROM customer
        )
        SELECT c_mktsegment,
               CAST(COUNT(DISTINCT seg_var) AS BIGINT) AS n_cs,
               CAST(COUNT(DISTINCT lower(seg_var)) AS BIGINT) AS n_ci,
               CAST(COUNT(CASE WHEN seg_var = c_mktsegment THEN 1 END) AS BIGINT) AS n_match_cs,
               CAST(COUNT(CASE WHEN lower(seg_var) = lower(c_mktsegment) THEN 1 END) AS BIGINT) AS n_match_ci
        FROM v
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""".trim)),

    // Edit distance (r4): levenshtein between each document head and its
    // doc_id-predecessor's — the fuzzy-match primitive behind typo-tolerant
    // dedup and entity resolution; both engines ship the identical DP
    // algorithm. The un-partitioned lag window is bounded to a 100-row
    // subset by the pushed filter (same single-partition caveat as
    // sort_global; a real run partitions by a blocking key first).
    Q("fn_edit_distance",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), substring(col("text"), 1, 40).as("head"))
          .withColumn("prev_head",
            lag(col("head"), 1).over(org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
          .filter(col("prev_head").isNotNull)
          .select(col("doc_id"), levenshtein(col("head"), col("prev_head")).as("edit_dist"))
          .orderBy(col("doc_id")),
      Some("""
        WITH h AS (SELECT doc_id, substr(text, 1, 40) AS head FROM documents WHERE doc_id < 100),
        p AS (SELECT doc_id, head, lag(head) OVER (ORDER BY doc_id) AS prev_head FROM h)
        SELECT doc_id, CAST(levenshtein(head, prev_head) AS INT) AS edit_dist
        FROM p WHERE prev_head IS NOT NULL ORDER BY doc_id""".trim)),

    // Bitwise family (r4): AND/OR/XOR, shifts, bit_count over the id
    // columns — flag-mask arithmetic. Exact int64 ops, identical in both
    // engines; zero shuffle.
    Q("fn_bitwise",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .select(col("event_id"),
            col("user_id").bitwiseAND(lit(255L)).as("uid_low"),
            col("user_id").bitwiseOR(lit(4096L)).as("uid_flag"),
            col("user_id").bitwiseXOR(col("event_id")).as("uid_mix"),
            shiftleft(col("user_id"), 3).as("uid_shl"),
            shiftright(col("event_id"), 2).as("eid_shr"),
            bit_count(col("event_id")).cast("int").as("eid_bits"))
          .orderBy(col("event_id")),
      Some("""
        SELECT event_id,
          user_id & 255 AS uid_low,
          user_id | 4096 AS uid_flag,
          xor(user_id, event_id) AS uid_mix,
          user_id << 3 AS uid_shl,
          event_id >> 2 AS eid_shr,
          CAST(bit_count(event_id) AS INT) AS eid_bits
        FROM events
        ORDER BY event_id""".trim)),

    // URL parsing (r4): host/path/query extraction via one shared regex —
    // the link-analysis primitive for post/event payloads. The fixture has
    // no URLs, so deterministic ones are constructed from (source, doc_id,
    // lang) first — same construction in the oracle. The pattern uses only
    // character classes (no backslash escapes, no parse_url — DuckDB lacks
    // it) so both engines run the identical regex. Zero shuffle.
    Q("fn_url_parse",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .withColumn("url", concat(lit("https://"), col("source"),
            lit(".example.com/docs/"), col("doc_id"), lit("?lang="), col("lang")))
          .select(col("doc_id"), col("url"),
            regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1).as("host"),
            regexp_extract(col("url"), "^[a-z]+://[^/]+(/[^?]*)", 1).as("path"),
            regexp_extract(col("url"), "[?](.*)$", 1).as("query"))
          .orderBy(col("doc_id")),
      Some("""
        WITH u AS (
          SELECT doc_id,
            'https://' || source || '.example.com/docs/' || doc_id || '?lang=' || lang AS url
          FROM documents)
        SELECT doc_id, url,
          regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
          regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
          regexp_extract(url, '[?](.*)$', 1) AS query
        FROM u ORDER BY doc_id""".trim)),

    // Array surface over tokenized text (arrays emitted as joined strings —
    // scalars only in oracle-compared output).
    Q("fn_array",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(
            col("doc_id"),
            size(col("toks")).as("n_tokens"),
            size(array_distinct(col("toks"))).as("n_distinct"),
            col("toks").getItem(0).as("first_tok"),
            array_contains(col("toks"), "spark").as("has_spark"),
            array_join(slice(sort_array(col("toks")), 1, 3), ",").as("top3"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
          CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
          string_split(text, ' ')[1] AS first_tok,
          list_contains(string_split(text, ' '), 'spark') AS has_spark,
          array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS top3
        FROM documents
        ORDER BY doc_id""".trim)),

    // Struct surface: build a nested struct, project through its fields —
    // the pattern for typed payload columns (and the multimodal metadata
    // slot). Only scalar leaves are emitted (oracle-comparable).
    Q("fn_struct",
      (spark, sfDir) =>
        Tables.orders(spark, sfDir)
          .select(col("o_orderkey"),
            struct(
              col("o_totalprice").as("price"),
              col("o_orderstatus").as("status"),
              struct(year(col("o_orderdate")).as("yr"),
                month(col("o_orderdate")).as("mo")).as("when")).as("o"))
          .select(col("o_orderkey"),
            col("o.price").as("price"),
            col("o.status").as("status"),
            col("o.when.yr").as("yr"),
            col("o.when.mo").as("mo"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey, o_totalprice AS price, o_orderstatus AS status,
          CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo
        FROM orders
        ORDER BY o_orderkey""".trim)),

    // Map surface: parse props into a typed map, inspect keys/values.
    Q("fn_map",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .select(col("event_id"),
            from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
          .select(
            col("event_id"),
            array_join(map_keys(col("m")), ",").as("keys"),
            element_at(col("m"), "k").as("k_val"),
            size(col("m")).as("n_keys"))
          .orderBy(col("event_id")),
      Some("""
        SELECT event_id,
          array_to_string(json_keys(props), ',') AS keys,
          CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
          CAST(len(json_keys(props)) AS INT) AS n_keys
        FROM events
        ORDER BY event_id""".trim)),

    // Cryptographic digest family (r5): md5 + sha256 over document text,
    // plus a truncated digest of a composite key — the content-address
    // primitives behind `llm_dedup_exact` (which groups by sha2 at scale)
    // and stable partition naming, surfaced as first-class scalars. Both
    // engines emit lowercase hex, so the strings are oracle-exact. Per-row,
    // zero shuffle; bounded subset keeps the dump small.
    Q("fn_hash",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .filter(col("doc_id") < 200)
          .select(col("doc_id"),
            md5(col("text")).as("md5_hex"),
            sha2(col("text"), 256).as("sha256_hex"),
            substring(sha2(concat_ws("|", col("source"), col("lang")), 256), 1, 16)
              .as("part_digest"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
          md5(text) AS md5_hex,
          sha256(text) AS sha256_hex,
          substr(sha256(concat_ws('|', source, lang)), 1, 16) AS part_digest
        FROM documents
        WHERE doc_id < 200
        ORDER BY doc_id""".trim)),

    // Error-safe arithmetic (r5): the engine runs ANSI mode (overflow and
    // bad casts fail LOUDLY — SURVEY §7.3), so the explicit opt-out is part
    // of the contract: `try_divide`/`try_mod` return NULL on a zero
    // divisor instead of raising. The oracle spells the NULL-on-zero
    // semantics explicitly via NULLIF(divisor, 0) — DuckDB 1.0's bare
    // x/0 happened to return NULL too, but 1.1+ defaults
    // ieee_floating_point_ops=true (x/0.0 → Infinity), so the bare form
    // is version-fragile while NULL-propagation through NULLIF is not
    // (ADVICE r5). Non-zero paths are single IEEE ops, bit-identical.
    // Zero shuffle.
    Q("fn_try_arith",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .select(col("event_id"),
            expr("try_divide(value, user_id % 5)").as("per_bucket"),
            expr("try_divide(CAST(1.0 AS DOUBLE), value - value)").as("div_zero"),
            expr("try_mod(event_id, user_id % 3)").as("mod_cycle"))
          .orderBy(col("event_id")),
      Some("""
        SELECT event_id,
          value / NULLIF(user_id % 5, 0) AS per_bucket,
          CAST(1.0 AS DOUBLE) / NULLIF(value - value, 0) AS div_zero,
          event_id % NULLIF(user_id % 3, 0) AS mod_cycle
        FROM events
        ORDER BY event_id""".trim)),

    // Binary codecs (r9): base64 / hex encode + a decode round-trip over
    // document text — the wire-format layer every export/import path
    // crosses (fn_hash covers digests; this covers reversible encodings).
    // This Spark build emits MIME-chunked base64 (76-col lines joined by
    // CRLF, the spark.sql.legacy.chunkBase64String behavior) while DuckDB's
    // to_base64 is unchunked RFC 4648 — r9's one hash-mismatch. The contract
    // output is the canonical unchunked form, so strip CR/LF explicitly
    // rather than depend on a session flag the driver's harness may not set.
    // Both engines emit uppercase hex. Pure per-row projection: zero
    // shuffle, whole-stage codegen.
    Q("fn_codec",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .filter(col("doc_id") < 200)
          .select(col("doc_id"),
            translate(base64(col("text").cast("binary")), "\r\n", "")
              .as("b64"),
            hex(substring(col("text"), 1, 24).cast("binary")).as("head_hex"),
            decode(unbase64(base64(col("text").cast("binary"))), "UTF-8")
              .as("roundtrip"),
            length(col("text").cast("binary")).as("n_bytes"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
          to_base64(encode(text)) AS b64,
          hex(encode(substring(text, 1, 24))) AS head_hex,
          text AS roundtrip,
          CAST(octet_length(encode(text)) AS INT) AS n_bytes
        FROM documents
        WHERE doc_id < 200
        ORDER BY doc_id""".trim)),

    // All-match regex extraction (r9): fn_string pins single-match
    // regexp_extract; this pins the ALL-matches family — match counts and
    // the first five long-word matches per document, the shape tokenizers
    // and PII scanners use. The character-class pattern means Java regex
    // (Spark) and RE2 (DuckDB) agree by construction — the contract
    // deliberately stays inside the common dialect. Zero shuffle.
    Q("fn_regex",
      (spark, sfDir) =>
        Tables.documents(spark, sfDir)
          .filter(col("doc_id") < 300)
          .select(col("doc_id"),
            size(expr("regexp_extract_all(text, '[A-Za-z]{8,}', 0)"))
              .as("n_long_words"),
            // no-match → NULL (not ''): DuckDB's array_to_string over an
            // empty slice is NULL, and matches are ≥8 chars so '' can
            // only mean "no matches" — nullif makes the engines agree.
            expr("""nullif(concat_ws(',',
                slice(regexp_extract_all(text, '[A-Za-z]{8,}', 0), 1, 5)), '')""")
              .as("first5"),
            size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_numbers"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[A-Za-z]{8,}')) AS INT) AS n_long_words,
          array_to_string(regexp_extract_all(text, '[A-Za-z]{8,}')[1:5], ',') AS first5,
          CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers
        FROM documents
        WHERE doc_id < 300
        ORDER BY doc_id""".trim)),

    // printf-style formatting (r10): zero-padded ids, hex, and fixed
    // 2dp money rendering — the report/export formatting layer. The
    // %.2f contract is deliberately fed 2dp money values: their binary
    // doubles are never an exact .xx5 halfway point, so Java's HALF_UP
    // (Spark) and C's round-half-even (DuckDB printf) agree on every
    // fixture value; arbitrary doubles would diverge on exact halves and
    // are out of contract. Pure projection, zero shuffle, codegen.
    Q("fn_format",
      (spark, sfDir) =>
        Tables.orders(spark, sfDir)
          .filter(col("o_orderkey") < 2000)
          .select(col("o_orderkey"),
            format_string("ORD-%09d", col("o_orderkey")).as("padded_id"),
            format_string("%x", col("o_orderkey")).as("hex_id"),
            format_string("%.2f", col("o_totalprice").cast(graft.Det.Money)
              .cast("double")).as("price_2dp"),
            format_string("%s/%s", col("o_orderstatus"),
              col("o_orderpriority")).as("tag"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
          printf('ORD-%09d', o_orderkey) AS padded_id,
          printf('%x', o_orderkey) AS hex_id,
          printf('%.2f', CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE))
            AS price_2dp,
          printf('%s/%s', o_orderstatus, o_orderpriority) AS tag
        FROM orders
        WHERE o_orderkey < 2000
        ORDER BY o_orderkey""".trim)),

    // Datetime parse/format round-trip (r10): the ingestion half of the
    // datetime surface (fn_date covers extraction/arithmetic). Format a
    // µs-precision timestamp to text in two layouts and parse each back;
    // the contract is the ROUND-TRIP — reparsed epoch must equal the
    // original to the microsecond (full layout) / to the day (date-only
    // layout). Each engine uses its native pattern dialect (Java
    // SimpleDateTime-style vs strftime) — the pinned agreement is on
    // RESULTS, not pattern syntax, which is exactly what a user porting
    // parse logic needs guaranteed. Pure projection, zero shuffle.
    Q("fn_date_parse",
      (spark, sfDir) =>
        Tables.events(spark, sfDir)
          .filter(col("event_id") < 2000)
          .select(col("event_id"),
            unix_micros(col("ts")).as("epoch_us"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("iso_full"),
            unix_micros(to_timestamp(
              date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
              "yyyy-MM-dd HH:mm:ss.SSSSSS")).as("reparsed_us"),
            date_format(col("ts"), "dd/MM/yyyy").as("eu_date"),
            to_date(date_format(col("ts"), "dd/MM/yyyy"), "dd/MM/yyyy")
              .as("reparsed_date"))
          .orderBy(col("event_id")),
      Some("""
        SELECT event_id,
          epoch_us(ts) AS epoch_us,
          strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS iso_full,
          epoch_us(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'),
                            '%Y-%m-%d %H:%M:%S.%f')) AS reparsed_us,
          strftime(ts, '%d/%m/%Y') AS eu_date,
          CAST(strptime(strftime(ts, '%d/%m/%Y'), '%d/%m/%Y') AS DATE)
            AS reparsed_date
        FROM events
        WHERE event_id < 2000
        ORDER BY event_id""".trim)),

    // IP / CIDR functions (r12): the log-analytics INET family expressed
    // in portable arithmetic — derive a deterministic IPv4 per user
    // (Knuth-hash of user_id), FORMAT it dotted-quad, PARSE the string
    // back to a uint32 (the function under test: split + shift — what
    // inet_aton does), and classify: RFC-1918 10.0.0.0/8 membership and
    // the /24 network. Output: per first-octet bucket, event count,
    // distinct /24 networks, and private-range event count. All integer —
    // parse(format(ip)) == ip is implicitly hash-gated (a drifted octet
    // shifts every bucket). At 100 TB this is one projection + one
    // hash-agg; the string round-trip stays inside whole-stage codegen.
    Q("fn_ip",
      (spark, sfDir) => {
        val ip = Tables.events(spark, sfDir)
          .withColumn("ip_num", pmod(col("user_id") * 2654435761L, lit(4294967296L)))
          .withColumn("ip_str", concat_ws(".",
            expr("ip_num div 16777216"),
            expr("ip_num div 65536 % 256"),
            expr("ip_num div 256 % 256"),
            expr("ip_num % 256")))
          // the parse under test: dotted-quad string → uint32
          .withColumn("parsed",
            expr("CAST(split(ip_str, '\\\\.')[0] AS BIGINT) * 16777216 + " +
              "CAST(split(ip_str, '\\\\.')[1] AS BIGINT) * 65536 + " +
              "CAST(split(ip_str, '\\\\.')[2] AS BIGINT) * 256 + " +
              "CAST(split(ip_str, '\\\\.')[3] AS BIGINT)"))
          .withColumn("net24", expr("parsed div 256 * 256"))
          .withColumn("is_private", expr("parsed div 16777216 = 10"))
        ip.groupBy(expr("parsed div 16777216").as("octet1"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("net24")).as("n_net24"),
            sum(when(col("is_private"), 1L).otherwise(0L)).as("n_private"))
          .orderBy(col("octet1"))
      },
      Some("""
        WITH ip AS (
          SELECT (user_id * 2654435761) % 4294967296 AS ip_num FROM events
        ), fmt AS (
          SELECT ip_num,
                 (ip_num // 16777216)::VARCHAR || '.' ||
                 (ip_num // 65536 % 256)::VARCHAR || '.' ||
                 (ip_num // 256 % 256)::VARCHAR || '.' ||
                 (ip_num % 256)::VARCHAR AS ip_str
          FROM ip
        ), parsed AS (
          SELECT CAST(string_split(ip_str, '.')[1] AS BIGINT) * 16777216 +
                 CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536 +
                 CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256 +
                 CAST(string_split(ip_str, '.')[4] AS BIGINT) AS p
          FROM fmt
        )
        SELECT p // 16777216 AS octet1, COUNT(*) AS n,
               COUNT(DISTINCT p // 256 * 256) AS n_net24,
               CAST(SUM(CASE WHEN p // 16777216 = 10 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_private
        FROM parsed
        GROUP BY 1
        ORDER BY octet1""".trim)),

    // Geo grid bucketing (r12): the geohash-shaped aggregation in pure
    // integer arithmetic (trig-free — libm sin/cos differ across engines
    // in the last ulp, so haversine is NOT hash-portable; grid cells
    // are, and are what a 100 TB heatmap actually aggregates by).
    // Deterministic per-user micro-degree lat/lon (Knuth hash), 5°×5°
    // cells, packed cell id; per-cell event count + distinct users.
    Q("fn_geo_grid",
      (spark, sfDir) => {
        val cell = 5000000L // 5° in micro-degrees
        val g = Tables.events(spark, sfDir)
          .withColumn("lat_udeg",
            pmod(col("user_id") * 2654435761L, lit(180000000L)) - 90000000L)
          .withColumn("lon_udeg",
            pmod(col("user_id") * 40503L + 7L, lit(360000000L)) - 180000000L)
          .withColumn("cx", expr(s"CAST(floor(lat_udeg / $cell) AS BIGINT)"))
          .withColumn("cy", expr(s"CAST(floor(lon_udeg / $cell) AS BIGINT)"))
          .withColumn("cell_id", col("cx") * 1000L + col("cy"))
        g.groupBy(col("cell_id"), col("cx"), col("cy"))
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cell_id"))
      },
      Some("""
        WITH g AS (
          SELECT user_id,
                 (user_id * 2654435761) % 180000000 - 90000000 AS lat_udeg,
                 (user_id * 40503 + 7) % 360000000 - 180000000 AS lon_udeg
          FROM events
        ), c AS (
          SELECT user_id,
                 CAST(floor(lat_udeg / 5000000.0) AS BIGINT) AS cx,
                 CAST(floor(lon_udeg / 5000000.0) AS BIGINT) AS cy
          FROM g
        )
        SELECT cx * 1000 + cy AS cell_id, cx, cy, COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS n_users
        FROM c
        GROUP BY 1, 2, 3
        ORDER BY cell_id""".trim)),

    // User-agent parsing (r12): the log-analytics classifier with the
    // classic PRECEDENCE trap — every Chrome UA also contains
    // "Safari/", so family detection must test Chrome BEFORE Safari (a
    // naive contains-Safari rule misclassifies the majority browser).
    // Deterministic UAs are constructed per user (4 templates keyed by
    // user_id, version from the id), then parsed back: ordered-CASE
    // family + per-family regexp_extract of the major version, rolled
    // up per (family, major). Pure projection + one hash-agg; the
    // regexes are shared verbatim with the oracle.
    Q("fn_useragent_parse",
      (spark, sfDir) => {
        val ua = Tables.events(spark, sfDir)
          .withColumn("v", (col("user_id") % 50 + 80).cast("long"))
          .withColumn("ua", expr("""CASE CAST(user_id % 4 AS INT)
            WHEN 0 THEN concat('Mozilla/5.0 (X11; Linux x86_64) Chrome/', v, '.0.0.0 Safari/537.36')
            WHEN 1 THEN concat('Mozilla/5.0 (Macintosh) Version/', v, '.1 Safari/605.1.15')
            WHEN 2 THEN concat('Mozilla/5.0 (Windows NT 10.0) Firefox/', v, '.0')
            ELSE concat('curl/', v, '.8.0') END"""))
          .withColumn("family", expr("""CASE
            WHEN ua LIKE '%Chrome/%' THEN 'chrome'
            WHEN ua LIKE '%Firefox/%' THEN 'firefox'
            WHEN ua LIKE 'curl/%' THEN 'curl'
            WHEN ua LIKE '%Safari/%' THEN 'safari'
            ELSE 'other' END"""))
          .withColumn("major", expr("""CAST(CASE
            WHEN ua LIKE '%Chrome/%' THEN regexp_extract(ua, 'Chrome/([0-9]+)', 1)
            WHEN ua LIKE '%Firefox/%' THEN regexp_extract(ua, 'Firefox/([0-9]+)', 1)
            WHEN ua LIKE 'curl/%' THEN regexp_extract(ua, 'curl/([0-9]+)', 1)
            ELSE regexp_extract(ua, 'Version/([0-9]+)', 1) END AS BIGINT)"""))
        ua.groupBy(col("family"), col("major"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("family"), col("major"))
      },
      Some("""
        WITH ua0 AS (
          SELECT user_id, (user_id % 50 + 80) AS v FROM events
        ), ua1 AS (
          SELECT user_id, CASE CAST(user_id % 4 AS INT)
            WHEN 0 THEN 'Mozilla/5.0 (X11; Linux x86_64) Chrome/' || v || '.0.0.0 Safari/537.36'
            WHEN 1 THEN 'Mozilla/5.0 (Macintosh) Version/' || v || '.1 Safari/605.1.15'
            WHEN 2 THEN 'Mozilla/5.0 (Windows NT 10.0) Firefox/' || v || '.0'
            ELSE 'curl/' || v || '.8.0' END AS ua
          FROM ua0
        ), parsed AS (
          SELECT user_id,
            CASE WHEN ua LIKE '%Chrome/%' THEN 'chrome'
                 WHEN ua LIKE '%Firefox/%' THEN 'firefox'
                 WHEN ua LIKE 'curl/%' THEN 'curl'
                 WHEN ua LIKE '%Safari/%' THEN 'safari'
                 ELSE 'other' END AS family,
            CAST(CASE WHEN ua LIKE '%Chrome/%' THEN regexp_extract(ua, 'Chrome/([0-9]+)', 1)
                      WHEN ua LIKE '%Firefox/%' THEN regexp_extract(ua, 'Firefox/([0-9]+)', 1)
                      WHEN ua LIKE 'curl/%' THEN regexp_extract(ua, 'curl/([0-9]+)', 1)
                      ELSE regexp_extract(ua, 'Version/([0-9]+)', 1) END AS BIGINT) AS major
          FROM ua1
        )
        SELECT family, major, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM parsed
        GROUP BY 1, 2
        ORDER BY family, major""".trim)),
  )
}
