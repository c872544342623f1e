package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.1–2.2 — scans, projection, filtering.
  *
  * All four are pure declarative plans: Catalyst pushes the predicates and
  * the column projection into the vectorized parquet scan (`PushedFilters` /
  * `ReadSchema` — asserted by plan-shape tests). At 100 TB these are the
  * operators where pushdown is the whole ballgame: a scan that reads all 11
  * lineitem columns for a 3-column projection is wrong, and a filter
  * evaluated post-scan instead of in the reader re-reads the table.
  */
object Scans {
  import Det._

  /** Spark 4 compiles the avro source into spark-sql, but this vendored
    * jar set lacks the separate spark-avro service registration, so the
    * short name "avro" doesn't resolve — address the FileFormat class
    * directly (same classes, same behavior). */
  private val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  val queries: Seq[Q] = Seq(

    // Full scan + narrow projection; count-stable, totally ordered.
    Q("scan_parquet",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber""".trim)),

    // Predicate pushed into the parquet reader + column pruning.
    Q("scan_pruned",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .filter(col("l_shipdate") <= to_timestamp(lit("1996-01-01 00:00:00")))
          .select(col("l_orderkey"), col("l_linenumber"),
            to_date(col("l_shipdate")).as("ship_date"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""
        SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1996-01-01 00:00:00'
        ORDER BY l_orderkey, l_linenumber""".trim)),

    // Computed columns: exact-decimal revenue + string concat.
    Q("project_expr",
      (spark, sfDir) =>
        Tables.lineitem(spark, sfDir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            emit(money(col("l_extendedprice")) * (factor(lit(1)) - factor(col("l_discount"))), 4)
              .as("revenue"),
            concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flag_status"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some(s"""
        SELECT l_orderkey, l_linenumber,
          ${sqlEmit(s"${sqlMoney("l_extendedprice")} * (${sqlFactor("1")} - ${sqlFactor("l_discount")})", 4)} AS revenue,
          l_returnflag || '/' || l_linestatus AS flag_status
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber""".trim)),

    // JSON source (r4): round-trip through newline-delimited JSON — write
    // a projection of orders as JSONL, read it back with an explicit
    // schema (schema-on-read, no inference job at scale), aggregate. The
    // oracle runs the same aggregate over the parquet original, so the key
    // asserts format fidelity, not just rows. Exact-int aggregates only:
    // doubles through a text format are a round-trip hazard by design.
    Q("source_json",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("fmt_json", sfDir)
        Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
          .write.mode("overwrite").json(dir)
        spark.read
          .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderpriority STRING")
          .json(dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_key"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".trim)),

    // CSV source (r4): same round-trip through headered CSV with an
    // explicit schema — the other ubiquitous interchange format.
    Q("source_csv",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("fmt_csv", sfDir)
        Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
          .write.mode("overwrite").option("header", "true").csv(dir)
        spark.read
          .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderpriority STRING")
          .option("header", "true").csv(dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_key"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".trim)),

    // Line-text source (r10): the last common ingest format — raw text
    // files where each line is a record and parsing is the reader's
    // problem (log shipping, WET/WARC-ish corpus drops). Documents export
    // as "doc_id<TAB>lang<TAB>text" lines, then spark.read.text ingests
    // value-per-line and a projection parses the three fields back. The
    // oracle is the ROUND-TRIP contract: parse(write(documents)) must
    // reproduce the table exactly — any quoting/escaping/splitting slip
    // breaks the hash. (Fixture text contains no tabs or newlines; a
    // production exporter would escape them — that belongs to the writer,
    // not this reader.) concat_ws silently DROPS null fields, which would
    // shift columns rather than fail loudly — so a null in any field
    // raises at write time instead (ADVICE r10). Scale: text scan is
    // splittable per line like any file source; the parse is zero-shuffle
    // codegen'd projection.
    Q("source_text",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("fmt_text", sfDir)
        Tables.documents(spark, sfDir)
          .select(when(
            col("doc_id").isNull.or(col("lang").isNull).or(col("text").isNull),
            raise_error(lit("source_text: NULL field would corrupt the " +
              "tab-delimited line encoding — escape or drop it upstream")))
            .otherwise(concat_ws("\t", col("doc_id"), col("lang"), col("text")))
            .as("value"))
          .write.mode("overwrite").text(dir)
        spark.read.text(dir)
          .select(
            split(col("value"), "\t", 3).getItem(0).cast("long").as("doc_id"),
            split(col("value"), "\t", 3).getItem(1).as("lang"),
            split(col("value"), "\t", 3).getItem(2).as("text"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, lang, text
        FROM documents
        ORDER BY doc_id""".trim)),

    // ORC source (r5): the remaining interchange round-trip (JSON/CSV
    // above) — columnar like parquet, so unlike the text formats this
    // path keeps types natively and supports predicate pushdown on read.
    Q("source_orc",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("fmt_orc", sfDir)
        Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
          .write.mode("overwrite").orc(dir)
        spark.read.orc(dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_key"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".trim)),

    // Avro round-trip (r11): the row-oriented wire format of the streaming
    // world (Kafka payloads, schema-registry contracts) — Spark 4 bundles
    // the avro source in spark-sql proper. Timestamps ride avro's
    // timestamp-micros logical type, so the l_shipdate month grouping after
    // read-back proves the temporal round-trip is lossless, not just the
    // longs. Row-oriented avro has no column pruning or predicate pushdown
    // — at 100 TB it is the INGEST format you convert FROM into parquet
    // (one sequential pass), never the format you query; this key is that
    // conversion's read half.
    Q("source_avro",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("fmt_avro", sfDir)
        Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"),
            col("l_returnflag"))
          .write.mode("overwrite").format(AvroFormat).save(dir)
        spark.read.format(AvroFormat).load(dir)
          .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"),
            col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            emit(sum(money(col("l_quantity"))), 2).as("sum_qty"),
            sum(col("l_orderkey")).as("sum_key"))
          .orderBy(col("ship_month"), col("l_returnflag"))
      },
      Some(s"""
        SELECT date_trunc('month', l_shipdate) AS ship_month, l_returnflag,
          COUNT(*) AS n,
          ${sqlEmit(s"SUM(${sqlMoney("l_quantity")})", 2)} AS sum_qty,
          CAST(SUM(l_orderkey) AS BIGINT) AS sum_key
        FROM lineitem
        GROUP BY 1, 2 ORDER BY 1, 2""".trim)),

    // XML round-trip (r11): the config/feed-interchange format (Spark 4
    // absorbed spark-xml as a built-in source). XML is stringly typed, so
    // the read-back declares an explicit schema — never inference — which
    // is the production contract for feed ingestion (inference re-reads
    // the data and can drift across files). Doubles survive because Spark
    // writes shortest-round-trip decimal text; the money aggregate is
    // still routed through the exact-decimal policy after parse. Like
    // avro: an ingest format to convert from, one sequential pass, no
    // pushdown — conversion read-half at 100 TB.
    Q("source_xml",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("fmt_xml", sfDir)
        Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
          .write.mode("overwrite").option("rowTag", "customer").format("xml")
          .save(dir)
        spark.read
          .schema("c_custkey LONG, c_mktsegment STRING, c_acctbal DOUBLE")
          .option("rowTag", "customer").format("xml").load(dir)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            emit(sum(money(col("c_acctbal"))), 2).as("sum_bal"),
            sum(col("c_custkey")).as("sum_key"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""
        SELECT c_mktsegment, COUNT(*) AS n,
          ${sqlEmit(s"SUM(${sqlMoney("c_acctbal")})", 2)} AS sum_bal,
          CAST(SUM(c_custkey) AS BIGINT) AS sum_key
        FROM customer
        GROUP BY c_mktsegment ORDER BY c_mktsegment""".trim)),

    // Nested-struct pushdown + pruning (r11): telemetry payloads at 100 TB
    // are nested (meta.origin.shard, not flat columns), and the scan must
    // treat nested leaves like top-level ones — the shard predicate pushes
    // into the parquet reader as a nested-field filter, and schema pruning
    // reads ONLY the two touched leaves (meta.kind, meta.origin.shard) of
    // the struct, skipping the uid leaf entirely (PlanShapeSpec pins both
    // on the ReadSchema/PushedFilters text). Without nested pruning a
    // 2-leaf query decodes the whole struct column — the silent 10× scan
    // tax this key exists to prevent.
    Q("scan_nested_pushdown",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("fmt_nested", sfDir)
        Tables.events(spark, sfDir)
          .select(col("event_id"), col("value"),
            struct(
              col("event_type").as("kind"),
              struct((col("user_id") % 50).as("shard"),
                concat(lit("U"), col("user_id")).as("uid")).as("origin"))
              .as("meta"))
          .write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
          .filter(col("meta.origin.shard") === 7)
          .groupBy(col("meta.kind").as("kind"))
          .agg(count(lit(1)).as("n"), Det.sumVal6(col("value")).as("sum_val"))
          .orderBy(col("kind"))
      },
      Some(s"""
        SELECT event_type AS kind, COUNT(*) AS n,
          ${Det.sqlSumVal6("value")} AS sum_val
        FROM events
        WHERE user_id % 50 = 7
        GROUP BY 1
        ORDER BY kind""".trim)),

    // MERGE-shaped keyed upsert (r5): refresh a corpus snapshot with a
    // delta batch — updated rows replace by key, new rows append — then
    // materialize the merged snapshot (write + read back, so the key
    // asserts sink fidelity, not just the plan). The delta here is
    // synthesized from the fixture: every doc_id % 17 == 0 row gets a
    // re-crawled version, and 30 brand-new docs arrive under shifted ids.
    //
    // 100 TB shape: upsert = left-anti join of the snapshot against the
    // delta's keys + union — one shuffle on the merge key for the
    // snapshot side at worst; in practice the delta is orders of
    // magnitude smaller than the snapshot, so AQE broadcasts the delta
    // keys and the snapshot NEVER shuffles (no user hint — same policy as
    // the dedup verify joins). This is exactly the copy-on-write MERGE
    // strategy of the table formats (Delta/Iceberg), minus their commit
    // log: rewrite only what the anti-join keeps, append the delta.
    // Since r11 the rewrite lands through the [[Acid]] manifest-pointer
    // seam: v=0 is the standing snapshot, the MERGE result commits as
    // v=1, and a reader concurrent with the rewrite sees exactly one of
    // the two (OperatorSpec pins this under a live writer thread). The
    // read-back goes pointer → manifest → files, so the oracle also
    // proves the committed-snapshot read path.
    Q("sink_upsert",
      (spark, sfDir) => {
        val table = graft.Tmp.dir("sink_upsert", sfDir)
        Acid.reset(table)
        val snap = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("lang"), col("n_chars"))
        Acid.commit(spark, table, snap)
        val delta = Tables.documents(spark, sfDir)
          .filter(col("doc_id") % 17 === 0)
          .select(col("doc_id"), lit("xx").as("lang"),
            (col("n_chars") + 1000).as("n_chars"))
          .unionByName(Tables.documents(spark, sfDir)
            .filter(col("doc_id") < 30)
            .select((col("doc_id") + 1000000).as("doc_id"), col("lang"),
              col("n_chars")))
        val merged = Acid.read(spark, table)
          .join(delta.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .unionByName(delta)
        Acid.commit(spark, table, merged)
        Acid.read(spark, table).orderBy(col("doc_id"))
      },
      Some("""
        WITH delta AS (
          SELECT doc_id, 'xx' AS lang, n_chars + 1000 AS n_chars
          FROM documents WHERE doc_id % 17 = 0
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, lang, n_chars
          FROM documents WHERE doc_id < 30
        )
        SELECT doc_id, lang, n_chars FROM (
          SELECT s.doc_id, s.lang, s.n_chars FROM documents s
          WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.doc_id = s.doc_id)
          UNION ALL
          SELECT doc_id, lang, n_chars FROM delta
        ) ORDER BY doc_id""".trim)),

    // Time travel (r11): read a table AS OF an earlier version through the
    // Acid seam — the audit / reproduce-a-training-run primitive (Delta
    // `VERSION AS OF`). v0 is a base snapshot; v1 applies deletes (id%13),
    // updates (id%10 → lang 'xx') and inserts (id<20 cloned under id+5000);
    // the key then reads BOTH versions and emits them tagged. Because every
    // version's data dir and manifest are immutable after the pointer flip
    // (Acid.commit contract), the v0 read after v1 landed is byte-identical
    // to what a v0-era reader saw — which is exactly what the oracle pins:
    // it reconstructs both logical states independently from the fixture.
    // At 100 TB the historical read costs only the old manifest lookup; no
    // data is copied to keep history (MVCC by immutability), and retention
    // GC is the one deliberately-out-of-scope extra.
    Q("sink_time_travel",
      (spark, sfDir) => {
        val table = graft.Tmp.dir("sink_timetravel", sfDir)
        Acid.reset(table)
        val base = Tables.documents(spark, sfDir)
          .filter(col("doc_id") < 200)
          .select(col("doc_id"), col("lang"), col("n_chars"))
        Acid.commit(spark, table, base)
        val next = base
          .filter(col("doc_id") % 13 =!= 0)
          .withColumn("lang",
            when(col("doc_id") % 10 === 0, lit("xx")).otherwise(col("lang")))
          .unionByName(base.filter(col("doc_id") < 20)
            .select((col("doc_id") + 5000).as("doc_id"), col("lang"),
              (col("n_chars") + 7).as("n_chars")))
        Acid.commit(spark, table, next)
        // both historical reads go through the PURE-SQL entry path (r14 —
        // Delta's `VERSION AS OF` surface): the text below is what a SQL
        // user types; SqlEntry resolves acid_table(...) VERSION AS OF
        // through the same manifest seam as Acid.readVersion, so the plan
        // is identical (SurfaceDocSpec pins the parity)
        SqlEntry.sqlLakehouse(spark, s"""
          SELECT doc_id, lang, n_chars, CAST(0 AS BIGINT) AS version
          FROM acid_table('$table') VERSION AS OF 0
          UNION ALL
          SELECT doc_id, lang, n_chars, CAST(1 AS BIGINT) AS version
          FROM acid_table('$table') VERSION AS OF 1
          ORDER BY version, doc_id""")
      },
      Some("""
        WITH base AS (
          SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 200
        ), v1 AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END AS lang,
                 n_chars
          FROM base WHERE doc_id % 13 <> 0
          UNION ALL
          SELECT doc_id + 5000 AS doc_id, lang, n_chars + 7 AS n_chars
          FROM base WHERE doc_id < 20
        )
        SELECT doc_id, lang, n_chars, CAST(0 AS BIGINT) AS version FROM base
        UNION ALL
        SELECT doc_id, lang, n_chars, CAST(1 AS BIGINT) AS version FROM v1
        ORDER BY version, doc_id""".trim)),

    // Partitioned sink + pruned read-back (r5): THE 100 TB table layout —
    // write events hive-partitioned by event date, read back through a
    // literal date predicate that prunes to one partition directory
    // statically (PlanShapeSpec pins `PartitionFilters` on the equivalent
    // layout), aggregate the survivors. The oracle runs the same filtered
    // aggregate over the unpartitioned original, so the key asserts the
    // partitioned round-trip loses nothing and the partition column
    // derives correctly.
    Q("sink_partitioned",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("sink_part", sfDir)
        Tables.events(spark, sfDir)
          .withColumn("d", to_date(col("ts")))
          .write.mode("overwrite").partitionBy("d").parquet(dir)
        spark.read.parquet(dir)
          .filter(col("d") === lit("2024-01-12").cast("date"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), Det.sumVal6(col("value")).as("sum_val"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        SELECT event_type, COUNT(*) AS n, ${Det.sqlSumVal6("value")} AS sum_val
        FROM events
        WHERE CAST(ts AS DATE) = DATE '2024-01-12'
        GROUP BY event_type
        ORDER BY event_type""".trim)),

    // Dynamic partition overwrite (r11): the restatement operation on a
    // date-partitioned 100 TB table — late/corrected data arrives for ONE
    // day and only that day's partition directory may be replaced.
    // Spark's static overwrite mode would truncate the whole table first
    // (the classic data-loss footgun); `partitionOverwriteMode=dynamic`
    // scopes the overwrite to exactly the partitions present in the
    // incoming frame. Here 2024-01-12 is restated with doubled values;
    // the read-back per-day aggregate proves the other 29 days' bytes are
    // untouched (OperatorSpec additionally pins their files are the SAME
    // on-disk files afterward, not rewritten copies — the O(restated
    // partition) vs O(table) cost difference). INSERT OVERWRITE
    // PARTITION semantics, the pre-lakehouse restatement idiom every
    // warehouse still runs daily.
    Q("sink_dynamic_overwrite",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("sink_dynover", sfDir)
        val ev = Tables.events(spark, sfDir)
          .withColumn("d", to_date(col("ts")))
        ev.write.mode("overwrite").partitionBy("d").parquet(dir)
        ev.filter(col("d") === lit("2024-01-12").cast("date"))
          .withColumn("value", col("value") * 2)
          .write.mode("overwrite").partitionBy("d")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(dir)
        spark.read.parquet(dir)
          .groupBy(col("d"))
          .agg(count(lit(1)).as("n"), Det.sumVal6(col("value")).as("sum_val"))
          .orderBy(col("d"))
      },
      Some(s"""
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
          ${Det.sqlEmit(
            s"SUM(${Det.sqlVal6("CASE WHEN CAST(ts AS DATE) = DATE '2024-01-12' THEN value * 2 ELSE value END")})",
            6)} AS sum_val
        FROM events
        GROUP BY 1
        ORDER BY d""".trim)),

    // Small-file compaction (r9): the maintenance operator every
    // partitioned 100 TB table needs — micro-batch writers fragment each
    // date partition into many small files and scan cost degrades to
    // open()-per-file. Stage a deliberately fragmented date-partitioned
    // copy (16 round-robin writers per date), then compact: ONE hash
    // repartition on the partition column routes every date's rows to a
    // single task, so each partition dir collapses to one file (at real
    // scale the same plan with spark.sql.files.maxRecordsPerFile is the
    // target-size dial, and only partitions whose file count exceeds the
    // threshold re-write). Oracle: the per-date aggregate over the
    // ORIGINAL events — compaction must be row-lossless; OperatorSpec
    // pins the actual 16 → 1 file-count drop on disk.
    // Since r11 compaction commits through the [[Acid]] seam: v=0 is the
    // fragmented table, the compacted rewrite is v=1, and the pointer
    // flip is what makes compaction safe under live readers — a reader
    // mid-compaction reads v=0's manifest and never sees a half-written
    // mix of small and compacted files (the actual hazard of in-place
    // compaction at 100 TB). OperatorSpec pins the 16 → 1 per-partition
    // file collapse on the two committed versions.
    Q("sink_compact",
      (spark, sfDir) => {
        val table = graft.Tmp.dir("sink_compact", sfDir)
        Acid.reset(table)
        val withD = Tables.events(spark, sfDir)
          .withColumn("d", to_date(col("ts")))
        Acid.commit(spark, table, withD.repartition(16), Seq("d"))
        val compacted = Acid.read(spark, table).repartition(col("d"))
        Acid.commit(spark, table, compacted, Seq("d"))
        Acid.read(spark, table)
          .groupBy(col("d"))
          .agg(count(lit(1)).as("n"), Det.sumVal6(col("value")).as("sum_val"))
          .orderBy(col("d"))
      },
      Some(s"""
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n, ${Det.sqlSumVal6("value")} AS sum_val
        FROM events
        GROUP BY 1
        ORDER BY d""".trim)),

    // Schema evolution on read (r9): a 100 TB lakehouse table is written
    // by YEARS of pipeline versions — old files lack columns newer ones
    // carry. Stage the corpus as two generations (v1 without `source`,
    // v2 with it plus a derived `quality` column), then read the mixed
    // directory with mergeSchema: the unified schema is the union, old
    // files surface NULLs for columns they predate, and nothing re-writes.
    // Oracle: the same union with literal NULLs over the original table —
    // proving the merged read is exactly the logical union, no row or
    // value drift. At scale mergeSchema's footer-union planning cost is
    // why tables pin schemas in a catalog; the read semantics here are
    // what that catalog must reproduce.
    Q("source_evolving",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("src_evolve", sfDir)
        val docs = Tables.documents(spark, sfDir)
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$dir/gen=1")
        docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("source"),
            (col("n_chars") >= 500).as("quality"))
          .write.mode("overwrite").parquet(s"$dir/gen=2")
        spark.read.option("mergeSchema", "true").parquet(dir)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("source"),
            col("quality"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, lang, n_chars, CAST(NULL AS VARCHAR) AS source,
               CAST(NULL AS BOOLEAN) AS quality
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, lang, n_chars, source, n_chars >= 500 AS quality
        FROM documents WHERE doc_id % 2 = 1
        ORDER BY doc_id""".trim)),

    // Snapshot diff / change-feed generation (r9): given two keyed
    // snapshots of a table, emit the CDC feed that turns one into the
    // other — the inverse of sink_upsert (which APPLIES a feed) and the
    // producer side of stream_cdc_upsert. Snapshot 2 is derived from the
    // fixture by deterministic rules (drop id%97=0, bump value where
    // id%101=0, clone id%103=0 under id+100000000), so both engines build
    // identical inputs; the operator itself is ONE full outer join on the
    // key + row classification: D = left-only, I = right-only, U = both
    // present with differing payload (compared on 6dp-decimal value, the
    // Det policy — raw-double equality would be IEEE-representation
    // luck). At 100 TB both snapshots are bucketed on the key, so the
    // diff join is exchange-free (join_bucketed's layout), and the feed
    // size is O(changes), never O(table).
    Q("sink_snapshot_diff",
      (spark, sfDir) => {
        val snap1 = Tables.events(spark, sfDir)
          .select(col("event_id"), col("event_type"), col("value"))
        val snap2 = snap1.filter(col("event_id") % 97 =!= 0)
          .select(col("event_id"), col("event_type"),
            when(col("event_id") % 101 === 0, col("value") + 1).otherwise(col("value"))
              .as("value"))
          .unionByName(snap1.filter(col("event_id") % 103 === 0)
            .select((col("event_id") + 100000000L).as("event_id"),
              col("event_type"), col("value")))
        val l = snap1.select(col("event_id").as("k"),
          val6(col("value")).as("old_v"))
        val r = snap2.select(col("event_id").as("k2"),
          val6(col("value")).as("new_v"))
        l.join(r, col("k") === col("k2"), "full_outer")
          .select(coalesce(col("k"), col("k2")).as("event_id"),
            when(col("k2").isNull, "D")
              .when(col("k").isNull, "I")
              .otherwise("U").as("op"),
            emit(col("old_v"), 6).as("old_value"),
            emit(col("new_v"), 6).as("new_value"))
          .filter(col("op") =!= "U" || col("old_value") =!= col("new_value"))
          .orderBy(col("event_id"))
      },
      Some(s"""
        WITH snap1 AS (
          SELECT event_id, event_type, value FROM events),
        snap2 AS (
          SELECT event_id, event_type,
                 CASE WHEN event_id % 101 = 0 THEN value + 1 ELSE value END AS value
          FROM snap1 WHERE event_id % 97 <> 0
          UNION ALL
          SELECT event_id + 100000000, event_type, value
          FROM snap1 WHERE event_id % 103 = 0)
        SELECT COALESCE(l.event_id, r.event_id) AS event_id,
               CASE WHEN r.event_id IS NULL THEN 'D'
                    WHEN l.event_id IS NULL THEN 'I'
                    ELSE 'U' END AS op,
               ${Det.sqlEmit(Det.sqlVal6("l.value"), 6)} AS old_value,
               ${Det.sqlEmit(Det.sqlVal6("r.value"), 6)} AS new_value
        FROM snap1 l FULL OUTER JOIN snap2 r ON l.event_id = r.event_id
        WHERE NOT (l.event_id IS NOT NULL AND r.event_id IS NOT NULL
                   AND ${Det.sqlEmit(Det.sqlVal6("l.value"), 6)}
                     = ${Det.sqlEmit(Det.sqlVal6("r.value"), 6)})
        ORDER BY event_id""".trim)),

    // Raw-file ingest (r9): Spark's binaryFile source — the entry point a
    // multimodal corpus actually arrives through (image/audio payloads as
    // whole files; the llm_multimodal_* keys take over after this seam).
    // Stages the first 20 documents as doc_<id>.bin files (UTF-8 bytes,
    // once per JVM), reads them back whole-file, and proves the
    // (name, byte-length, content) triple round-trips: fname from the
    // path, length from the source's file metadata, and the first 16
    // chars of the UTF-8-decoded payload against the original text. At
    // scale binaryFile lists + reads files in parallel across executors
    // (one row per file — files must fit an executor's memory, the
    // documented contract; bigger payloads go through chunked formats).
    Q("source_binary",
      (spark, sfDir) => {
        val dir = Scans.stageBinaryDocs(spark, sfDir)
        spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(dir)
          .select(
            regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
            col("length").cast("long").as("n_bytes"),
            substring(col("content").cast("string"), 1, 16).as("head16"))
          .orderBy(col("fname"))
      },
      Some("""
        SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.bin' AS fname,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               substr(text, 1, 16) AS head16
        FROM documents
        WHERE doc_id < 20
        ORDER BY fname""".trim)),

    // Compound predicate: AND/OR/NOT, IN, BETWEEN, LIKE, IS NOT NULL.
    {
      // SQL-routed key (r12): Spark executes the SAME dialect-shared text
      // the DuckDB oracle runs (pure-SQL entry path, ops/SqlEntry.scala);
      // SurfaceDocSpec pins that the text's plan matches the DataFrame
      // twin's — filters still reach the scan as PushedFilters.
      val text = """
        SELECT p_partkey, p_name, p_brand, p_size
        FROM part
        WHERE (p_size BETWEEN 10 AND 20 OR p_brand IN ('Brand#1', 'Brand#2'))
          AND p_type LIKE '%O%'
          AND p_name IS NOT NULL
          AND NOT (p_size = 15)
        ORDER BY p_partkey""".trim
      Q("filter_pred",
        (spark, sfDir) => SqlEntry.sql(spark, sfDir, text),
        Some(text))
    },

    // Partitioned JDBC ingest (r9): the database-to-lake seam — Spark's
    // jdbc source with partitionColumn/numPartitions splits the key range
    // into 4 stride predicates (`o_orderkey >= lo AND < hi`) and opens 4
    // PARALLEL connections, one per task: the shape that drains a 10 TB
    // OLTP table through N executors instead of one serial cursor. The
    // embedded Derby engine that ships with Spark stands in for the
    // warehouse (staged once per JVM from the fixture subset; the
    // driver-side insert is ingest staging, not the data path). Filters
    // and column pruning push into the database as SQL; the aggregate
    // runs in Spark after the partitioned scan. Oracle: the same rollup
    // straight off the parquet fixture.
    Q("source_jdbc",
      (spark, sfDir) => {
        val url = Scans.stageJdbcOrders(spark, sfDir)
        spark.read.format("jdbc")
          .option("url", url)
          .option("dbtable", "orders_jdbc")
          .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
          .option("partitionColumn", "o_orderkey")
          .option("lowerBound", "0")
          .option("upperBound", "6000000")
          .option("numPartitions", "4")
          .load()
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), Det.sumMoney(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""
        SELECT o_orderpriority, COUNT(*) AS n,
          ${Det.sqlSumMoney("o_totalprice")} AS sum_price
        FROM orders
        WHERE o_orderkey % 20 = 0
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""".trim)),

    // Malformed-record quarantine (r9): the ingest reality every pipeline
    // hits — a CSV feed where some rows are broken. Spark's PERMISSIVE
    // mode parses what it can, routes the raw line of each failed row
    // into a corrupt-record column, and the query splits the feed into
    // per-type good-row aggregates plus one quarantine count — no row is
    // silently dropped, which is the property that matters (a FAILFAST
    // load aborts the night's ingest; silent DROPMALFORMED corrupts
    // counts). The fixture stages events with event_id < 2000 as CSV,
    // corrupting value on every 50th id; the oracle recomputes both
    // branches from the parquet fixture by the same deterministic rule.
    // At scale the corrupt branch is written to a quarantine sink and
    // replayed after the producer fix — same plan, different sink.
    Q("source_csv_dirty",
      (spark, sfDir) => {
        val dir = Scans.stageDirtyCsv(spark, sfDir)
        val schema = "event_id LONG, user_id LONG, event_type STRING, " +
          "value DOUBLE, _corrupt STRING"
        val raw = spark.read
          .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(dir)
        // one aggregate covers both branches (Spark disallows plans whose
        // referenced CSV columns are ONLY the corrupt column, so the
        // quarantine label is derived alongside the real columns): good
        // rows group under their event_type, quarantined rows under
        // '_corrupt' with a NULL sum — no second scan, no cache
        raw.select(
            when(col("_corrupt").isNull, col("event_type"))
              .otherwise(lit("_corrupt")).as("event_type"),
            when(col("_corrupt").isNull, col("value")).as("value"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), Det.sumVal6(col("value")).as("sum_val"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        SELECT event_type, COUNT(*) AS n,
          ${Det.sqlSumVal6("value")} AS sum_val
        FROM events WHERE event_id < 2000 AND event_id % 50 <> 0
        GROUP BY event_type
        UNION ALL
        SELECT '_corrupt', COUNT(*), NULL
        FROM events WHERE event_id < 2000 AND event_id % 50 = 0
        ORDER BY event_type""".trim)),

    // Malformed-JSON quarantine (r11): the JSON-lines twin of
    // source_csv_dirty — every 50th record is truncated mid-object, and
    // the PERMISSIVE reader must park it in the corrupt-record column
    // (nulling the typed fields) instead of failing the job or silently
    // dropping it. Unlike the CSV key's driver-side staging, the dirty
    // feed here is staged DISTRIBUTED: a computed string column (to_json
    // for good rows, a truncated literal for bad) written via the text
    // sink — the shape of an actual landing zone. Doubles survive the
    // JSON round-trip via shortest-round-trip formatting. Same
    // one-aggregate quarantine accounting: good rows under their type,
    // bad rows under '_corrupt' with NULL sum, one scan. At 100 TB
    // PERMISSIVE + quarantine is the only viable posture — FAILFAST
    // means one bad producer kills the pipeline, DROPMALFORMED lies
    // about completeness.
    Q("source_json_dirty",
      (spark, sfDir) => {
        val dir = graft.Tmp.dir("fmt_json_dirty", sfDir)
        Tables.events(spark, sfDir)
          .filter(col("event_id") < 2000)
          .select(
            when(col("event_id") % 50 === 0,
              concat(lit("{\"event_id\": "), col("event_id"), lit(", TRUNC")))
              .otherwise(to_json(struct(col("event_id"), col("user_id"),
                col("event_type"), col("value")))).as("value"))
          .write.mode("overwrite").text(dir)
        val schema = "event_id LONG, user_id LONG, event_type STRING, " +
          "value DOUBLE, _corrupt STRING"
        spark.read
          .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(dir)
          .select(
            when(col("_corrupt").isNull, col("event_type"))
              .otherwise(lit("_corrupt")).as("event_type"),
            when(col("_corrupt").isNull, col("value")).as("value"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), Det.sumVal6(col("value")).as("sum_val"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        SELECT event_type, COUNT(*) AS n,
          ${Det.sqlSumVal6("value")} AS sum_val
        FROM events WHERE event_id < 2000 AND event_id % 50 <> 0
        GROUP BY event_type
        UNION ALL
        SELECT '_corrupt', COUNT(*), NULL
        FROM events WHERE event_id < 2000 AND event_id % 50 = 0
        ORDER BY event_type""".trim)),

    // SCD Type-2 incremental merge (r9): the warehouse dimension-history
    // pattern — each user's event_type stream becomes versioned rows
    // (user_id, seg, valid_from_us, valid_to_us, is_current), and the key
    // PROVES the incremental nightly merge: history (events before Jan 16)
    // is built into an SCD2 table and WRITTEN to parquet (the sink), then
    // the new batch (events on/after Jan 16) merges in — close the open
    // version of any user whose first batch CHANGE arrives (valid_to :=
    // that change's ts), append the batch's change versions, leave
    // untouched users' open rows open. Change-suppression is SCD2's
    // defining rule: an event equal to the user's current segment creates
    // NO version; the first batch event therefore compares against the
    // staged dimension's current seg (equal by construction to the last
    // history EVENT's seg — any later unchanged event carries the same
    // value). The oracle is the FULL recompute over all events, so the
    // check is exactly "incremental merge ≡ rebuild from scratch" — the
    // invariant that makes nightly dimension loads trustworthy. Scale
    // shape: every step shuffles on user_id (window + join + window reuse
    // one hashpartitioning); the dimension read is |versions|, the batch
    // windows are |batch|; nothing rescans closed history.
    Q("sink_scd2",
      (spark, sfDir) => {
        import org.apache.spark.sql.expressions.Window
        val cutUs = 1705363200000000L // 2024-01-16 00:00:00 UTC, micros
        val ev = Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("event_type").as("seg"))
        val wEv = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        def changes(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("prev", lag(col("seg"), 1).over(wEv))
          .filter(col("prev").isNull || col("prev") =!= col("seg"))
          .select(col("user_id"), col("event_id"), col("ts_us"), col("seg"))
        // stage the existing dimension table from pre-cutoff history
        val dir = graft.Tmp.dir("scd2", sfDir)
        changes(ev.filter(col("ts_us") < cutUs))
          .withColumn("valid_to_us", lead(col("ts_us"), 1).over(wEv))
          .select(col("user_id"), col("seg"),
            col("ts_us").as("valid_from_us"), col("valid_to_us"))
          .write.mode("overwrite").parquet(dir)
        val dim = spark.read.parquet(dir)
        // batch changes: in-batch lag, with the per-user FIRST batch event
        // compared against the staged dimension's current segment
        val current = dim.filter(col("valid_to_us").isNull)
        val bCh = ev.filter(col("ts_us") >= cutUs)
          .withColumn("prev", lag(col("seg"), 1).over(wEv))
          .join(current.select(col("user_id"), col("seg").as("cur_seg")),
            Seq("user_id"), "left")
          .filter(
            (col("prev").isNull &&
              (col("cur_seg").isNull || col("cur_seg") =!= col("seg"))) ||
            (col("prev").isNotNull && col("prev") =!= col("seg")))
          .select(col("user_id"), col("event_id"), col("ts_us"), col("seg"))
        val firstCh = bCh.groupBy(col("user_id"))
          .agg(min(col("ts_us")).as("close_us"))
        // merge: closed history rows pass through; open rows close at the
        // user's first batch change (or stay open); batch versions append
        val merged = dim.filter(col("valid_to_us").isNotNull)
          .unionByName(current
            .join(firstCh, Seq("user_id"), "left")
            .select(col("user_id"), col("seg"), col("valid_from_us"),
              col("close_us").as("valid_to_us")))
          .unionByName(bCh
            .withColumn("valid_to_us", lead(col("ts_us"), 1).over(wEv))
            .select(col("user_id"), col("seg"),
              col("ts_us").as("valid_from_us"), col("valid_to_us")))
        merged
          .select(col("user_id"), col("seg"), col("valid_from_us"),
            col("valid_to_us"), col("valid_to_us").isNull.as("is_current"))
          .orderBy(col("user_id"), col("valid_from_us"), col("seg"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type AS seg,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        ch AS (
          SELECT user_id, event_id, ts_us, seg FROM e
          WHERE prev IS NULL OR prev <> seg)
        SELECT user_id, seg, ts_us AS valid_from_us,
               lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us,
               lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL AS is_current
        FROM ch
        ORDER BY user_id, valid_from_us, seg""".trim)),
  )

  /** Stage the first 20 documents as raw doc_<id>.bin files (UTF-8 text
    * bytes) for the binaryFile source key. Pure function of the immutable
    * fixture — memoized per JVM (the DPP-layout precedent). Returns the
    * staged directory. */
  private val stagedBin = scala.collection.mutable.Map.empty[String, String]
  private[graft] def stageBinaryDocs(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): String = stagedBin.synchronized {
    stagedBin.getOrElseUpdate(sfDir, {
      val dir = graft.Tmp.dir("binsrc", sfDir)
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(p)
      Tables.documents(spark, sfDir).filter(col("doc_id") < 20)
        .select(col("doc_id"), col("text")).collect().foreach { r =>
          java.nio.file.Files.write(p.resolve(s"doc_${r.getLong(0)}.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      dir
    })
  }

  /** Stage events with event_id < 2000 as a CSV feed, corrupting the
    * value field of every 50th id (the row survives structurally but the
    * DOUBLE parse fails ⇒ PERMISSIVE mode quarantines it). Memoized per
    * JVM; deterministic, so the oracle recomputes both branches from the
    * parquet fixture. */
  private val stagedDirtyCsv = scala.collection.mutable.Map.empty[String, String]
  private[graft] def stageDirtyCsv(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): String = stagedDirtyCsv.synchronized {
    stagedDirtyCsv.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files.createTempDirectory("graft_csv_dirty")
      val rows = Tables.events(spark, sfDir)
        .filter(col("event_id") < 2000)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .collect() // staging only: ≤2000 rows, never the data path
      val lines = rows.map { r =>
        val v =
          if (r.getLong(0) % 50 == 0) "CORRUPT" else r.getDouble(3).toString
        s"${r.getLong(0)},${r.getLong(1)},${r.getString(2)},$v"
      }
      java.nio.file.Files.write(dir.resolve("feed.csv"),
        java.util.Arrays.asList(lines: _*))
      sys.addShutdownHook {
        try {
          java.nio.file.Files.deleteIfExists(dir.resolve("feed.csv"))
          java.nio.file.Files.deleteIfExists(dir)
        } catch { case _: Exception => () }
      }
      dir.toString
    })
  }

  /** Stage a deterministic orders subset (o_orderkey % 20 = 0) into an
    * embedded Derby database for the partitioned-JDBC source key. Memoized
    * per JVM; idempotent across JVMs (drop + recreate). Returns the JDBC
    * url. The driver-side insert is staging for the demo — the operator
    * under test is the parallel partitioned READ. */
  private val stagedJdbc = scala.collection.mutable.Map.empty[String, String]
  private[graft] def stageJdbcOrders(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): String = stagedJdbc.synchronized {
    stagedJdbc.getOrElseUpdate(sfDir, {
      // in-memory Derby: no disk layout to boot or clean up, and the
      // staging lifetime matches the memoization lifetime (one JVM)
      val db = "graft_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_")
      val url = s"jdbc:derby:memory:$db"
      val rows = Tables.orders(spark, sfDir)
        .filter(expr("o_orderkey % 20 = 0"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .collect()
      val conn = java.sql.DriverManager.getConnection(url + ";create=true")
      try {
        val st = conn.createStatement()
        try st.execute("DROP TABLE orders_jdbc")
        catch { case _: java.sql.SQLException => () } // first boot: no table
        st.execute("""CREATE TABLE orders_jdbc(
          o_orderkey BIGINT PRIMARY KEY, o_custkey BIGINT,
          o_totalprice DOUBLE, o_orderpriority VARCHAR(20))""")
        st.close()
        val ps = conn.prepareStatement("INSERT INTO orders_jdbc VALUES(?,?,?,?)")
        rows.grouped(1000).foreach { g =>
          g.foreach { r =>
            ps.setLong(1, r.getLong(0)); ps.setLong(2, r.getLong(1))
            ps.setDouble(3, r.getDouble(2)); ps.setString(4, r.getString(3))
            ps.addBatch()
          }
          ps.executeBatch()
        }
        ps.close()
      } finally conn.close()
      url
    })
  }
}
