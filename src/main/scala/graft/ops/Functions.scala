package graft.ops

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType, StructField, StructType}

/** Scalar function surface (SURVEY.md §2.8): one query per family,
  * each a battery over one table projected to a deterministic,
  * DuckDB-reproducible output.
  *
  * Parity rules baked into the oracle SQL (probed against DuckDB 1.0):
  *  - Spark INT-returning fns (length/year/rank/size/...) are BIGINT
  *    in DuckDB → CAST to INTEGER on the oracle side;
  *  - Spark `floor`/`ceil` return LONG → CAST DuckDB DOUBLE result;
  *  - Spark `dayofweek` is 1=Sunday, DuckDB 0=Sunday → +1;
  *  - `pmod` has no DuckDB twin → ((a % b) + b) % b;
  *  - `bround` ≡ DuckDB `round_even`;
  *  - libm-backed fns (ln/log10/exp) may differ by 1 ulp → round 6dp;
  *  - higher-order fns: Spark `aggregate` left-fold ≡ DuckDB
  *    `list_reduce` left-fold after `::DOUBLE` promotion (bit-exact).
  * All HOFs are Catalyst-native lambda expressions — codegen'd, no
  * UDF/serialization cost, safe in the 100 TB hot path.
  */
object Functions extends OpModule {

  /** Shared quantile-normalization SQL (fn_quantile_normalize): map
    * the click-value distribution onto the purchase-value
    * distribution by ECDF matching on the cents VALUE GRID; the
    * inverse-CDF lookup is ONE forward-frame conditional min over
    * the merged bounded grid (no as-of machinery needed at grid
    * size). ECDF doubles are identical IEEE divisions on both
    * engines; ties at equal F sort target-after-source so the ≥
    * semantics hold exactly. */
  private def quantileNormalizeSql(table: String): String =
    s"""WITH c AS (
          SELECT event_type,
            CAST(round(value * 100, 0) AS BIGINT) AS cents
          FROM $table
          WHERE event_type IN ('click', 'purchase')),
        g AS (
          SELECT event_type, cents, CAST(count(*) AS BIGINT) AS n
          FROM c GROUP BY event_type, cents),
        f AS (
          SELECT event_type, cents,
            CAST(sum(n) OVER (PARTITION BY event_type ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE)
            / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)
              AS ecdf
          FROM g),
        u AS (
          SELECT ecdf, cents,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              AS is_tgt
          FROM f),
        m AS (
          SELECT ecdf, cents, is_tgt,
            -- "min target at-or-after me in ascending order" computed
            -- as a RUNNING min over the DESCENDING order: Spark
            -- evaluates [unbounded preceding, current] incrementally,
            -- while a [current, unbounded following] frame re-scans
            -- the tail per row (O(n²) — measured 7 s on a 20k grid)
            min(CASE WHEN is_tgt = 1 THEN cents END)
              OVER (ORDER BY ecdf DESC, is_tgt DESC, cents DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS mapped
          FROM u)
        SELECT cents AS click_cents, round(ecdf, 6) AS ecdf,
          CAST(coalesce(mapped, -1) AS BIGINT) AS purchase_cents
        FROM m WHERE is_tgt = 0
        ORDER BY click_cents"""


  /** Shared Luhn SQL (fn_luhn): 12 unrolled substring terms, doubled
    * digits fold via the 2d−9 identity; only the string-type name is
    * engine-spliced. */
  private def luhnSql(table: String, spark: Boolean): String = {
    val str = if (spark) "STRING" else "VARCHAR"
    val terms = (1 to 12).map { i =>
      val d = s"CAST(substr(k12, $i, 1) AS INTEGER)"
      // payload length 12 ⇒ doubling (odd positions from the RIGHT)
      // lands on even positions from the left
      if (i % 2 == 0) s"(CASE WHEN $d >= 5 THEN 2 * $d - 9 ELSE 2 * $d END)"
      else d
    }.mkString(" + ")
    s"""WITH b AS (
          SELECT o_orderkey,
            lpad(CAST(o_orderkey AS $str), 12, '0') AS k12
          FROM $table),
        t AS (SELECT o_orderkey, k12, $terms AS luhn_sum FROM b)
        SELECT o_orderkey, k12 AS payload,
          CAST((10 - luhn_sum % 10) % 10 AS INTEGER) AS check_digit,
          k12 || CAST((10 - luhn_sum % 10) % 10 AS $str) AS full_id
        FROM t ORDER BY o_orderkey"""
  }

  override def ops: Seq[Op] = Seq(

    Op("fn_quantile_normalize",
      // quantile normalization — the distribution-matching transform
      // of ML preprocessing and batch-effect correction (map feature
      // A's distribution onto feature B's so rank structure is
      // preserved and scale/shape artifacts vanish — the genomics
      // standard, equally standard for calibrating heterogeneous
      // score columns before fn_target_encode-style features):
      // mapped(v) = inverse-ECDF_target(ECDF_source(v)), computed
      // EXACTLY on the cents value grid — both ECDFs are cumulative
      // windows over the bounded grid (ks_test argument), and the
      // inverse lookup is one forward-frame conditional min over the
      // merged grid instead of any as-of join machinery. At 100 TB
      // the corpus collapses map-side to the two grids before any
      // window runs.
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_ev_qnorm")
        s.sql(quantileNormalizeSql("graft_ev_qnorm"))
      },
      Some(quantileNormalizeSql("events"))),


    Op("fn_string",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          concat(col("lang"), lit(":"), col("source")).as("tag"),
          upper(substring(col("text"), 1, 12)).as("head_upper"),
          lower(col("source")).as("src_lower"),
          trim(lpad(col("lang"), 6, "_")).as("lang_padded"),
          length(col("text")).as("n_chars_fn"),
          size(split(col("text"), " ")).as("n_tokens"),
          substring(regexp_replace(col("text"), "[aeiou]", "*"), 1, 30)
            .as("devoweled_head"),
          regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
          col("text").like("%data%").as("mentions_data"),
          substring(translate(col("text"), " ", "_"), 1, 20).as("snake_head"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                lang || ':' || source AS tag,
                upper(substring(text, 1, 12)) AS head_upper,
                lower(source) AS src_lower,
                trim(lpad(lang, 6, '_')) AS lang_padded,
                CAST(length(text) AS INTEGER) AS n_chars_fn,
                CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                substring(regexp_replace(text, '[aeiou]', '*', 'g'), 1, 30)
                  AS devoweled_head,
                regexp_extract(text, '([a-z]+)', 1) AS first_word,
                text LIKE '%data%' AS mentions_data,
                substring(replace(text, ' ', '_'), 1, 20) AS snake_head
              FROM documents ORDER BY doc_id""")),

    Op("fn_datetime",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).cast("date").cast("string")
            .as("order_month"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofweek(col("o_orderdate")).as("dow"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since"),
          add_months(col("o_orderdate"), 3).cast("string").as("due_date"),
          // parquet timestamp[ms] arrives as TIMESTAMP_NTZ; with a UTC
          // session the NTZ→LTZ cast is the identity instant
          (unix_micros(col("o_orderdate").cast("timestamp")) / lit(1000000L))
            .cast("long").as("epoch_s"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
            .cast("string").as("month_start"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
                  AS order_month,
                CAST(year(o_orderdate) AS INTEGER) AS yr,
                CAST(month(o_orderdate) AS INTEGER) AS mo,
                CAST(day(o_orderdate) AS INTEGER) AS dom,
                CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
                CAST(date_diff('day', DATE '1995-01-01',
                  CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
                CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR)
                  AS due_date,
                epoch_us(o_orderdate) // 1000000 AS epoch_s,
                CAST(make_date(CAST(year(o_orderdate) AS INTEGER),
                  CAST(month(o_orderdate) AS INTEGER), 1) AS VARCHAR)
                  AS month_start
              FROM orders ORDER BY o_orderkey""")),

    Op("fn_math",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          round(col("p_retailprice"), 1).as("price_r1"),
          bround(col("p_retailprice"), 1).as("price_even1"),
          floor(col("p_retailprice")).as("price_floor"),
          ceil(col("p_retailprice")).as("price_ceil"),
          abs(col("p_retailprice") - lit(1000.0)).as("dist_1k"),
          round(pow(col("p_size"), 2), 6).as("size_sq"),
          round(sqrt(col("p_retailprice")), 6).as("price_sqrt"),
          round(log(col("p_retailprice")), 6).as("price_ln"),
          round(log10(col("p_retailprice")), 6).as("price_log10"),
          round(exp(-col("p_retailprice") / lit(1000.0)), 6).as("price_nexp"),
          pmod(col("p_partkey"), lit(7)).as("key_mod7"),
          signum(col("p_retailprice") - lit(1200.0)).as("price_sign"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                round(p_retailprice, 1) AS price_r1,
                round_even(p_retailprice, 1) AS price_even1,
                CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
                CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
                abs(p_retailprice - 1000.0) AS dist_1k,
                round(pow(p_size, 2), 6) AS size_sq,
                round(sqrt(p_retailprice), 6) AS price_sqrt,
                round(ln(p_retailprice), 6) AS price_ln,
                round(log10(p_retailprice), 6) AS price_log10,
                round(exp(-p_retailprice / 1000.0), 6) AS price_nexp,
                ((p_partkey % 7) + 7) % 7 AS key_mod7,
                CAST(sign(p_retailprice - 1200.0) AS DOUBLE) AS price_sign
              FROM part ORDER BY p_partkey""")),

    Op("fn_array",
      // posexplode + higher-order lambdas over the 64-dim embedding;
      // the fold promotes FLOAT→DOUBLE before multiply so both engines
      // accumulate identically, left-to-right
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(filter(col("embedding"), x => x > lit(0.0f))).as("n_pos"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double")), 6)
            .as("norm_sq"),
          array_max(slice(col("embedding"), 1, 8)).as("max8"),
          posexplode(col("embedding")))
        .withColumnRenamed("col", "val")
        .select("vec_id", "pos", "val", "n_pos", "norm_sq", "max8")
        .orderBy("vec_id", "pos"),
      Some("""SELECT vec_id,
                CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
                unnest(embedding) AS val,
                CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
                round(list_reduce(
                  list_transform(embedding, x -> x::DOUBLE * x::DOUBLE),
                  (a, b) -> a + b), 6) AS norm_sq,
                list_max(embedding[1:8]) AS max8
              FROM embeddings ORDER BY vec_id, pos""")),

    Op("fn_map",
      (s, d) => {
        val m = from_json(col("props"), MapType(StringType, IntegerType))
        // try_element_at, not element_at: under ANSI mode (Spark 4
        // default) a missing map key would throw instead of matching
        // the oracle's NULL
        Tables.events(s, d)
          .select(col("event_id"),
            try_element_at(m, lit("k")).as("k_val"),
            size(map_keys(m)).as("n_keys"),
            array_join(map_keys(m), ",").as("keys_csv"),
            try_element_at(map_values(m), lit(1)).as("first_val"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
                CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
                array_to_string(json_keys(props), ',') AS keys_csv,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS first_val
              FROM events ORDER BY event_id""")),

    Op("fn_json",
      (s, d) => {
        val k = from_json(col("props"),
          StructType(Seq(StructField("k", IntegerType)))).getField("k")
        Tables.events(s, d)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"),
            k.as("k_int"),
            to_json(struct(k.as("k"))).as("rebuilt"),
            json_tuple(col("props"), "k").as("k_tuple"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
                json_extract_string(props, '$.k') AS k_str,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
                to_json(struct_pack(k := CAST(json_extract_string(props, '$.k')
                  AS INTEGER))) AS rebuilt,
                json_extract_string(props, '$.k') AS k_tuple
              FROM events ORDER BY event_id""")),

    Op("fn_hash_ids",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          md5(col("text")).as("text_md5"),
          sha2(col("text"), 256).as("text_sha256"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
              FROM documents ORDER BY doc_id""")),

    Op("fn_bitwise",
      // bitwise scalar battery — how flag fields, bloom bit sets and
      // partition salts are unpacked without a UDF. All codegen'd
      // scalar ops on the scan, zero shuffle; bit-exact on both
      // engines by definition (integer two's-complement semantics)
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("o_orderkey & 2047").as("b_and"),
          expr("o_orderkey | 4096").as("b_or"),
          expr("o_orderkey ^ 1365").as("b_xor"),
          expr("~o_orderkey").as("b_not"),
          expr("shiftleft(o_orderkey, 3)").as("b_shl"),
          expr("shiftright(o_orderkey, 2)").as("b_shr"),
          bit_count(col("o_orderkey")).as("b_pop"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                o_orderkey & 2047 AS b_and,
                o_orderkey | 4096 AS b_or,
                xor(o_orderkey, 1365) AS b_xor,
                ~o_orderkey AS b_not,
                o_orderkey << 3 AS b_shl,
                o_orderkey >> 2 AS b_shr,
                CAST(bit_count(o_orderkey) AS INTEGER) AS b_pop
              FROM orders ORDER BY o_orderkey""")),

    // Spark-specific hash/id surface — no DuckDB equivalents (SURVEY
    // §2.8 parity rule): covered by ScalaTest determinism asserts.
    Op("fn_hash_spark",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          xxhash64(col("text")).as("text_xxh64"),
          hash(col("text"), col("lang")).as("row_hash"),
          crc32(col("text").cast("binary")).as("text_crc32"),
          monotonically_increasing_id().as("synthetic_id"))
        .orderBy("doc_id"),
      None),

    Op("fn_ip",
      // IP-address arithmetic — the network-analytics battery (access
      // logs, abuse detection, geo joins all start here): dotted-quad
      // parse → 32-bit integer, /24 subnet extraction, CIDR-range
      // membership — all PURE integer/string expressions, no UDF, no
      // engine ip type needed (the portable form: an ip INDEX column
      // at 100 TB is exactly this int, range-joinable and
      // zone-map-prunable like any long). Addresses synthesize
      // deterministically from user_id (the fn_url discipline: both
      // engines parse identical strings); the aggregation half is the
      // classic "traffic per /24" rollup — one map-combined
      // aggregate, |subnets| rows cross the shuffle.
      (s, d) => {
        val e = Tables.events(s, d)
          .withColumn("ip", concat_ws(".", lit(10),
            pmod(expr("user_id DIV 65536"), lit(256)),
            pmod(expr("user_id DIV 256"), lit(256)),
            pmod(col("user_id"), lit(256))))
        val oct = split(col("ip"), "\\.")
        e.select(col("event_id"), col("ip"),
            (element_at(oct, 1).cast("long") * 16777216L +
             element_at(oct, 2).cast("long") * 65536L +
             element_at(oct, 3).cast("long") * 256L +
             element_at(oct, 4).cast("long")).as("ip_num"),
            concat_ws(".", element_at(oct, 1), element_at(oct, 2),
              element_at(oct, 3), lit("0/24")).as("subnet24"))
          .withColumn("in_block",
            col("ip_num").between(167772160L + 8L * 65536L,
              167772160L + 12L * 65536L - 1L))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
                SELECT event_id,
                  '10.' || ((user_id // 65536) % 256) || '.' ||
                  ((user_id // 256) % 256) || '.' || (user_id % 256) AS ip
                FROM events),
              p AS (
                SELECT event_id, ip, string_split(ip, '.') AS o FROM e)
              SELECT event_id, ip,
                CAST(o[1] AS BIGINT) * 16777216 + CAST(o[2] AS BIGINT) * 65536
                  + CAST(o[3] AS BIGINT) * 256 + CAST(o[4] AS BIGINT)
                  AS ip_num,
                o[1] || '.' || o[2] || '.' || o[3] || '.0/24' AS subnet24,
                (CAST(o[1] AS BIGINT) * 16777216 + CAST(o[2] AS BIGINT) * 65536
                  + CAST(o[3] AS BIGINT) * 256 + CAST(o[4] AS BIGINT))
                  BETWEEN 167772160 + 8 * 65536
                      AND 167772160 + 12 * 65536 - 1 AS in_block
              FROM p ORDER BY event_id""")),

    Op("fn_url",
      // URL decomposition — the web-corpus provenance battery (host /
      // path / query / fragment / one query param). URLs are
      // synthesized deterministically from document metadata so both
      // engines parse the identical strings; Spark's parse_url is a
      // codegen'd expression (java.net.URI rules), DuckDB mirrors
      // each part with an anchored regexp. Pure narrow projection —
      // at 100 TB this is exactly how crawl provenance columns
      // (registrable domain, path depth, tracking-param strip) are
      // derived without a UDF.
      (s, d) => {
        val url = concat(lit("https://"), col("source"),
          lit(".example.com/"), col("lang"), lit("/doc/"), col("doc_id"),
          lit("?q="), col("n_chars"), lit("&s="), col("source"),
          lit("#f"), col("doc_id") % 7)
        Tables.documents(s, d)
          .select(col("doc_id"),
            parse_url(url, lit("HOST")).as("host"),
            parse_url(url, lit("PATH")).as("path"),
            parse_url(url, lit("QUERY")).as("query"),
            parse_url(url, lit("REF")).as("fragment"),
            parse_url(url, lit("QUERY"), lit("q")).as("param_q"))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (
                SELECT doc_id,
                  'https://' || source || '.example.com/' || lang ||
                  '/doc/' || doc_id || '?q=' || n_chars || '&s=' ||
                  source || '#f' || (doc_id % 7) AS url
                FROM documents)
              SELECT doc_id,
                regexp_extract(url, '^https://([^/]+)/', 1) AS host,
                regexp_extract(url, '^https://[^/]+(/[^?#]*)', 1) AS path,
                regexp_extract(url, '\?([^#]*)', 1) AS query,
                regexp_extract(url, '#(.*)$', 1) AS fragment,
                regexp_extract(url, '[?&]q=([^&#]*)', 1) AS param_q
              FROM u ORDER BY doc_id""")),

    Op("fn_format",
      // printf-style rendering — report/export formatting without a
      // UDF. Integer and string conversions only (%s, %d, zero-pad,
      // hex): their rendering is exactly specified, whereas %f of a
      // double is formatter-dependent at the rounding boundary
      // (Java's HALF_UP vs C's half-even) — floats go through
      // round()+CAST instead (fn_math's territory). Codegen'd
      // projection, zero shuffle.
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          format_string("ORD-%08d", col("o_orderkey")).as("order_tag"),
          format_string("%s/%d", col("o_orderstatus"), col("o_custkey"))
            .as("status_cust"),
          lower(format_string("%x", col("o_orderkey"))).as("key_hex"),
          format_string("%5s|", col("o_orderstatus")).as("status_padded"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                printf('ORD-%08d', o_orderkey) AS order_tag,
                printf('%s/%d', o_orderstatus, o_custkey) AS status_cust,
                printf('%x', o_orderkey) AS key_hex,
                printf('%5s|', o_orderstatus) AS status_padded
              FROM orders ORDER BY o_orderkey""")),

    Op("fn_binary",
      // the binary/wire-encoding function surface a broadcast layer
      // publishes through: UTF-8 text → bytes, base64 encode +
      // round-trip (decode∘encode ≡ identity, checked IN the query so
      // the oracle hashes the proof), byte-grain slicing + hex
      // (sliced on the hex STRING — 16 hex chars = first 8 BYTES,
      // the multi-byte-safe grain that matters for wire formats;
      // DuckDB has no BLOB substring, so both engines slice hex),
      // sha256 over the UTF-8 bytes (DuckDB's VARCHAR sha256 hashes
      // exactly the encoded bytes Spark's binary cast produces). All codegen built-ins, one scan, no
      // shuffle before the presentation sort.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          substring(base64(col("text").cast("binary")), 1, 24)
            .as("b64_prefix"),
          (unbase64(base64(col("text").cast("binary"))).cast("string")
            === col("text")).as("roundtrip_ok"),
          substring(hex(col("text").cast("binary")), 1, 16).as("hex8"),
          sha2(col("text").cast("binary"), 256).as("sha256_hex"),
          length(col("text").cast("binary")).as("n_bytes"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                substring(base64(encode(text)), 1, 24) AS b64_prefix,
                decode(from_base64(base64(encode(text)))) = text
                  AS roundtrip_ok,
                substring(hex(encode(text)), 1, 16) AS hex8,
                sha256(text) AS sha256_hex,
                CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
              FROM documents ORDER BY doc_id""")),

    Op("fn_strdist",
      // edit-distance + structural string battery — the fuzzy-match
      // primitives entity resolution and typo-tolerant dedup build
      // on. levenshtein is INTEGER-exact (dynamic program, no
      // floats), so it sits under the hash gate directly; the jaro/
      // similarity family is float-formula-divergent across engines
      // and stays out by design. Distances here compare adjacent
      // slices of each document (a deterministic in-row pair — no
      // pairwise join; the PAIRING strategy at corpus scale is the
      // dedup families' banded candidates, this op is the kernel).
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          levenshtein(substring(col("text"), 1, 20),
            substring(col("text"), 21, 20)).as("lev_slices"),
          levenshtein(col("lang"), col("source")).as("lev_meta"),
          expr("left(text, 8)").as("l8"),
          expr("right(text, 8)").as("r8"),
          reverse(substring(col("text"), 1, 12)).as("rev_head"),
          repeat(col("lang"), 3).as("lang3"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(levenshtein(substring(text, 1, 20),
                  substring(text, 21, 20)) AS INTEGER) AS lev_slices,
                CAST(levenshtein(lang, source) AS INTEGER) AS lev_meta,
                left(text, 8) AS l8,
                right(text, 8) AS r8,
                reverse(substring(text, 1, 12)) AS rev_head,
                repeat(lang, 3) AS lang3
              FROM documents ORDER BY doc_id""")),

    Op("fn_uuid3",
      // deterministic name-based UUIDs (RFC 4122 version 3, the
      // md5-based variant — v5 needs sha1, which DuckDB lacks, and
      // content-addressed pipelines only need DETERMINISM): the
      // stable entity-ID primitive — the same (namespace, name)
      // yields the same UUID on every engine, run, and partitioning,
      // which is what lets independently-computed datasets join on
      // identity without a coordination service. digest =
      // md5(ns ∥ ':' ∥ name); version nibble (hex digit 13) forced
      // to '3'; variant nibble (digit 17) mapped (d & 3) | 8 via a
      // 4-char lookup — pure string arithmetic, no UDF, all codegen.
      // One projection over the scan, zero shuffle.
      (s, d) => {
        val name = concat(lit("cust:"), col("c_custkey").cast("string"))
        Tables.customer(s, d)
          .withColumn("graft_dg", md5(concat(lit("graft:"), name)))
          .withColumn("graft_var", expr(
            "substr('89ab', ((instr('0123456789abcdef', " +
              "substr(graft_dg, 17, 1)) - 1) % 4) + 1, 1)"))
          .select(col("c_custkey"),
            concat(
              substring(col("graft_dg"), 1, 8), lit("-"),
              substring(col("graft_dg"), 9, 4), lit("-3"),
              substring(col("graft_dg"), 14, 3), lit("-"),
              col("graft_var"),
              substring(col("graft_dg"), 18, 3), lit("-"),
              substring(col("graft_dg"), 21, 12)).as("uuid"))
          .orderBy("c_custkey")
      },
      Some("""WITH t AS (
                SELECT c_custkey,
                  md5('graft:' || 'cust:' || CAST(c_custkey AS VARCHAR))
                    AS dg
                FROM customer),
              v AS (
                SELECT c_custkey, dg,
                  substr('89ab', ((strpos('0123456789abcdef',
                    substr(dg, 17, 1)) - 1) % 4) + 1, 1) AS var
                FROM t)
              SELECT c_custkey,
                substr(dg, 1, 8) || '-' || substr(dg, 9, 4) || '-3' ||
                substr(dg, 14, 3) || '-' || var || substr(dg, 18, 3) ||
                '-' || substr(dg, 21, 12) AS uuid
              FROM v ORDER BY c_custkey""")),

    Op("fn_base36",
      // base-36 ID compaction — the short-ID scheme URL shorteners
      // and human-facing order numbers use (a 12-digit key fits in 8
      // alphanumerics): radix conversion is built into both engines
      // (Spark `conv`, DuckDB `to_base`), normalized to lower case
      // and also emitted left-padded to fixed width (the
      // lexicographic-sort-equals-numeric-sort form a key-range
      // partitioner wants). Pure codegen projection, zero shuffle,
      // exact by definition.
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          lower(expr("conv(o_orderkey, 10, 36)")).as("id36"),
          lpad(lower(expr("conv(o_orderkey, 10, 36)")), 9, "0")
            .as("id36_key"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                lower(to_base(o_orderkey, 36)) AS id36,
                lpad(lower(to_base(o_orderkey, 36)), 9, '0') AS id36_key
              FROM orders ORDER BY o_orderkey""")),

    Op("fn_luhn",
      // Luhn check digits (ISO/IEC 7812 — card numbers, IMEIs,
      // national IDs) — the data-quality battery's checksum member:
      // compute the check digit for each order key rendered as a
      // 12-digit payload, plus the full checked ID a downstream
      // validator would verify. The doubling walk unrolls to 12
      // fixed substring terms (identical integer CASE text on both
      // engines — no loop, no UDF, pure codegen projection, zero
      // shuffle); doubling hits even left-positions because the
      // payload length is fixed at 12 (right-position parity ≡ left
      // parity flipped).
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_ord_luhn")
        s.sql(luhnSql("graft_ord_luhn", spark = true))
      },
      Some(luhnSql("orders", spark = false))),

    Op("fn_target_encode",
      // leave-one-out target encoding — the category→numeric feature
      // transform a tabular-ML pipeline ships (replace a categorical
      // key with the mean target of its OTHER members, so a row never
      // sees its own label — the leakage guard): enc_i =
      // (Σ_type cents − cents_i) / (n_type − 1). Per-type sums are
      // exact cents longs from ONE map-combined aggregate over a
      // |types|-sized relation that rides a broadcast back onto the
      // stream; the encode itself is a codegen map — one small
      // shuffle total at any scale. The subtraction is exact-int, the
      // division the single IEEE op (round 6dp).
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
            round(col("value") * 100, 0).cast("long").as("cents"))
        val byType = ev.groupBy("event_type")
          .agg(sum(col("cents")).as("type_sum"),
            count(lit(1)).as("type_n"))
        ev.join(broadcast(byType), Seq("event_type"))
          .select(col("event_id"), col("event_type"),
            // singleton categories have no OTHER members to average —
            // leave-one-out is undefined there; NULL (not a 0/0 or x/0
            // IEEE artifact) keeps both engines in exact agreement
            when(col("type_n") > 1L,
              round((col("type_sum") - col("cents")).cast("double") /
                (col("type_n") - 1L).cast("double") / lit(100.0), 6))
              .as("enc"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
                SELECT event_id, event_type,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
                FROM events),
              g AS (
                SELECT event_type, CAST(sum(cents) AS BIGINT) AS type_sum,
                  count(*) AS type_n
                FROM ev GROUP BY event_type)
              SELECT ev.event_id, ev.event_type,
                CASE WHEN g.type_n > 1 THEN
                  round(CAST(g.type_sum - ev.cents AS DOUBLE) /
                    CAST(g.type_n - 1 AS DOUBLE) / 1e2, 6)
                END AS enc
              FROM ev JOIN g ON ev.event_type = g.event_type
              ORDER BY event_id"""))
  )
}
